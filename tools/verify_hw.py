#!/usr/bin/env python
"""Hardware byte-identity gate: run after ANY kernel change, BEFORE
benchmarking or committing.

Interpret-mode tests compile through a different path than real Mosaic
lowering; this suite caught a real miscompile (the butterfly left-pack of
git dec5970 summed token pairs at high density on v5e while interpret and
numpy agreed).  Every check here compares device bytes against the
numpy oracle / native encoder on the REAL chip, across densities chosen to
stress capacity buckets and carry chains.

Usage: python tools/verify_hw.py          (~2-4 min incl. cached compiles)
Exit code 0 = all identical; prints per-check status.
"""

from __future__ import annotations

import sys
import zlib

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pyrecode_tpu import native, oracle
    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.ops import pallas_deflate as pdk
    from pyrecode_tpu.ops.encode import encode_frames_auto
    from pyrecode_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    if platform != "tpu":
        print("NOT ON TPU — this gate only means something on hardware")
        return 2

    failures = 0

    def check(name, ok):
        nonlocal failures
        print(f"{name}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures += 1

    rng = np.random.default_rng(20260817)

    # ---- L1/L2/L4 encode vs oracle across densities (stresses every
    # capacity bucket and the compaction/concat carries) ----
    for dens in (0.002, 0.01, 0.05, 0.15):
        H = W = 512
        frames = np.where(rng.random((4, H, W)) < dens,
                          rng.integers(1, 4096, (4, H, W)), 0).astype(np.uint16)
        thr = np.zeros((H, W), np.uint16)
        for level in (1, 2, 4):
            res = encode_frames_auto(jnp.asarray(frames), jnp.asarray(thr),
                                     level, 12, 1 << 18)
            ok = True
            for i in range(frames.shape[0]):
                enc = oracle.reduce_frame(frames[i], thr, level, 12)
                bm = np.asarray(res.bitmap)[i].tobytes()
                ok &= bm == enc["packed_binary_map"]
                if enc["packed_pixvals"] is not None:
                    pv = enc["packed_pixvals"]
                    ok &= np.asarray(res.packed)[i][: len(pv)].tobytes() == pv
            check(f"encode L{level} dens={dens} vs oracle", ok)

    # ---- production frame size: L1 (both kernel variants) and L2/L4 at
    # 4096^2 vs oracle — the bench/headline config (VERDICT r4: every
    # L2/L4 hw-verify row was 512^2; halo/NG/overflow machinery was never
    # exercised at 8x the tested height) ----
    from pyrecode_tpu.ops.pallas_encode import encode_l1_pallas as _el1
    from pyrecode_tpu.ops.pallas_label import encode_l2l4_pallas as _el24

    bigfr = np.where(rng.random((2, 4096, 4096)) < 0.01,
                     rng.integers(1, 4096, (2, 4096, 4096)), 0
                     ).astype(np.uint16)
    bigthr = np.zeros((4096, 4096), np.uint16)
    bb, bc, bn, bo = _el1(jnp.asarray(bigfr), jnp.asarray(bigthr),
                          out_size=1 << 19, bucket=0, interpret=False)
    qb, qc, qn, qo, qpos4k = _el1(jnp.asarray(bigfr), jnp.asarray(bigthr),
                                  out_size=1 << 19, bucket=0,
                                  interpret=False, with_positions=True,
                                  pos_vbits=12)
    ok4k = not (np.asarray(bo).any() or np.asarray(qo).any())
    for i in range(2):
        enc = oracle.reduce_frame(bigfr[i], bigthr, 1, 12)
        ref_pos = np.flatnonzero(bigfr[i].reshape(-1))
        n_pl, n_pk = int(np.asarray(bn)[i]), int(np.asarray(qn)[i])
        ok4k = ok4k and \
            np.asarray(bb)[i].tobytes() == enc["packed_binary_map"] and \
            np.array_equal(np.asarray(qb)[i], np.asarray(bb)[i]) and \
            n_pl == ref_pos.size and n_pk == ref_pos.size and \
            np.array_equal(np.asarray(bc)[i, :n_pl],
                           np.asarray(qc)[i, :n_pl]) and \
            np.array_equal(np.asarray(qpos4k)[i, :n_pk], ref_pos)
    check("encode L1 4096^2 plain AND packed-positions vs oracle", ok4k)

    for level, stat, kw in ((2, "max", dict(statistic="max")),
                            (2, "sum", dict(statistic="sum")),
                            (4, "", dict(scheme="weighted_average"))):
        lb, ls, ln, lo = _el24(jnp.asarray(bigfr), jnp.asarray(bigthr),
                               level, out_size=1 << 19, bit_depth=12,
                               interpret=False, **kw)
        okl = not np.asarray(lo).any()
        for i in range(2):
            enc = oracle.reduce_frame(bigfr[i], bigthr, level, 12,
                                      l2_statistic=stat or "max")
            okl = okl and np.asarray(lb)[i].tobytes() == \
                enc["packed_binary_map"]
            if level == 2:
                nvals = int(np.asarray(ln)[i])
                ref_vals = oracle.bit_unpack(
                    np.frombuffer(enc["packed_pixvals"], np.uint8),
                    12, nvals)
                # both sides saturate sums at the declared bit depth
                # before packing (oracle.reduce_frame semantics)
                okl = okl and np.array_equal(
                    np.asarray(ls)[i, :nvals].astype(np.uint64), ref_vals)
        check(f"encode L{level}{'/' + stat if stat else ''} 4096^2 "
              "vs oracle", okl)

    # ---- fused positions output (scheme-12 gap entropy front end) ----
    from pyrecode_tpu.ops.pallas_encode import encode_l1_pallas

    pfr = np.where(rng.random((2, 512, 512)) < 0.03,
                   rng.integers(1, 4096, (2, 512, 512)), 0).astype(np.uint16)
    pthr = np.zeros((512, 512), np.uint16)
    pb, pc, pn, po, ppos = encode_l1_pallas(
        jnp.asarray(pfr), jnp.asarray(pthr), out_size=1 << 14, bucket=0,
        interpret=False, with_positions=True)
    b0_, c0_, n0_, o0_ = encode_l1_pallas(
        jnp.asarray(pfr), jnp.asarray(pthr), out_size=1 << 14, bucket=0,
        interpret=False)
    okp = not (np.asarray(po).any() or np.asarray(o0_).any())
    okp = okp and np.array_equal(np.asarray(pb), np.asarray(b0_)) \
        and np.array_equal(np.asarray(pc), np.asarray(c0_))
    for i in range(2):
        ref = np.flatnonzero(pfr[i].reshape(-1))
        n = int(np.asarray(pn)[i])
        okp = okp and n == ref.size and \
            np.array_equal(np.asarray(ppos)[i, :n], ref)
    check("encode fused positions vs flatnonzero (+ plain-call identity)",
          okp)

    # packed single-select/single-concat variant (pos_vbits=12): values
    # and positions must match the unpacked dual path bit-for-bit (all
    # residuals < 4096 here).  Default path = butterfly-wide at both
    # buckets; rank-match-wide (the non-pow2-SUB fallback) is forced via
    # the crossover knob so it keeps hardware coverage too.
    from pyrecode_tpu.ops import pallas_encode as _pe

    def _packed_check(label):
        for pbucket, blabel in ((0, "C1=32"), (1, "C1=64")):
            qb, qc, qn, qo, qpos = encode_l1_pallas(
                jnp.asarray(pfr), jnp.asarray(pthr), out_size=1 << 14,
                bucket=pbucket, interpret=False, with_positions=True,
                pos_vbits=12)
            okq = not np.asarray(qo).any()
            okq = okq and np.array_equal(np.asarray(qb), np.asarray(pb))
            for i in range(2):
                ref = np.flatnonzero(pfr[i].reshape(-1))
                n = int(np.asarray(qn)[i])
                okq = okq and n == ref.size \
                    and np.array_equal(np.asarray(qpos)[i, :n], ref) \
                    and np.array_equal(np.asarray(qc)[i, :n],
                                       pfr[i].reshape(-1)[ref])
            check(f"encode fused positions PACKED ({label} {blabel}) "
                  "vs oracle", okq)

    _packed_check("butterfly-wide")
    try:
        _pe._PACKED_BUTTERFLY_MIN_C1 = 1 << 30
        _pe._build_l1_kernel.cache_clear()
        _pe._encode_call.clear_cache()
        _packed_check("rank-match-wide")
    finally:
        _pe._PACKED_BUTTERFLY_MIN_C1 = 32
        _pe._build_l1_kernel.cache_clear()
        _pe._encode_call.clear_cache()

    # ---- device deflate vs native encoder (sparse, dense-token,
    # literal-dense and run-boundary streams) ----
    NPAD = 1 << 19
    raws = []
    for dens in (0.01, 0.25, 0.6):
        n = NPAD - 11
        raws.append((rng.integers(0, 256, n)
                     * (rng.random(n) < dens)).astype(np.uint8).tobytes())
    raws.append(bytes(rng.integers(0, 256, NPAD - 5).astype(np.uint8)))
    raws.append(b"Q" * (pdk.CH_A - 1) + b"\x00" * 600 + b"R" * 40)
    streams = np.zeros((len(raws), NPAD), np.uint8)
    lengths = np.zeros(len(raws), np.int32)
    for i, r in enumerate(raws):
        streams[i, : len(r)] = np.frombuffer(r, np.uint8)
        lengths[i] = len(r)
    outs = dd.deflate_batch_device(streams, lengths,
                                   raw_cb=lambda i: raws[i], interpret=False)
    for i, (raw, got) in enumerate(zip(raws, outs)):
        ident = bytes(got) == native.deflate_sparse(raw)
        rt = zlib.decompress(bytes(got)) == raw
        check(f"device deflate stream {i} (n={len(raw)})", ident and rt)

    # ---- the production default path: a shared hint_state routes the
    # second call through the FUSED tokenize+compact kernel (session
    # default since the precision fix) — must stay byte-identical ----
    hint: dict = {}
    dd.deflate_batch_device(streams[:1], lengths[:1],
                            raw_cb=lambda i: raws[i], interpret=False,
                            hint_state=hint)
    outs_h = dd.deflate_batch_device(streams[:1], lengths[:1],
                                     raw_cb=lambda i: raws[i],
                                     interpret=False, hint_state=hint)
    check("device deflate fused-default (hinted 2nd call)",
          bytes(outs_h[0]) == native.deflate_sparse(raws[0]))

    # ---- fused tokenize+compact vs two-pass (gated feature; still must be
    # hardware-identical whenever enabled) ----
    tok, hist, _ = pdk.tokenize_pallas(jnp.asarray(streams[:1]),
                                       jnp.asarray(lengths[:1]),
                                       interpret=False)
    tok_max = int(np.asarray(hist)[0, :286].sum())
    tok_bound = max(pdk.CH_B, 1 << int(np.ceil(np.log2(max(tok_max, 1)))))
    if tok_bound < NPAD:
        dense0, _, _ = pdk.compact_tokens(tok, tok_bound, bucket=2,
                                          interpret=False)
        dense_f, _, _, _, ovf_f = pdk.tokenize_compact_pallas(
            jnp.asarray(streams[:1]), jnp.asarray(lengths[:1]),
            len(pdk.TOKEN_BUCKETS) - 1, tok_bound, interpret=False)
        ok = (not bool(np.asarray(ovf_f).any())
              and np.array_equal(np.asarray(dense_f).astype(np.uint16),
                                 np.asarray(dense0)))
        check("fused tokenize+compact vs two-pass", ok)

    # ---- TPU-rANS (scheme 12): device encode byte-identity vs the numpy
    # reference codec, and device symbol decode round-trip — across sparse
    # bitmap-like, dense-random and runs-heavy streams ----
    from pyrecode_tpu.codecs import rans as rans_codec
    from pyrecode_tpu.ops import pallas_deflate as pdk2

    rraws = []
    for dens in (0.01, 0.25):
        n = (1 << 18) - 13
        rraws.append((rng.integers(0, 256, n)
                      * (rng.random(n) < dens)).astype(np.uint8).tobytes())
    rraws.append(bytes(rng.integers(0, 256, (1 << 17) + 9).astype(np.uint8)))
    npad_r = max(-(-len(r) // pdk2.CH_A) * pdk2.CH_A for r in rraws)
    rstreams = np.zeros((len(rraws), npad_r), np.uint8)
    rlens = np.zeros(len(rraws), np.int32)
    for i, r in enumerate(rraws):
        rstreams[i, : len(r)] = np.frombuffer(r, np.uint8)
        rlens[i] = len(r)
    rencs = rans_codec.rans_batch_device(rstreams, rlens,
                                         raw_cb=lambda i: rraws[i],
                                         interpret=False)
    from pyrecode_tpu.ops import pallas_rans as prk

    for i, (raw, enc) in enumerate(zip(rraws, rencs)):
        ident = enc == rans_codec.compress(raw, nways=prk.W_LANES)
        dec = rans_codec.rans_decompress_device(enc, interpret=False)
        check(f"rANS stream {i} (n={len(raw)}) device enc+dec",
              ident and dec == raw)

    # ---- TPU-rANS SYMBOL mode: device unpack+histogram+encode and the
    # batched device decode, vs the host codec, on peaked 12-bit values
    # and raw bitmap bytes (8-bit symbols) ----
    from pyrecode_tpu import oracle as _oracle

    sraws, sbits = [], []
    vals = np.minimum(1 + np.floor(rng.exponential(5.0, 90000)), 4095)
    sraws.append(_oracle.bit_pack(vals.astype(np.uint64), 12).tobytes())
    sbits.append(12)
    bm_bytes = (rng.integers(0, 256, 1 << 17)
                * (rng.random(1 << 17) < 0.08)).astype(np.uint8).tobytes()
    sraws.append(bm_bytes)
    sbits.append(8)
    # production bitmap size: m >= 2^21 engages the W=8192 (groups=8) kernel
    big = (rng.integers(0, 256, 1 << 21)
           * (rng.random(1 << 21) < 0.08)).astype(np.uint8).tobytes()
    sraws.append(big)
    sbits.append(8)
    for i, (raw, sb) in enumerate(zip(sraws, sbits)):
        NB = -(-len(raw) // 3072) * 3072
        pk = np.zeros((1, NB), np.uint8)
        pk[0, : len(raw)] = np.frombuffer(raw, np.uint8)
        enc = rans_codec.rans_symbols_batch_device(
            pk, np.array([len(raw)]), sb, raw_cb=lambda k: raw,
            interpret=False)[0]
        dec_host = rans_codec.decompress(enc)
        dec_dev = rans_codec.rans_decompress_device_batch(
            [enc], interpret=False)[0]
        check(f"rANS symbol mode b={sb} (n={len(raw)}) device enc+dec",
              bool(enc[3] & 2) and dec_host == raw and dec_dev == raw)

    # ---- fused-decode wide-window escalation (r5): an incompressible
    # 8192-way stream overruns the narrow fetch window every step; the
    # in-jit rerun must still be exact ON HARDWARE ----
    from pyrecode_tpu.ops import pallas_rans as _prk

    w8 = _prk.ROWS_R * _prk.W_LANES
    m_esc = w8 * 4
    esyms = rng.integers(0, 256, m_esc).astype(np.int64)
    ecnt = np.bincount(esyms, minlength=256)
    efreq = rans_codec.quantize_freqs(ecnt).astype(np.int64)
    ebody, estates = rans_codec.rans_encode_interleaved(esyms, efreq, w8)
    ebw = -(-len(ebody) // 512) * 512
    ebod = np.zeros((1, ebw), np.uint8)
    ebod[0, : len(ebody)] = np.frombuffer(ebody, np.uint8)[::-1]
    enpad = -(-m_esc // _prk.CH_R) * _prk.CH_R
    eout = np.asarray(_prk.rans_decode_pallas(
        jnp.asarray(ebod), jnp.asarray(estates.astype(np.int32))[None],
        np.array([m_esc]), enpad,
        jnp.asarray(_prk.decode_tables_radix(efreq)[None]
                    .astype(np.float32)),
        interpret=False, groups=_prk.ROWS_R))
    check("fused decode wide-window escalation (incompressible 8192-way)",
          np.array_equal(eout[0, :m_esc], esyms))

    # ---- L1 decode vs dense reconstruction ----
    from pyrecode_tpu import ops

    H = W = 512
    frames = np.where(rng.random((4, H, W)) < 0.02,
                      rng.integers(1, 4096, (4, H, W)), 0).astype(np.uint16)
    thr = np.zeros((H, W), np.uint16)
    res = encode_frames_auto(jnp.asarray(frames), jnp.asarray(thr), 1, 12,
                             1 << 16)
    dense = ops.decode_l1_frames(res.bitmap, res.packed, H, W, 12,
                                 out_dtype=np.uint16)
    check("pallas L1 decode vs input", np.array_equal(np.asarray(dense),
                                                      frames))

    # ---- Pallas 12-bit pack kernel vs the XLA word-stack path ----
    from pyrecode_tpu.ops import bitpack, pallas_bitpack

    pv = rng.integers(0, 4096, (2, pallas_bitpack.VALS_STEP)
                      ).astype(np.uint16)
    ref_pk = np.asarray(bitpack.bitpack_values(
        jnp.asarray(pv).astype(jnp.uint32), 12))
    got_pk = np.asarray(pallas_bitpack.bitpack12_pallas(jnp.asarray(pv)))
    got_w = np.asarray(pallas_bitpack.bitpack12_words_pallas(
        jnp.asarray(pv)))
    check("pallas bitpack12 bytes vs XLA", np.array_equal(ref_pk, got_pk))
    check("pallas bitpack12 words vs XLA",
          np.array_equal(got_w.view(np.uint8).reshape(2, -1), ref_pk))
    got_unp = np.asarray(pallas_bitpack.bitunpack12_pallas(
        jnp.asarray(ref_pk), interpret=False))
    check("pallas bitunpack12 vs input values",
          np.array_equal(got_unp.astype(pv.dtype), pv))

    # ---- gap-mode (flags 2|4) bitmap coding: device symbol decode path ----
    from pyrecode_tpu.codecs import rans as _rans

    # build the gap stream EXPLICITLY (numpy gap branch): compress_gaps
    # size-compares against byte mode and, at 1% random occupancy, the two
    # sit within a few bytes of each other — the winner is data-dependent
    # and a byte-mode win is not a decode failure
    gbits = rng.random(1 << 21) < 0.01
    gbm_b = np.packbits(gbits, bitorder="little")
    gbm = gbm_b.tobytes()
    gsyms = _rans.bitmap_to_gaps(gbm_b)
    gcounts = np.bincount(gsyms, minlength=1 << _rans.GAP_BITS)
    gfreq = _rans.quantize_freqs(gcounts).astype(np.int64)
    gbody, gstates = _rans.rans_encode_interleaved(gsyms, gfreq, 32)
    gsp = np.flatnonzero(gcounts > 0)
    import zlib as _zlib
    gstream = _rans._finish_stream_symbols(
        len(gbm), gsyms.size, 32, _rans.GAP_BITS, gsp, gfreq[gsp], gstates,
        gbody, _zlib.adler32(gbm), gap=True)
    check("gap stream device decode vs bitmap",
          gstream[3] == 6 and
          _rans.rans_decompress_device_batch([gstream],
                                             interpret=False)[0] == gbm)

    # ---- bitmap -> positions kernel (gap-mode device encode front) ----
    from pyrecode_tpu.ops import pallas_gaps as pgk

    pbits = rng.random((2, 2 * pgk.CHUNK_BYTES * 8)) < 0.03
    pbm = np.stack([np.packbits(pbits[i], bitorder="little")
                    for i in range(2)])
    posd, cntd, ovfd = pgk.bitmap_positions_pallas(
        jnp.asarray(pbm), 1 << 14, bucket=1, interpret=False)
    ok_pos = not np.asarray(ovfd).any()
    for i in range(2):
        ref = np.flatnonzero(pbits[i])
        ok_pos = ok_pos and int(np.asarray(cntd)[i]) == ref.size and \
            np.array_equal(np.asarray(posd)[i, : ref.size], ref)
    check("pallas bitmap->positions vs flatnonzero", ok_pos)

    # ---- positions-driven dense decode (gap-mode read chain tail) ----
    from pyrecode_tpu.ops.pallas_decode import decode_l1_from_positions

    flat = frames.reshape(4, -1)
    OUTP = 1 << int(np.ceil(np.log2(max(int((flat > 0).sum(1).max()), 1)
                                    * 2)))
    posq = np.zeros((4, OUTP), np.int32)
    valq = np.zeros((4, OUTP), np.int32)
    cntq = np.zeros(4, np.int32)
    for i in range(4):
        p = np.flatnonzero(flat[i])
        cntq[i] = p.size
        posq[i, : p.size] = p
        valq[i, : p.size] = flat[i][p]
    densep, ovfp = decode_l1_from_positions(
        jnp.asarray(posq), jnp.asarray(valq), jnp.asarray(cntq), H, W,
        bucket=0, interpret=False)
    check("pallas positions decode vs input",
          not np.asarray(ovfp).any() and
          np.array_equal(np.asarray(densep).astype(np.uint16), frames))

    # sub-512-width geometry (SUB = width < 512): covers the posdecode
    # sub-row shift derivation the H=W=512 case cannot (ADVICE r3 high)
    nH, nW = 128, 256
    nfr = (rng.integers(0, 4096, (2, nH, nW)) *
           (rng.random((2, nH, nW)) < 0.02)).astype(np.uint16)
    nflat = nfr.reshape(2, -1)
    OUTN = 1 << int(np.ceil(np.log2(max(int((nflat > 0).sum(1).max()), 1)
                                    * 2)))
    posn = np.zeros((2, OUTN), np.int32)
    valn = np.zeros((2, OUTN), np.int32)
    cntn = np.zeros(2, np.int32)
    for i in range(2):
        p = np.flatnonzero(nflat[i])
        cntn[i] = p.size
        posn[i, : p.size] = p
        valn[i, : p.size] = nflat[i][p]
    densen, ovfn = decode_l1_from_positions(
        jnp.asarray(posn), jnp.asarray(valn), jnp.asarray(cntn), nH, nW,
        bucket=0, interpret=False)
    check("pallas positions decode 128x256 (SUB<512)",
          not np.asarray(ovfn).any() and
          np.array_equal(np.asarray(densen).astype(np.uint16), nfr))

    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
