"""Relay-independent end-to-end READ throughput at 4096^2 (scheme 12).

Mirror of tools/bench_e2e.py for the decode direction, at the production
operating point (1% occupancy, 12-bit, L1, mode 1, TPU-rANS entropy):

* **device entropy decode** — the interleaved-rANS symbol kernel over both
  per-frame streams (bitmap tokens + packed-pixval tokens), timed with the
  delta-scan method;
* **host reconstruction** — per-stream extra-bit unpack + literal/run byte
  fill (memset-class, codecs/rans._reconstruct_bytes), timed on this host;
* **device L1 decode** — fused bit-unpack + sparse->dense scatter kernel
  (ops/pallas_decode.py).

The reported metric divides the DENSE frame bytes (what the consumer reads)
by the summed per-frame time — comparable to the reference's decode loop
(recode_reader.py:379-462 + reader.h:10-68), which runs zlib + a scalar C
loop on host.

Usage: python tools/bench_e2e_read.py [--size 4096] [--batch 4]
       [--occupancy 0.01]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pyrecode_tpu.profiling import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--scan", type=int, default=10)
    ap.add_argument("--mode", choices=("gap", "symbol", "byte"),
                    default="gap",
                    help="scheme-12 stream mode: 'symbol' = the production "
                         "order-0 direct-symbol streams (fully device "
                         "decode), 'byte' = the legacy LZ byte mode with "
                         "host reconstruction")
    args = ap.parse_args()
    if args.mode == "gap":
        return main_gap(args)
    if args.mode == "symbol":
        return main_symbol(args)

    from pyrecode_tpu import oracle
    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_decode, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    rng = np.random.default_rng(0)
    frames = (rng.integers(1, 4096, (B, size, size))
              * (rng.random((B, size, size)) < args.occupancy)
              ).astype(np.uint16)
    thr = np.zeros((size, size), np.uint16)

    # ---- produce the per-frame container streams (host oracle + rANS) ----
    bitmaps, packeds, streams = [], [], []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bitmaps.append(np.frombuffer(red["packed_binary_map"], np.uint8))
        packeds.append(np.frombuffer(red["packed_pixvals"], np.uint8))
        streams.append(
            (rans.compress(red["packed_binary_map"], nways=1024),
             rans.compress(red["packed_pixvals"], nways=1024)))
    print(f"bm stream {len(bitmaps[0])} B -> {len(streams[0][0])} B, "
          f"pk stream {len(packeds[0])} B -> {len(streams[0][1])} B")

    # the pixval stream of near-uniform residuals is incompressible, so the
    # codec (correctly) emits it as a STORED stream -> its decode is a host
    # memcpy; only the bitmap stream exercises the device rANS kernel
    pk_stored = all("stored" in rans._parse_header(streams[i][1])
                    for i in range(B))
    print(f"pixval stream mode: {'stored' if pk_stored else 'rANS'}")

    # ---- batched device inputs for each stream kind ----
    def batch_inputs(kind):
        metas = [rans._parse_header(streams[i][kind]) for i in range(B)]
        assert all("stored" not in h and h["nways"] == prk.W_LANES
                   for h in metas), "fixture produced stored/foreign streams"
        m_max = max(h["m"] for h in metas)
        npad = -(-max(m_max, 1) // prk.CH_R) * prk.CH_R
        bw = -(-max(max(len(h["body"]) for h in metas), 4) // 512) * 512
        bodies = np.zeros((B, bw), np.uint8)
        states = np.zeros((B, prk.W_LANES), np.int32)
        tabs = np.zeros((B, 96, 128), np.float32)
        ms = np.zeros(B, np.int32)
        for i, h in enumerate(metas):
            body_rev = np.frombuffer(h["body"], np.uint8)[::-1]
            bodies[i, : body_rev.size] = body_rev
            states[i] = h["states"].astype(np.int64).astype(np.int32)
            tabs[i] = prk.decode_tables_radix(h["freq"])
            ms[i] = h["m"]
        return metas, jnp.asarray(bodies), jnp.asarray(states), \
            jnp.asarray(tabs), ms, npad

    meta_bm, bod_bm, st_bm, tab_bm, m_bm, npad_bm = batch_inputs(0)

    @functools.partial(jax.jit, static_argnames=("npad",))
    def dec(bodies, states, tabs, ms, npad):
        syms = prk.rans_decode_pallas(bodies, states, jnp.asarray(ms), npad,
                                      tabs, interpret=False)
        return jnp.sum(syms[:, :128].astype(jnp.int32)).astype(jnp.float32)

    sb = jnp.stack([bod_bm] * args.scan)
    jax.block_until_ready(sb)
    dt_bm = delta_scan_time(lambda b: dec(b, st_bm, tab_bm, m_bm, npad_bm), sb)
    dt_pk = 0.0
    if not pk_stored:
        meta_pk, bod_pk, st_pk, tab_pk, m_pk, npad_pk = batch_inputs(1)
        sp = jnp.stack([bod_pk] * args.scan)
        jax.block_until_ready(sp)
        dt_pk = delta_scan_time(
            lambda b: dec(b, st_pk, tab_pk, m_pk, npad_pk), sp)
    print(f"device rANS decode bm: {dt_bm*1e3:.2f} ms/batch"
          + ("" if pk_stored else f"; pk: {dt_pk*1e3:.2f} ms/batch"))
    assert rans.rans_decompress_device(streams[0][0], interpret=False) \
        == bitmaps[0].tobytes(), "device bm decode mismatch"
    print("device bm decode verified vs source bitmap")

    # ---- host side: bm reconstruction (extra bits + literal/run fill) on
    # the REAL production routine, plus the stored-pk memcpy ----
    recs = []
    for i in range(B):
        raw = bitmaps[i].tobytes()
        h = rans._parse_header(streams[i][0])
        lut_idx, _ = rans.tokenize_bytes_np(np.frombuffer(raw, np.uint8))
        syms, _, _ = rans._token_syms_and_extras(lut_idx)
        recs.append((syms, h["xbits"], h["n"], h["adler"], raw))
    from concurrent.futures import ThreadPoolExecutor

    def one_frame(i):
        syms, xbits, n, adler, _raw = recs[i]
        rans._reconstruct_bytes(syms, xbits, n, adler)
        if pk_stored:
            rans.decompress(streams[i][1])       # stored: header + memcpy
    reps = 5
    with ThreadPoolExecutor(B) as pool:          # the reader's bulk path
        t0 = time.perf_counter()                 # pools per-frame decode;
        for _ in range(reps):                    # the C loop + adler drop
            list(pool.map(one_frame, range(B)))  # the GIL
        dt_host_rec = (time.perf_counter() - t0) / reps
    for syms, xbits, n, adler, raw in recs:  # correctness of the fixture
        assert rans._reconstruct_bytes(syms, xbits, n, adler) == raw
    print(f"host reconstruction (bm _reconstruct_bytes"
          f"{' + stored pk memcpy' if pk_stored else ''}, "
          f"{B}-thread pool): {dt_host_rec*1e3:.2f} ms/batch")

    # ---- device L1 decode (bit-unpack + sparse->dense) ----
    n_bm = len(bitmaps[0])
    n_pk = max(len(p) for p in packeds)
    n_pk_pad = -(-n_pk // 384) * 384
    bms = np.zeros((B, n_bm), np.uint8)
    pks = np.zeros((B, n_pk_pad), np.uint8)
    for i in range(B):
        bms[i] = bitmaps[i]
        pks[i, : len(packeds[i])] = packeds[i]
    bmj = jnp.stack([jnp.asarray(bms)] * args.scan)
    pkj = jnp.stack([jnp.asarray(pks)] * args.scan)
    jax.block_until_ready((bmj, pkj))

    # correctness once: dense output must equal the source frames
    dense0, ovf0 = pallas_decode.decode_l1_pallas(
        jnp.asarray(bms), jnp.asarray(pks), size, size, 12, bucket=0,
        interpret=False)
    assert not bool(np.asarray(ovf0).any()), "decode capacity overflow"
    assert np.array_equal(np.asarray(dense0).astype(np.uint16), frames), \
        "decoded frames differ from source"
    print("device L1 decode output verified against source frames")

    def l1dec(bm, pk):
        dense, ovf = pallas_decode.decode_l1_pallas(bm, pk, size, size, 12,
                                                    bucket=0, interpret=False)
        return (jnp.sum(dense[:, ::997, ::997].astype(jnp.int32))
                + jnp.sum(ovf.astype(jnp.int32))).astype(jnp.float32)

    dt_l1 = delta_scan_time(lambda bm: l1dec(bm, pkj[0]), bmj)
    print(f"device L1 decode: {dt_l1*1e3:.2f} ms/batch")

    per_frame = (dt_bm + dt_pk + dt_l1) / B + dt_host_rec / B
    gbps = n_px * 2 / per_frame / 1e9
    print(f'{{"metric": "end-to-end read (relay-independent) {size}^2 '
          f'scheme12", "value": {gbps:.2f}, "unit": "GB/s"}}')


def main_symbol(args):
    """Production scheme-12 read chain: symbol-mode streams, fully device.

    device rANS symbol decode (bm bytes + pixel values) -> device L1 decode
    straight from the decoded VALUES (no bit-pack round trip) -> dense
    frames.  Host does header parsing only.
    """
    from pyrecode_tpu import oracle
    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_decode, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    frames = oracle.synthetic_frames(B, size, size, args.occupancy, 12,
                                     "peaked", rng=0)
    thr = np.zeros((size, size), np.uint16)

    bitmaps, packeds, streams = [], [], []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bitmaps.append(np.frombuffer(red["packed_binary_map"], np.uint8))
        packeds.append(np.frombuffer(red["packed_pixvals"], np.uint8))
        NB = -(-len(red["packed_binary_map"]) // 3072) * 3072
        bmp = np.zeros((1, NB), np.uint8)
        bmp[0, : len(red["packed_binary_map"])] = bitmaps[i]
        NP_ = -(-len(red["packed_pixvals"]) // 3072) * 3072
        pkp = np.zeros((1, NP_), np.uint8)
        pkp[0, : len(red["packed_pixvals"])] = packeds[i]
        sb = rans.rans_symbols_batch_device(
            bmp, np.array([len(bitmaps[i])]), 8,
            raw_cb=lambda k: bitmaps[i].tobytes(), interpret=False)[0]
        sp = rans.rans_symbols_batch_device(
            pkp, np.array([len(packeds[i])]), 12,
            raw_cb=lambda k: packeds[i].tobytes(), interpret=False)[0]
        streams.append((sb, sp))
    print(f"bm stream {len(bitmaps[0])} B -> {len(streams[0][0])} B "
          f"(flags {streams[0][0][3]}), pk stream {len(packeds[0])} B -> "
          f"{len(streams[0][1])} B (flags {streams[0][1][3]})")
    assert all(s[3] & 2 for pair in streams for s in pair),         "fixture produced non-symbol streams"

    def batch_inputs(kind):
        metas = [rans._parse_header(streams[i][kind]) for i in range(B)]
        nways = metas[0]["nways"]
        assert all(h["nways"] == nways for h in metas)
        m_max = max(h["m"] for h in metas)
        npad = -(-max(m_max, 1) // prk.CH_R) * prk.CH_R
        bw = -(-max(max(len(h["body"]) for h in metas), 4) // 512) * 512
        bodies = np.zeros((B, bw), np.uint8)
        states = np.zeros((B, nways), np.int32)
        tabs = np.zeros((B, 96, 128), np.float32)
        ms = np.zeros(B, np.int32)
        for i, h in enumerate(metas):
            body_rev = np.frombuffer(h["body"], np.uint8)[::-1]
            bodies[i, : body_rev.size] = body_rev
            states[i] = h["states"].astype(np.int64).astype(np.int32)
            tabs[i] = prk.decode_tables_radix(h["freq"])
            ms[i] = h["m"]
        return jnp.asarray(bodies), jnp.asarray(states), jnp.asarray(tabs), \
            ms, npad, nways // prk.W_LANES

    bod_bm, st_bm, tab_bm, m_bm, npad_bm, grp_bm = batch_inputs(0)
    bod_pk, st_pk, tab_pk, m_pk, npad_pk, grp_pk = batch_inputs(1)
    print(f"interleave groups: bm {grp_bm}, pk {grp_pk}")

    @functools.partial(jax.jit, static_argnames=("npad", "groups"))
    def dec(bodies, states, tabs, ms, npad, groups):
        syms = prk.rans_decode_pallas(bodies, states, jnp.asarray(ms), npad,
                                      tabs, interpret=False, groups=groups)
        return jnp.sum(syms[:, :128].astype(jnp.int32)).astype(jnp.float32)

    sb_scan = jnp.stack([bod_bm] * args.scan)
    jax.block_until_ready(sb_scan)
    dt_bm = delta_scan_time(
        lambda b: dec(b, st_bm, tab_bm, m_bm, npad_bm, grp_bm), sb_scan)
    sp_scan = jnp.stack([bod_pk] * args.scan)
    jax.block_until_ready(sp_scan)
    dt_pk = delta_scan_time(
        lambda b: dec(b, st_pk, tab_pk, m_pk, npad_pk, grp_pk), sp_scan)
    print(f"device rANS symbol decode bm: {dt_bm*1e3:.2f} ms/batch; "
          f"pk: {dt_pk*1e3:.2f} ms/batch")

    # correctness of the full device chain once
    dec_bm = rans.rans_decompress_device_batch([streams[0][0]],
                                               interpret=False)[0]
    dec_pk = rans.rans_decompress_device_batch([streams[0][1]],
                                               interpret=False)[0]
    assert dec_bm == bitmaps[0].tobytes(), "device bm decode mismatch"
    assert dec_pk == packeds[0].tobytes(), "device pk decode mismatch"
    print("device symbol decode verified vs source streams")

    # ---- device L1 decode straight from decoded VALUES (i32) ----
    n_bm = len(bitmaps[0])
    bms = np.zeros((B, n_bm), np.uint8)
    counts = np.zeros(B, np.int64)
    for i in range(B):
        bms[i] = bitmaps[i]
        counts[i] = len(packeds[i]) * 8 // 12
    vmax = -(-int(counts.max()) // 128) * 128
    vals = np.zeros((B, vmax), np.int32)
    for i in range(B):
        v = oracle.bit_unpack(packeds[i].tobytes(), 12, int(counts[i]),
                              dtype=np.uint32)
        vals[i, : counts[i]] = v
    bmj = jnp.stack([jnp.asarray(bms)] * args.scan)
    vj = jnp.asarray(vals)
    jax.block_until_ready((bmj, vj))

    dense0, ovf0 = pallas_decode._decode_call(
        jnp.asarray(bms), vj, size, size, 12, 0, False)
    assert not bool(np.asarray(ovf0).any()), "decode capacity overflow"
    assert np.array_equal(np.asarray(dense0).astype(np.uint16), frames), \
        "decoded frames differ from source"
    print("device L1 decode (from values) verified against source frames")

    def l1dec(bm, v):
        dense, ovf = pallas_decode._decode_call(bm, v, size, size, 12, 0,
                                                False)
        return (jnp.sum(dense[:, ::997, ::997].astype(jnp.int32))
                + jnp.sum(ovf.astype(jnp.int32))).astype(jnp.float32)

    dt_l1 = delta_scan_time(lambda bm: l1dec(bm, vj), bmj)
    print(f"device L1 decode: {dt_l1*1e3:.2f} ms/batch")

    per_frame = (dt_bm + dt_pk + dt_l1) / B
    gbps = n_px * 2 / per_frame / 1e9
    print(f'{{"metric": "end-to-end read (relay-independent) {size}^2 '
          f'scheme12 symbol-mode", "value": {gbps:.2f}, "unit": "GB/s"}}')




def main_gap(args):
    """Gap-mode scheme-12 read chain: the bitmap stream decodes to set-bit
    POSITIONS (1/occupancy fewer rANS symbols than byte/symbol modes), the
    pixval stream to values, and the dense frames come from the
    positions-driven Pallas decode — the bitmap never materializes.
    """
    import functools

    from pyrecode_tpu import oracle
    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_decode, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    frames = oracle.synthetic_frames(B, size, size, args.occupancy, 12,
                                     "peaked", rng=0)
    thr = np.zeros((size, size), np.uint16)

    bitmaps, packeds, streams = [], [], []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bitmaps.append(np.frombuffer(red["packed_binary_map"], np.uint8))
        packeds.append(np.frombuffer(red["packed_pixvals"], np.uint8))
        # force gap mode (compress_gaps may pick byte mode when it is a
        # fraction of a percent smaller; this bench measures the gap chain)
        from pyrecode_tpu import native as _native

        sb = _native.rans_compress_gaps_native(red["packed_binary_map"],
                                               1024)
        if sb is None:
            sb = rans.compress_gaps(red["packed_binary_map"], nways=1024)
        NP_ = -(-len(red["packed_pixvals"]) // 3072) * 3072
        pkp = np.zeros((1, NP_), np.uint8)
        pkp[0, : len(red["packed_pixvals"])] = packeds[i]
        sp = rans.rans_symbols_batch_device(
            pkp, np.array([len(packeds[i])]), 12,
            raw_cb=lambda k: packeds[i].tobytes(), interpret=False)[0]
        streams.append((sb, sp))
    print(f"bm stream {len(bitmaps[0])} B -> {len(streams[0][0])} B "
          f"(flags {streams[0][0][3]}), pk stream {len(packeds[0])} B -> "
          f"{len(streams[0][1])} B (flags {streams[0][1][3]})")
    assert all(s[0][3] == 6 for s in streams), "fixture not gap mode"

    # host-side prep via the LIBRARY's gap-chain entry (the same code the
    # reader's read_frames_dense uses) so this bench measures the real path
    bm_in = rans.gap_chain_inputs([s[0] for s in streams], "gap")
    pk_in = rans.gap_chain_inputs([s[1] for s in streams], "sym")
    assert bm_in is not None and pk_in is not None, \
        "fixture not kernel-decodable"

    bod_bm, st_bm, tab_bm, m_bm, npad_bm, grp_bm, _ = bm_in
    bod_pk, st_pk, tab_pk, m_pk, npad_pk, grp_pk, _ = pk_in
    print(f"gap symbols/frame: {m_bm.tolist()} (byte mode would code "
          f"{len(bitmaps[0])}); interleave groups: bm {grp_bm}, pk {grp_pk}")

    @functools.partial(jax.jit, static_argnames=("npad", "groups"))
    def dec_syms(bodies, states, tabs, ms, npad, groups):
        syms = prk.rans_decode_pallas(bodies, states, jnp.asarray(ms), npad,
                                      tabs, interpret=False, groups=groups)
        return jnp.sum(syms[:, :128].astype(jnp.int32)).astype(jnp.float32)

    sb_scan = jnp.stack([bod_bm] * args.scan)
    jax.block_until_ready(sb_scan)
    dt_bm = delta_scan_time(
        lambda b: dec_syms(b, st_bm, tab_bm, m_bm, npad_bm, grp_bm), sb_scan)
    sp_scan = jnp.stack([bod_pk] * args.scan)
    jax.block_until_ready(sp_scan)
    dt_pk = delta_scan_time(
        lambda b: dec_syms(b, st_pk, tab_pk, m_pk, npad_pk, grp_pk), sp_scan)
    print(f"device rANS decode gaps: {dt_bm*1e3:.2f} ms/batch; "
          f"pixvals: {dt_pk*1e3:.2f} ms/batch")

    # correctness of the gap stream through the batch path once
    dec_bm0 = rans.rans_decompress_device_batch([streams[0][0]],
                                                interpret=False)[0]
    assert dec_bm0 == bitmaps[0].tobytes(), "device gap decode mismatch"

    # ---- full chain: the library's jitted core (codecs/rans.gap_chain_dense:
    # rANS gaps + vals -> positions cumsum -> posdecode kernel) ----
    dense0, ovf0 = rans.gap_chain_dense(bm_in, pk_in, size, size, bucket=0,
                                        interpret=False)
    assert not bool(np.asarray(ovf0).any()), "posdecode capacity overflow"
    assert np.array_equal(np.asarray(dense0).astype(np.uint16), frames), \
        "gap chain decoded frames differ from source"
    # and the top-level reader entry end-to-end (escalation ladder included)
    dense_lib = rans.decode_l1_gap_device([s[0] for s in streams],
                                          [s[1] for s in streams],
                                          size, size, interpret=False)
    assert dense_lib is not None and np.array_equal(dense_lib, frames)
    print("full gap chain (syms -> positions -> dense) verified vs source")

    def chain_t(b_bm):
        dense, ovf = rans.gap_chain_dense(
            (b_bm, st_bm, tab_bm, m_bm, npad_bm, grp_bm, None),
            (bod_pk, st_pk, tab_pk, m_pk, npad_pk, grp_pk, None),
            size, size, bucket=0, interpret=False)
        return (jnp.sum(dense[:, ::997, ::997].astype(jnp.int32))
                + jnp.sum(ovf.astype(jnp.int32))).astype(jnp.float32)

    dt_full = delta_scan_time(chain_t, sb_scan)
    print(f"full device gap chain: {dt_full*1e3:.2f} ms/batch")
    per_frame = dt_full / B
    gbps = n_px * 2 / per_frame / 1e9
    print(f'{{"metric": "end-to-end read (relay-independent) {size}^2 '
          f'scheme12 gap-mode", "value": {gbps:.2f}, "unit": "GB/s"}}')


if __name__ == "__main__":
    main()
