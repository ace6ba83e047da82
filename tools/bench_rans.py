"""Benchmark the TPU-rANS entropy stage (scheme 12) on real TPU.

Measures the device encode kernel, the device symbol-decode kernel and the
shared tokenize/compact passes with the honest axon-relay methodology
(scan-length differencing, scalar readback — see tools/profile_kernels.py),
plus the host C++ codec for comparison.

Usage: python tools/bench_rans.py [--size 4096] [--occupancy 0.01]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def scan_time(fn, xs):
    from pyrecode_tpu.profiling import delta_scan_time

    return delta_scan_time(lambda x: fn(x), xs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=4096)
    parser.add_argument("--occupancy", type=float, default=0.01)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args()

    from pyrecode_tpu import native
    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_deflate as pdk
    from pyrecode_tpu.ops import pallas_rans as prk

    rng = np.random.default_rng(0)
    n = args.size * args.size // 8
    npad = -(-n // pdk.CH_A) * pdk.CH_A
    mask = rng.random(args.size * args.size) < args.occupancy
    bm = np.packbits(mask, bitorder="little")
    streams = np.zeros((args.iters, 1, npad), np.uint8)
    streams[:, 0, :n] = bm
    lengths = np.full((args.iters, 1), n, np.int32)
    raw = bm.tobytes()

    # ---- host C++ codec baseline ----
    t0 = time.perf_counter()
    enc = native.rans_compress(raw)
    t1 = time.perf_counter()
    dec = native.rans_decompress(enc)
    t2 = time.perf_counter()
    assert dec == raw
    print(f"host C++ rans: encode {n/(t1-t0)/1e9:.2f} GB/s, "
          f"decode {n/(t2-t1)/1e9:.2f} GB/s, "
          f"ratio {n/len(enc):.1f}x ({len(enc)} B)")

    # ---- shared pass A + compaction (same as deflate) ----
    tok, hist, adler = pdk.tokenize_pallas(jnp.asarray(streams[0]),
                                           jnp.asarray(lengths[0]),
                                           interpret=False)
    hist_np = np.asarray(hist)
    tok_count = int(hist_np[0, :286].sum())
    tok_bound = max(prk.CH_R, 1 << int(np.ceil(np.log2(max(tok_count, 1)))))
    density = tok_count / n
    bucket = pdk.compact_bucket_for(density)
    dense0, _, covf = pdk.compact_tokens(tok, tok_bound, bucket=bucket,
                                         interpret=False)
    assert not bool(np.asarray(covf).any())
    print(f"tokens: {tok_count} ({100*density:.1f}%), tok_bound={tok_bound}")

    # ---- device rANS encode ----
    freq = rans.quantize_freqs(hist_np[0, :286].astype(np.int64))
    eluts = jnp.asarray(prk.encode_luts_radix(freq)[None])
    out_bound = min(2 * npad, 2 * tok_bound) + 4096
    m_arr = np.array([tok_count], np.int32)

    def run_enc(x):
        body, states, cnt = prk.rans_encode_pallas(
            x, eluts, m_arr, out_bound, interpret=False)
        return jnp.sum(cnt).astype(jnp.float32)

    dense_batch = jnp.broadcast_to(dense0[None], (args.iters, *dense0.shape))
    dt_e = scan_time(run_enc, dense_batch)
    print(f"device rANS encode: {dt_e*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_e/1e9:.2f} GB/s (stream bytes), "
          f"{tok_count/dt_e/1e6:.0f} Mtok/s")

    # ---- device rANS symbol decode ----
    body, states, cnt = prk.rans_encode_pallas(dense0, eluts, m_arr,
                                               out_bound, interpret=False)
    bc = int(np.asarray(cnt)[0])
    body_rev = np.asarray(body)[0, :bc].astype(np.uint8)[::-1]
    bw = -(-max(bc, 4) // 512) * 512
    body_pad = np.zeros((1, bw), np.uint8)
    body_pad[0, :bc] = body_rev
    tabs = jnp.asarray(prk.decode_tables_radix(freq)[None])
    npad_tok = -(-max(tok_count, 1) // prk.CH_R) * prk.CH_R
    st = jnp.asarray(np.asarray(states).astype(np.int32))
    body_batch = jnp.broadcast_to(jnp.asarray(body_pad)[None],
                                  (args.iters, 1, bw))

    def run_dec(x):
        syms = prk.rans_decode_pallas(x, st, m_arr, npad_tok, tabs,
                                      interpret=False)
        return jnp.sum(syms).astype(jnp.float32)

    dt_d = scan_time(run_dec, body_batch)
    print(f"device rANS decode: {dt_d*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_d/1e9:.2f} GB/s (stream bytes), "
          f"{tok_count/dt_d/1e6:.0f} Mtok/s")

    # correctness spot check on hardware
    syms = np.asarray(prk.rans_decode_pallas(
        jnp.asarray(body_pad), st, m_arr, npad_tok, tabs,
        interpret=False))[0, :tok_count]
    from pyrecode_tpu.codecs.dyndeflate import tokenize_bytes_np

    lut_idx, _ = tokenize_bytes_np(np.frombuffer(raw, np.uint8))
    ref_syms, _, _ = rans._token_syms_and_extras(lut_idx)
    assert np.array_equal(syms, ref_syms), "device decode symbol mismatch"
    print("device decode symbols verified vs tokenizer reference")

    bench_gap_mode(args, bm, n, mask)


def bench_gap_mode(args, bm, n, mask):
    """GAP mode (scheme-12 flags 2|4): the round-3 representation change
    that spends the 12.5x symbol reduction at 1% occupancy.  Times the
    device kernel chains the writer/reader actually run:

      encode: bitmap -> set-bit positions (ops/pallas_gaps.py) -> first-
              order gaps -> 4096-bin histogram -> interleaved rANS encode
      decode: rANS gap-symbol decode -> cumsum -> set-bit positions

    (host O(alphabet) table work and header assembly are excluded here;
    they are inside the e2e write/read rows of BENCH_DETAIL.)"""
    import functools

    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_gaps as pgk, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time

    m_set = int(mask.sum())
    npad_b = -(-n // pgk.CHUNK_BYTES) * pgk.CHUNK_BYTES
    bm_pad = np.zeros((args.iters, 1, npad_b), np.uint8)
    bm_pad[:, 0, :n] = bm
    bm_batch = jnp.asarray(bm_pad)
    out_bound = -(-max(2 * m_set, prk.CH_R) // prk.CH_R) * prk.CH_R

    # fixed LUT (the scan repeats one bitmap, so its table is exact)
    pos0, cnt0, ovf0 = pgk.bitmap_positions_pallas(
        bm_batch[0], out_bound, bucket=0, interpret=False)
    assert not bool(np.asarray(ovf0).any())
    prev0 = jnp.concatenate(
        [jnp.full((1, 1), -1, jnp.int32), pos0[:, :-1]], axis=1)
    io = jnp.arange(out_bound, dtype=jnp.int32)[None, :]
    syms0 = jnp.where(io < cnt0[:, None], pos0 - prev0 - 1, 0)
    hist0 = np.asarray(prk.hist_symbols_pallas(
        syms0, np.asarray(cnt0, np.int32), interpret=False))
    freq = rans.quantize_freqs(hist0[0, : 1 << rans.GAP_BITS]
                               .astype(np.int64))
    eluts = jnp.asarray(prk.encode_luts_symbols(freq)[None])
    ob = 2 * out_bound + 4096

    @functools.partial(jax.jit, static_argnames=())
    def enc_chain(x):
        pos, cnt, ovf = pgk.bitmap_positions_pallas(
            x, out_bound, bucket=0, interpret=False)
        prev = jnp.concatenate(
            [jnp.full((1, 1), -1, jnp.int32), pos[:, :-1]], axis=1)
        syms = jnp.where(io < cnt[:, None], pos - prev - 1, 0)
        hist = prk.hist_symbols_pallas(syms, cnt, interpret=False)
        body, states, cnts = prk.rans_encode_symbols_pallas(
            syms, eluts, cnt, ob, interpret=False)
        return (jnp.sum(cnts).astype(jnp.float32)
                + jnp.sum(hist[:, :4]).astype(jnp.float32) + jnp.sum(ovf))

    dt_ge = delta_scan_time(enc_chain, bm_batch)
    print(f"device rANS gap encode: {dt_ge*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_ge/1e9:.2f} GB/s (bitmap bytes), "
          f"{m_set/dt_ge/1e6:.0f} Msym/s "
          "(incl. standalone bitmap->positions kernel; the writer gets "
          "positions fused from the L1 encode at ~40% of that cost)")

    # decode chain: build a real gap stream, feed its device inputs.
    # (the host compress_gaps size-compares gap vs byte coding and the
    # winner at 1% is data-dependent — use the device batch encoder, which
    # is what the writer's scheme-12 device path emits)
    [stream] = rans.rans_gaps_batch_device(
        bm_batch[0], np.array([n], np.int64), interpret=False)
    gin = rans.gap_chain_inputs([stream], "gap")
    assert gin is not None, "gap stream fell back to byte mode"
    bod, st, tab, m_arr2, npad2, grp, _ = gin
    bod_batch = jnp.broadcast_to(jnp.asarray(bod)[None],
                                 (args.iters, *bod.shape))

    def dec_chain(x):
        gaps = prk.rans_decode_pallas(x, st, jnp.asarray(m_arr2), npad2,
                                      tab, interpret=False, groups=grp)
        iod = jnp.arange(gaps.shape[1], dtype=jnp.int32)[None, :]
        adv = jnp.where(iod < jnp.asarray(m_arr2)[:, None], gaps + 1, 0)
        pos = jnp.cumsum(adv, axis=1, dtype=jnp.int32) - 1
        return jnp.sum(pos).astype(jnp.float32)

    dt_gd = delta_scan_time(dec_chain, bod_batch)
    print(f"device rANS gap decode: {dt_gd*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_gd/1e9:.2f} GB/s (bitmap bytes), "
          f"{m_set/dt_gd/1e6:.0f} Msym/s")

    # hardware correctness: positions out of the decode chain == set bits
    gaps = np.asarray(prk.rans_decode_pallas(
        jnp.asarray(bod), st, jnp.asarray(m_arr2), npad2, tab,
        interpret=False, groups=grp))[0, : int(m_arr2[0])]
    pos_dec = np.cumsum(gaps.astype(np.int64) + 1) - 1
    assert np.array_equal(pos_dec, np.flatnonzero(mask)), \
        "gap decode position mismatch"
    print("gap decode positions verified vs set bits")


if __name__ == "__main__":
    main()
