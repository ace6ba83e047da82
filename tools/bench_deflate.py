"""Benchmark the TPU deflate entropy stage (pass A / pass B) on real TPU.

Honest axon-relay methodology (see tools/profile_kernels.py): each pass runs
inside a ``lax.scan`` over device-generated batches within ONE jit and only a
scalar comes back, so relay latency/readback cannot pollute the number.  The
host table-build step is timed separately on host.

Usage: python tools/bench_deflate.py [--size 4096] [--occupancy 0.01]
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


def _bitmap_fixture(size, occupancy, batch, seed=0):
    """Bit-packed binary maps of `size`^2 frames at the given occupancy."""
    rng = np.random.default_rng(seed)
    n = size * size // 8
    streams = np.zeros((batch, n), np.uint8)
    for b in range(batch):
        mask = rng.random(size * size) < occupancy
        streams[b] = np.packbits(mask, bitorder="little")
    return streams


def scan_time(fn, xs, iters):
    """Per-iteration device time of fn with the relay's fixed dispatch
    latency cancelled by scan-length differencing (delta_scan_time)."""
    from pyrecode_tpu.profiling import delta_scan_time

    del iters
    return delta_scan_time(lambda x: fn(x), xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    from pyrecode_tpu import native
    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.ops import pallas_deflate as pdk

    n = args.size * args.size // 8
    npad = -(-n // pdk.CH_A) * pdk.CH_A
    streams = np.zeros((args.iters, 1, npad), np.uint8)
    streams[:, :, :n] = _bitmap_fixture(args.size, args.occupancy,
                                        args.iters).reshape(args.iters, 1, n)
    lengths = np.full((args.iters, 1), n, np.int32)
    xs_a = (jnp.asarray(streams), jnp.asarray(lengths))

    # ---- pass A ----
    def run_a(x):
        s, ln = x
        lut, hist, adler = pdk.tokenize_pallas(s, ln, interpret=False)
        return jnp.sum(hist).astype(jnp.float32)

    dt_a = scan_time(run_a, xs_a, args.iters)
    gbps_a = n / dt_a / 1e9
    print(f"pass A (tokenize): {dt_a*1e3:.2f} ms/frame-stream -> "
          f"{gbps_a:.2f} GB/s")

    # ---- host table step (per stream) ----
    lut, hist, adler = pdk.tokenize_pallas(jnp.asarray(streams[0]),
                                           jnp.asarray(lengths[0]),
                                           interpret=False)
    hist_np = np.asarray(hist)
    t0 = time.perf_counter()
    reps = 50
    lutab = np.zeros((48, 32), np.float32)
    for _ in range(reps):
        # the pipeline's actual host step: one combined native call
        combined = native.entropy_host_tables(
            hist_np[0, :286].astype(np.uint32), lutab)
        assert combined is not None, "native library required for bench"
        hb, hbits = combined[0], combined[1]
    dt_h = (time.perf_counter() - t0) / reps
    print(f"host tables+header: {dt_h*1e6:.0f} us/stream")
    # llen feeds the narrow-window estimate below (outside the timed loop)
    lfreq = hist_np[0, :286].astype(np.uint32).copy()
    lfreq[256] += 1
    llen, lcode = native.dyn_tables(lfreq)

    # ---- pass B ----
    lutab_d = jnp.asarray(lutab[None])
    phase = jnp.asarray(np.array([hbits % 8], np.int32))
    partial = jnp.asarray(np.array([int(hb[-1]) if hbits % 8 else 0], np.int32))
    out_bound = -(-(2 * npad + 256) // 128) * 128
    lut_batch = jnp.broadcast_to(lut[None], (args.iters, *lut.shape))

    def run_b(x):
        body, totbits, ovf = pdk.assemble_pallas(
            x, lutab_d, phase, partial, out_bound, interpret=False)
        return jnp.sum(totbits).astype(jnp.float32)

    dt_b = scan_time(run_b, lut_batch, args.iters)
    gbps_b = n / dt_b / 1e9
    print(f"pass B direct (assemble): {dt_b*1e3:.2f} ms/frame-stream -> "
          f"{gbps_b:.2f} GB/s")

    # ---- pass A.5 (token compaction) + compacted pass B ----
    tok_max = int(hist_np[0, :286].sum())
    tok_bound = max(pdk.CH_B, 1 << int(np.ceil(np.log2(max(tok_max, 1)))))
    density = tok_max / n
    bucket = pdk.compact_bucket_for(density)
    print(f"tokens: {tok_max} ({100*density:.1f}% of stream), "
          f"tok_bound={tok_bound}, bucket C1="
          f"{[32, 64, 128][bucket]}")

    def run_a5(x):
        dense, cnts, covf = pdk.compact_tokens(x, tok_bound, bucket=bucket,
                                               interpret=False)
        return jnp.sum(cnts).astype(jnp.float32)

    dt_a5 = scan_time(run_a5, lut_batch, args.iters)
    print(f"pass A.5 (compact): {dt_a5*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_a5/1e9:.2f} GB/s")

    dense0, cnts0, covf0 = pdk.compact_tokens(lut, tok_bound, bucket=bucket,
                                              interpret=False)
    assert not bool(np.asarray(covf0).any()), "compaction overflow in bench"
    out_bound_c = min(2 * npad, (tok_bound * pdk.MAX_TOKEN_BITS + 7) // 8) + 256
    dense_batch = jnp.broadcast_to(dense0[None], (args.iters, *dense0.shape))

    def run_bc(x):
        body, totbits, ovf = pdk.assemble_pallas(
            x, lutab_d, phase, partial, out_bound_c, interpret=False)
        return jnp.sum(totbits).astype(jnp.float32)

    dt_bc = scan_time(run_bc, dense_batch, args.iters)
    print(f"pass B compacted: {dt_bc*1e3:.2f} ms/frame-stream -> "
          f"{n/dt_bc/1e9:.2f} GB/s")

    # ---- compacted pass B with the narrow scatter window ----
    from pyrecode_tpu.codecs.dyndeflate import LEN_EXTRA
    f = hist_np[0, :286].astype(np.int64)
    sym_bits = llen[:286].astype(np.int64).copy()
    sym_bits[257:286] += LEN_EXTRA[: 286 - 257].astype(np.int64) + 1
    body_bits = int((f * sym_bits).sum())
    step_est = body_bits * pdk.CH_B // max(tok_max, 1)
    nw = pdk.window_rows_for(int(step_est * 1.3) + 8)
    print(f"exact body bits: {body_bits} "
          f"({body_bits/max(tok_max,1):.1f} bits/token), window rows "
          f"{nw}/{pdk.WIN_ROWS_MAX}")

    def run_bn(x):
        body, totbits, ovf = pdk.assemble_pallas(
            x, lutab_d, phase, partial, out_bound_c, nw=nw,
            interpret=False)
        return jnp.sum(totbits).astype(jnp.float32)

    dt_bn = dt_bc
    if nw < pdk.WIN_ROWS_MAX:
        _, _, ovf_n = pdk.assemble_pallas(dense0, lutab_d, phase, partial,
                                          out_bound_c, nw=nw, interpret=False)
        assert not bool(np.asarray(ovf_n).any()), "narrow window overflowed"
        dt_bn = scan_time(run_bn, dense_batch, args.iters)
        print(f"pass B compacted narrow: {dt_bn*1e3:.2f} ms/frame-stream -> "
              f"{n/dt_bn/1e9:.2f} GB/s")

    # ---- fused pass A + A.5 (gated feature: only counts toward the total
    # if it is byte-identical to two-pass ON THIS HARDWARE at this config;
    # see CLAUDE.md hw-miscompile warning) ----
    dt_f = float("inf")
    bucket_f = pdk.token_bucket_for(density)
    dense_f, _, _, _, ovf_f = pdk.tokenize_compact_pallas(
        jnp.asarray(streams[0]), jnp.asarray(lengths[0]), bucket_f, tok_bound,
        interpret=False)
    fused_ok = (not bool(np.asarray(ovf_f).any())
                and np.array_equal(np.asarray(dense_f).astype(np.uint16),
                                   np.asarray(dense0)))
    if not fused_ok:
        print(f"WARNING: fused tokenize+compact (C1="
              f"{pdk.TOKEN_BUCKETS[bucket_f]}) != two-pass on this hardware "
              f"— skipping fused timing (feature stays gated off)")
    else:
        def run_f(x):
            s, ln = x
            _, hist_, _, _, _ = pdk.tokenize_compact_pallas(
                s, ln, bucket_f, tok_bound, interpret=False)
            return jnp.sum(hist_).astype(jnp.float32)

        dt_f = scan_time(run_f, xs_a, args.iters)
        print(f"fused A+A.5 (tokenize+compact, C1="
              f"{pdk.TOKEN_BUCKETS[bucket_f]}): {dt_f*1e3:.2f} "
              f"ms/frame-stream -> {n/dt_f/1e9:.2f} GB/s")

    total = min(dt_a + min(dt_b, dt_a5 + dt_bn), dt_f + dt_bn) + dt_h
    print(f"device entropy total: {total*1e3:.2f} ms -> {n/total/1e9:.2f} GB/s "
          f"(stream bytes), size={args.size}^2 occupancy={args.occupancy}")


if __name__ == "__main__":
    main()
