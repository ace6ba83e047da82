#!/usr/bin/env python
"""Benchmark harness: L1 encode throughput on 4096^2 uint16 frames.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "GB/s", "vs_baseline": N}

``vs_baseline`` is the ratio against the driver's north-star target of
10 GB/s/chip L1 encode on 4096^2 uint16 frames (BASELINE.json) — the
reference repo publishes no machine benchmark numbers (BASELINE.md), so the
north-star target is the denominator.

Methodology: the headline measures the fused device encode kernel
(threshold -> mask -> residual compaction -> bitmap + intensity bit-pack) at
steady state.  Test frames are generated on device and the encode runs inside
a ``lax.scan`` over many distinct batches within ONE compiled program, with
only a scalar checksum read back — this amortizes host dispatch latency and
excludes host<->device transfer bandwidth, both of which are properties of
the attachment path, not the chip.  (In this terminal environment the TPU is
reached through a network relay with ~28 ms round-trip latency and ~32 MB/s
readback; naive per-call timing measures the relay, not the kernel.)
Host entropy coding and file IO are outside the boundary, matching the
reference's own stage split (recode_writer.py:432-555).

Usage:
    python bench.py            # full benchmark (4096^2)
    python bench.py --quick    # small smoke run (512^2)
    python bench.py --all      # extra configs to stderr
"""

from __future__ import annotations

import argparse
import json
import sys


NORTH_STAR_GBPS = 10.0


def bench_encode(batch, height, width, density, scan_len=16, outer_reps=7,
                 reduction_level=1, bit_depth=12, max_values=None):
    """Return (GB/s, seconds per batch) for the fused encode kernel."""
    import jax
    import jax.numpy as jnp

    from pyrecode_tpu.ops import pallas_encode
    from pyrecode_tpu.ops.bitpack import bitpack_values
    from pyrecode_tpu.ops.encode import encode_frames

    if max_values is None:
        cap = int(density * height * width * 2) + 1024
        max_values = 1 << (cap - 1).bit_length()

    use_pallas = (reduction_level in (1, 3)
                  and pallas_encode.supports(height, width, bit_depth))
    # capacity bucket for the fused kernel: enough for ~4x the mean sub-row
    # occupancy (overflowing frames would need escalation; synthetic uniform
    # data at these densities does not overflow)
    bucket = 0 if density <= 0.012 else (1 if density <= 0.025 else 2)

    @jax.jit
    def gen_batches(key):
        """Device-side synthetic sparse detector frames (12-bit residuals)."""
        k1, k2 = jax.random.split(key)
        shape = (scan_len, batch, height, width)
        u = jax.random.uniform(k1, shape, dtype=jnp.float32)
        vals = jax.random.randint(k2, shape, 1, 1 << 12, dtype=jnp.int32)
        return jnp.where(u < density, vals, 0).astype(jnp.uint16)

    def body(frames, threshold):
        if use_pallas:
            bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
                frames, threshold, out_size=max_values, bucket=bucket,
                with_values=reduction_level == 1, interpret=False)
            chk = (counts, bitmap, ovf.astype(jnp.uint32))
            if comp is not None:
                packed = bitpack_values(comp.astype(jnp.uint32), bit_depth)
                chk = chk + (packed,)
            return chk
        res = encode_frames(
            frames, threshold, reduction_level=reduction_level,
            bit_depth=bit_depth, max_values=max_values)
        chk = (res.counts, res.bitmap)
        if res.packed is not None:
            chk = chk + (res.packed, res.packed_len)
        return chk

    threshold = jnp.zeros((height, width), dtype=jnp.uint16)
    frames_all = gen_batches(jax.random.key(0))
    jax.block_until_ready(frames_all)

    # steady-state per-batch time with the relay's fixed dispatch latency
    # cancelled by length differencing (profiling.delta_scan_time)
    from pyrecode_tpu.profiling import delta_scan_time
    per_batch = delta_scan_time(body, frames_all, threshold,
                                short=max(1, scan_len // 4), outer=outer_reps)
    batch_bytes = batch * height * width * 2
    return batch_bytes / 1e9 / per_batch, per_batch


def main():
    from pyrecode_tpu.profiling import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="small smoke run")
    parser.add_argument("--all", action="store_true", help="extra configs to stderr")
    parser.add_argument("--scan-len", type=int, default=None)
    args = parser.parse_args()

    if args.quick:
        batch, size, scan_len = 64, 512, 8
    else:
        # scan 24 (divisor 18 after the short run) + median of 7 paired
        # deltas: the r4 "regression" to 26.6 GB/s was a low DRAW from a
        # +-4% measurement distribution (r5 re-measured the r3 and r4
        # kernel revisions back-to-back on hw: 27.2-28.1 vs 26.2-27.8,
        # overlapping; the default-path diff was a pure refactor) — tighter
        # aggregation keeps round headlines comparable
        batch, size, scan_len = 4, 4096, 24
    if args.scan_len:
        scan_len = args.scan_len

    gbps, per_batch = bench_encode(batch, size, size, density=0.01, scan_len=scan_len)

    if args.all:
        for level in (1, 3):
            for density in (0.001, 0.01, 0.05):
                g, d = bench_encode(batch, size, size, density=density,
                                    scan_len=scan_len, reduction_level=level)
                print(f"  L{level} density={density}: {g:.2f} GB/s ({d*1e3:.2f} ms/batch)",
                      file=sys.stderr)

    print(json.dumps({
        "metric": f"L1 encode throughput ({size}x{size} uint16, 1% occupancy, 1 chip)",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / NORTH_STAR_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
