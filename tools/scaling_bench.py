#!/usr/bin/env python
"""Multi-chip scaling-efficiency harness.

Measures the shard_map'd fused encode step's throughput at 1, 2, ..., N
devices on whatever mesh the runtime exposes and reports efficiency vs
linear scaling — the BASELINE.json v5e-16 target is >=85%.

On this round's single-chip terminal it can only demonstrate methodology on
virtual CPU devices (set XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu); run on a real pod slice for meaningful numbers.

Usage: python tools/scaling_bench.py [--size 1024] [--frames-per-device 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from pyrecode_tpu.profiling import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--frames-per-device", type=int, default=8)
    parser.add_argument("--density", type=float, default=0.01)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--cpu", type=int, default=0, metavar="N",
                        help="force the CPU backend with N virtual devices "
                             "(the terminal's sitecustomize pins the axon TPU "
                             "plugin, so env vars alone cannot switch backends)")
    parser.add_argument("--tpu-batch", action="store_true",
                        help="single-chip batch weak-scaling: encode "
                             "throughput vs frames-per-dispatch on the real "
                             "chip (the measured half of SCALING.md's story)")
    args = parser.parse_args()

    if args.tpu_batch:
        return batch_weak_scaling(args)

    if args.cpu:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pyrecode_tpu.parallel import make_codec_mesh
    from pyrecode_tpu.parallel.multihost import (
        make_pallas_encode_step, replicate_threshold)

    n_total = len(jax.devices())
    size = args.size
    out_size = max(1024, 1 << (int(args.density * size * size * 2) - 1).bit_length())
    thr_host = jnp.zeros((size, size), jnp.uint16)

    results = []
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_total]
    base = None
    for n_dev in counts:
        mesh = make_codec_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        batch = args.frames_per_device * n_dev
        key = jax.random.key(0)
        u = jax.random.uniform(key, (batch, size, size), jnp.float32)
        vals = jax.random.randint(jax.random.key(1), (batch, size, size), 1, 4096, jnp.int32)
        frames = jnp.where(u < args.density, vals, 0).astype(jnp.uint16)
        frames = jax.device_put(
            frames, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None, None)))
        thr = replicate_threshold(thr_host, mesh)
        step = make_pallas_encode_step(mesh, out_size=out_size, bit_depth=12)

        out = step(frames, thr)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(step(frames, thr))
            best = min(best, time.perf_counter() - t0)
        gbps = batch * size * size * 2 / 1e9 / best
        if base is None:
            base = gbps
        eff = gbps / (base * n_dev)
        results.append({"devices": n_dev, "GBps": round(gbps, 3),
                        "efficiency_vs_linear": round(eff, 3)})
        print(json.dumps(results[-1]), file=sys.stderr)

    print(json.dumps({"metric": "weak-scaling encode efficiency",
                      "platform": jax.devices()[0].platform,
                      "results": results}))


def batch_weak_scaling(args):
    """Per-frame encode time vs frames-per-dispatch on ONE chip.

    Flat per-frame time across batch sizes is the measured half of the
    multi-chip weak-scaling argument (SCALING.md §2): each chip in a mesh
    runs exactly this kernel on its frame shard with zero cross-chip
    traffic, so per-chip throughput at batch B equals the B-frame number
    here and efficiency loss can only come from the gather (§1).
    """
    import jax
    import jax.numpy as jnp

    from pyrecode_tpu.ops.pallas_encode import encode_l1_pallas
    from pyrecode_tpu.profiling import delta_scan_time

    size = args.size
    n_px = size * size
    out_size = max(1024, 1 << (int(args.density * n_px * 2) - 1).bit_length())
    thr = jnp.zeros((size, size), jnp.uint16)
    results = []
    base = None
    for B in (1, 2, 4, 8):
        key = jax.random.key(B)
        u = jax.random.uniform(key, (8, B, size, size), jnp.float32)
        vals = jax.random.randint(jax.random.key(B + 100),
                                  (8, B, size, size), 1, 4096, jnp.int32)
        pool = jnp.where(u < args.density, vals, 0).astype(jnp.uint16)
        jax.block_until_ready(pool)

        def step(frames, thr=thr):
            bm, comp, counts, ovf = encode_l1_pallas(frames, thr, out_size,
                                                     bucket=0)
            return (jnp.sum(bm[:, ::997].astype(jnp.int32))
                    + jnp.sum(counts) + jnp.sum(ovf))

        t = delta_scan_time(step, pool)
        gbps = B * n_px * 2 / t / 1e9
        per_frame_ms = t * 1e3 / B
        if base is None:
            base = per_frame_ms
        results.append({"frames_per_dispatch": B,
                        "GBps": round(gbps, 2),
                        "ms_per_frame": round(per_frame_ms, 3),
                        "efficiency_vs_b1": round(base / per_frame_ms, 3)})
        print(json.dumps(results[-1]), file=sys.stderr)
    print(json.dumps({"metric": "batch weak-scaling encode (single chip)",
                      "platform": "tpu", "size": size,
                      "results": results}))


if __name__ == "__main__":
    main()
