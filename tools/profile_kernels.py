#!/usr/bin/env python
"""Per-stage kernel profiling with relay-safe methodology.

Times jitted functions by scanning them over distinct device-resident batches
inside one compiled program and reading back a scalar — see bench.py for why
naive per-call timing is meaningless through the axon relay.

Usage: python tools/profile_kernels.py [--size 4096] [--batch 4] [--scan 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(body_fn, frames_all, *args, outer=3):
    """Per-scan-step device time of body_fn(frames) -> scalar-reducible
    pytree, with the relay's fixed dispatch latency cancelled by
    scan-length differencing (profiling.delta_scan_time)."""
    from pyrecode_tpu.profiling import delta_scan_time

    return delta_scan_time(body_fn, frames_all, *args, outer=outer)


def main():
    from pyrecode_tpu.profiling import enable_compile_cache
    enable_compile_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=4096)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--scan", type=int, default=8)
    parser.add_argument("--density", type=float, default=0.01)
    parser.add_argument("--max-values", type=int, default=None)
    args = parser.parse_args()

    B, H, W = args.batch, args.size, args.size
    N = H * W
    OUT = args.max_values or (1 << (int(args.density * N * 2) + 1024 - 1).bit_length())
    gb = args.scan * B * N * 2 / 1e9

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        shape = (args.scan, B, H, W)
        u = jax.random.uniform(k1, shape, dtype=jnp.float32)
        vals = jax.random.randint(k2, shape, 1, 1 << 12, dtype=jnp.int32)
        return jnp.where(u < args.density, vals, 0).astype(jnp.uint16)

    frames_all = gen(jax.random.key(0))
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((H, W), dtype=jnp.uint16)

    def report(name, fn, *a):
        dt = scan_time(fn, frames_all, *a)
        print(f"{name:28s} {dt*1e3:9.3f} ms/batch   {B*N*2/1e9/dt:8.2f} GB/s")

    # ---- stages ----
    def s_mask(fr, t):
        return jnp.sum((fr > t[None]).astype(jnp.int32))

    def s_bitmap(fr, t):
        m = (fr > t[None]).reshape(B, N // 8, 8).astype(jnp.int32)
        w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
        return jnp.sum(m * w, axis=-1).astype(jnp.uint8)

    def s_cumsum(fr, t):
        m = (fr > t[None]).reshape(B, N)
        return jnp.cumsum(m.astype(jnp.int32), axis=-1)[:, -1]

    def s_scatter(fr, t):
        m = (fr > t[None]).reshape(B, N)
        vals = (fr - t[None]).reshape(B, N) * m.astype(fr.dtype)
        pos = jnp.cumsum(m.astype(jnp.int32), axis=-1) - 1
        idx = jnp.where(m, pos, OUT)

        def sc(v, i):
            return jnp.zeros((OUT,), v.dtype).at[i].set(v, mode="drop", unique_indices=True)

        return jax.vmap(sc)(vals, idx)

    def s_sort(fr, t):
        m = (fr > t[None]).reshape(B, N)
        vals = (fr - t[None]).reshape(B, N) * m.astype(fr.dtype)
        key = jnp.where(m, jnp.int32(0), jnp.int32(1))
        _, sv = jax.lax.sort_key_val(key, vals, dimension=-1, is_stable=True)
        return sv[:, :OUT]

    def s_searchsorted(fr, t):
        m = (fr > t[None]).reshape(B, N)
        vals = (fr - t[None]).reshape(B, N) * m.astype(fr.dtype)
        csum = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        targets = jnp.arange(1, OUT + 1, dtype=jnp.int32)

        def one(cs, v):
            sel = jnp.searchsorted(cs, targets, side="left")
            sel = jnp.clip(sel, 0, N - 1)
            valid = targets <= cs[-1]
            return jnp.where(valid, v[sel], 0)

        return jax.vmap(one)(csum, vals)

    def s_blockgather(fr, t, K=1024):
        """Two-level: per-block cumsum + block offsets; out[j] via block search
        then in-block search, both as gathers."""
        nblk = N // K
        m = (fr > t[None]).reshape(B, nblk, K)
        vals = ((fr - t[None]).reshape(B, nblk, K) * m.astype(fr.dtype)).astype(jnp.int32)
        in_csum = jnp.cumsum(m.astype(jnp.int32), axis=-1)        # (B, nblk, K)
        blk_counts = in_csum[..., -1]                              # (B, nblk)
        blk_end = jnp.cumsum(blk_counts, axis=-1)                  # inclusive
        targets = jnp.arange(1, OUT + 1, dtype=jnp.int32)

        def one(be, ic, v):
            b = jnp.searchsorted(be, targets, side="left")         # block of j-th fg
            b = jnp.clip(b, 0, nblk - 1)
            prev_end = jnp.where(b > 0, be[jnp.maximum(b - 1, 0)], 0)
            within = targets - prev_end                            # 1-based rank in block
            pos = jax.vmap(lambda bb, ww: jnp.searchsorted(ic[bb], ww, side="left"))(b, within)
            pos = jnp.clip(pos, 0, K - 1)
            valid = targets <= be[-1]
            return jnp.where(valid, v[b, pos], 0)

        return jax.vmap(one)(blk_end, in_csum, vals)

    report("mask+count", s_mask, thr)
    report("bitmap pack", s_bitmap, thr)
    report("cumsum 16M", s_cumsum, thr)
    report("compact: scatter", s_scatter, thr)
    report("compact: sort", s_sort, thr)
    report("compact: searchsorted", s_searchsorted, thr)
    report("compact: block gather", s_blockgather, thr)


if __name__ == "__main__":
    main()
