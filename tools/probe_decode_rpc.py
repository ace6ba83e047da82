#!/usr/bin/env python
"""HW sweep: decode kernel rows-per-chunk (32K vs 64K px/grid-step), plus
the XLA bitunpack stage's share of decode_l1_pallas.

Round-3 kept decode at 32K px/step because the FLAT level-2 inverse's
window traffic grew linearly with RPC; the round-4 hierarchical inverse
changes that economics — re-measure before touching _choose_rpc_decode.

Usage: python tools/probe_decode_rpc.py [--size 4096] [--batch 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pyrecode_tpu.profiling import delta_scan_time, enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--bucket", type=int, default=0)
    args = ap.parse_args()

    from pyrecode_tpu import oracle
    from pyrecode_tpu.ops import bitpack
    from pyrecode_tpu.ops.pallas_decode import _build_decode_kernel
    from pyrecode_tpu.ops.pallas_encode import CAPACITY_BUCKETS, _choose_sub

    size, B = args.size, args.batch
    frames = oracle.synthetic_frames(B, size, size, args.occupancy, 12,
                                     "peaked", rng=0)
    thr = np.zeros((size, size), np.uint16)
    bms, pks = [], []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bms.append(np.frombuffer(red["packed_binary_map"], np.uint8))
        pks.append(np.frombuffer(red["packed_pixvals"], np.uint8))
    n_pk = -(-max(len(p) for p in pks) // 384) * 384
    bm_a = np.stack(bms)
    pk_a = np.zeros((B, n_pk), np.uint8)
    for i in range(B):
        pk_a[i, : len(pks[i])] = pks[i]

    pk_dev = jnp.asarray(pk_a)
    values = bitpack.bitunpack_values(pk_dev, 12, out_dtype=jnp.int32)
    OUT = max(128, -(-values.shape[-1] // 128) * 128)
    values = jnp.pad(values, ((0, 0), (0, OUT - values.shape[-1])))
    sub = _choose_sub(size)
    c1 = CAPACITY_BUCKETS[args.bucket]
    total_bytes = B * size * size * 2
    SCAN = 8

    # ---- bitunpack stage alone ----
    pk_pool = jnp.broadcast_to(pk_dev, (SCAN,) + pk_dev.shape)
    jax.block_until_ready(pk_pool)

    def unpack_step(batch):
        v = bitpack.bitunpack_values(batch, 12, out_dtype=jnp.int32)
        return jnp.sum(v[:, ::997])

    t = delta_scan_time(unpack_step, pk_pool)
    print(f"bitunpack XLA stage: {t * 1e3:7.2f} ms "
          f"({total_bytes / t / 1e9:6.2f} GB/s-equivalent)")

    # ---- kernel at each RPC ----
    for rpc in (4, 8, 16, 32):
        if size % rpc or (rpc * size) % sub:
            continue
        S = rpc * size // sub
        if S > 256:
            continue
        WIN = S * c1 + 128
        vals_pad = jnp.pad(values, ((0, 0), (0, WIN))).reshape(
            B, 1, OUT + WIN)
        bm_dev = jnp.asarray(bm_a).reshape(B, size * size // sub, sub // 8)
        bm_pool = jnp.broadcast_to(bm_dev, (SCAN,) + bm_dev.shape)
        val_pool = jnp.broadcast_to(vals_pad, (SCAN,) + vals_pad.shape)
        jax.block_until_ready((bm_pool, val_pool))
        try:
            call = _build_decode_kernel(B, size, size, OUT, rpc, sub, c1,
                                        False)
        except Exception as e:
            print(f"RPC={rpc}: build failed: {e}")
            continue

        def step(batch, call=call):
            bm, vp = batch
            d, o = call(bm, vp)
            return jnp.sum(d[:, ::64, ::64].astype(jnp.int32)) + o[0, 0, 0]

        t = delta_scan_time(step, (bm_pool, val_pool))
        print(f"RPC={rpc:3d} (S={S:4d}): {t * 1e3:7.2f} ms "
              f"({total_bytes / t / 1e9:6.2f} GB/s)")

    # correctness spot-check at each RPC vs the frames
    for rpc in (4, 16):
        if size % rpc or (rpc * size) % sub:
            continue
        S = rpc * size // sub
        if S > 256:
            continue
        WIN = S * c1 + 128
        vals_pad = jnp.pad(values, ((0, 0), (0, WIN))).reshape(
            B, 1, OUT + WIN)
        bm_dev = jnp.asarray(bm_a).reshape(B, size * size // sub, sub // 8)
        call = _build_decode_kernel(B, size, size, OUT, rpc, sub, c1, False)
        d, o = call(bm_dev, vals_pad)
        ok = (not bool(np.asarray(o).any())
              and np.array_equal(
                  np.asarray(d).reshape(B, size, size).astype(np.uint16),
                  frames))
        print(f"RPC={rpc}: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
