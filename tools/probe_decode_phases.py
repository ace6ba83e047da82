#!/usr/bin/env python
"""Intra-kernel phase cost split for the fused L1 decode kernel (hardware).

Builds truncated variants of the real kernel (same grid/specs/phase code as
pallas_decode._build_decode_kernel) that stop after each pipeline phase and
delta-scan-times each on the TPU:

    bitmap  : bitmap load + expand matmul + mask, dense store   (HBM floor)
    cumsum  : + MXU rank cumsum
    offsets : + lower-tri run-offset matmul (HIGHEST)
    fetch   : + value-window fetch + de-rotate
    level2  : + per-sub-row run extraction (S dynamic rolls)
    full    : + level-1 inverse rank-match placement (production)

Usage: python tools/probe_decode_phases.py [--size 4096] [--batch 4]
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrecode_tpu.profiling import delta_scan_time, enable_compile_cache

enable_compile_cache()

PHASES = ("bitmap", "cumsum", "offsets", "fetch", "level2", "full")


@functools.lru_cache(maxsize=32)
def build_phase_kernel(B, H, W, OUT, RPC, SUB, C1, phase):
    from pyrecode_tpu.ops.pallas_encode import make_lti_matrix

    S = RPC * W // SUB
    n_chunks = H // RPC
    C2 = S * C1
    WIN = C2 + 128

    def kernel(bitmap_ref, vals_ref, expand_ref, lti_ref, dense_ref,
               ovf_ref, off_sref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0

        bytes_ = bitmap_ref[0].astype(jnp.int32).astype(jnp.float32)
        spread = jnp.dot(bytes_, expand_ref[...],
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
        m2 = (spread >> (lane % 8)) & 1
        if phase == "bitmap":
            dense_ref[0] = m2.astype(jnp.uint16)
            return

        csum = jnp.dot(m2.astype(jnp.float32), lti_ref[...],
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        rank1 = csum - 1
        cnt1 = csum[:, SUB - 1:SUB]
        ovf1 = jnp.max(cnt1) > C1
        if phase == "cumsum":
            dense_ref[0] = rank1.astype(jnp.uint16)
            ovf_ref[0, 0, 0] |= jnp.int32(ovf1)
            return

        r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (r_io > c_io).astype(jnp.float32)
        off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        chunk_cnt = jnp.sum(cnt1)
        if phase == "offsets":
            dense_ref[0] = (rank1 + off1).astype(jnp.uint16)
            off_sref[0] = off_sref[0] + chunk_cnt
            ovf_ref[0, 0, 0] |= jnp.int32(ovf1)
            return

        off = jnp.minimum(off_sref[0], OUT)
        pend = jax.lax.rem(off, 128)
        aligned = off - pend
        window = vals_ref[0, :, pl.ds(pl.multiple_of(aligned, 128), WIN)]
        window = pltpu.roll(window, WIN - pend, axis=1)
        if phase == "fetch":
            # (1, SUB) -> (S, SUB) is a sublane-only broadcast (a (1,1)
            # scalar source would need both axes — unimplemented in Mosaic)
            dense_ref[0] = (rank1 + window[:1, :SUB]).astype(jnp.uint16)
            off_sref[0] = off + chunk_cnt
            ovf_ref[0, 0, 0] |= jnp.int32(ovf1)
            return

        riota = jax.lax.broadcasted_iota(jnp.int32, (S, C1), 0)
        c1 = jnp.zeros((S, C1), jnp.int32)
        for s in range(S):
            rot = pltpu.roll(window, WIN - off1[s, 0], axis=1)
            c1 = c1 + jnp.where(riota == s, rot[:, :C1], 0)
        if phase == "level2":
            dense_ref[0] = jnp.pad(
                c1, ((0, 0), (0, SUB - C1))).astype(jnp.uint16)
            off_sref[0] = off + chunk_cnt
            ovf_ref[0, 0, 0] |= jnp.int32(ovf1)
            return

        fg = m2 > 0
        dense2 = jnp.zeros((S, SUB), jnp.int32)
        for j in range(C1):
            dense2 = dense2 + jnp.where((rank1 == j) & fg,
                                        c1[:, j:j + 1], 0)
        dense_ref[0] = dense2.astype(jnp.uint16)
        off_sref[0] = off + chunk_cnt
        ovf_ref[0, 0, 0] |= jnp.int32(ovf1 | (off + chunk_cnt > OUT))

    i = np.arange(SUB // 8)[:, None]
    j = np.arange(SUB)[None, :]
    expand_mat = (j // 8 == i).astype(np.float32)
    lti_mat = make_lti_matrix(SUB)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, S, SUB // 8), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB // 8, SUB), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, SUB), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W // SUB, SUB), jnp.uint16),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    return lambda bitmap, vals: call(bitmap, vals, expand_mat, lti_mat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--bucket", type=int, default=0)
    args = ap.parse_args()

    from pyrecode_tpu import oracle
    from pyrecode_tpu.ops import bitpack
    from pyrecode_tpu.ops.pallas_decode import _choose_rpc_decode
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

    values = bitpack.bitunpack_values(jnp.asarray(pk_a), 12,
                                      out_dtype=jnp.int32)
    OUT = values.shape[-1]
    OUT = max(128, -(-OUT // 128) * 128)
    values = jnp.pad(values, ((0, 0), (0, OUT - values.shape[-1])))
    sub = _choose_sub(size)
    rpc = _choose_rpc_decode(size, size, OUT)
    c1 = CAPACITY_BUCKETS[args.bucket]
    WIN = (rpc * size // sub) * c1 + 128
    vals_pad = jnp.pad(values, ((0, 0), (0, WIN))).reshape(B, 1, OUT + WIN)
    bm_dev = jnp.asarray(bm_a).reshape(B, size * size // sub, sub // 8)

    total_bytes = B * size * size * 2
    SCAN = 8
    bm_pool = jnp.broadcast_to(bm_dev, (SCAN,) + bm_dev.shape)
    val_pool = jnp.broadcast_to(vals_pad, (SCAN,) + vals_pad.shape)
    jax.block_until_ready((bm_pool, val_pool))
    prev = 0.0
    print(f"decode phase split, {B}x{size}^2, occ {args.occupancy}, "
          f"RPC={rpc} S={rpc * size // sub} C1={c1} WIN={WIN}")
    for phase in PHASES:
        call = build_phase_kernel(B, size, size, OUT, rpc, sub, c1, phase)

        def step(batch, call=call):
            bm, vp = batch
            d, o = call(bm, vp)
            return jnp.sum(d[:, ::64, ::64].astype(jnp.int32)) + o[0, 0, 0]

        t = delta_scan_time(step, (bm_pool, val_pool))
        gbps = total_bytes / t / 1e9
        print(f"  {phase:8s}: {t * 1e3:7.2f} ms  ({gbps:6.2f} GB/s)"
              f"   delta {1e3 * (t - prev):+6.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
