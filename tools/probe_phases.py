#!/usr/bin/env python
"""Intra-kernel phase cost split for the fused L1 encode kernel (hardware).

Builds truncated variants of the real kernel (same grid, block specs, and
phase code paths as pallas_encode._build_l1_kernel) that stop after each
pipeline phase, and delta-scan-times each on the TPU:

    load    : read chunk + threshold, checksum            (HBM floor)
    bitmap  : + mask + MXU pack matmul + bitmap store     (the L3 path)
    cumsum  : + per-sub-row rank cumsum (log-shift)
    select  : + within-sub-row selection to C1 slots
    offsets : + lower-tri offset matmul (HIGHEST)
    concat  : + ragged concat rolls (full _compact_chunk)
    full    : the production kernel (store window + outputs)

The phase deltas localize where the 37 GB/s ceiling is being lost.

Usage: python tools/probe_phases.py [--size 4096] [--batch 4] [--bucket 0]
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

PHASES = ("load", "bitmap", "cumsum", "select", "offsets", "concat", "full")


@functools.lru_cache(maxsize=32)
def build_phase_kernel(B, H, W, OUT, RPC, SUB, C1, phase):
    from pyrecode_tpu.ops import pallas_encode as pe

    S = RPC * W // SUB
    n_chunks = H // RPC
    C2 = S * C1
    WIN = C2 + 128

    def kernel(x_ref, t_ref, pack_ref, lti_ref, bitmap_ref, comp_ref,
               count_ref, ovf_ref, off_sref, tail_ref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            comp_ref[...] = jnp.zeros_like(comp_ref)
            tail_ref[...] = jnp.zeros_like(tail_ref)

        x = x_ref[0].astype(jnp.int32)
        t = t_ref[...].astype(jnp.int32)
        if S != RPC:
            x = x.reshape(S, SUB)
            t = t.reshape(S, SUB)

        if phase == "load":
            off_sref[0] = off_sref[0] + jnp.sum(x - t)
            bitmap_ref[0] = jnp.zeros((S, SUB // 8), jnp.uint8)

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        mask = x > t
        bytes_f = jnp.dot(mask.astype(jnp.float32), pack_ref[...],
                          preferred_element_type=jnp.float32)
        bitmap_ref[0] = bytes_f.astype(jnp.int32).astype(jnp.uint8)

        if phase == "bitmap":
            off_sref[0] = off_sref[0] + jnp.sum(mask.astype(jnp.int32))

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        m2 = mask.astype(jnp.int32)
        r2 = jnp.where(mask, x - t, 0)
        csum = pe._rank_cumsum_mxu(m2, S, SUB, lti_ref[...])
        rank1 = csum - 1
        cnt1 = csum[:, SUB - 1:SUB]

        if phase == "cumsum":
            off_sref[0] = off_sref[0] + jnp.sum(cnt1) + jnp.sum(rank1)

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        c1 = pe._SELECT(m2, r2, rank1, S, SUB, C1)

        if phase == "select":
            off_sref[0] = off_sref[0] + jnp.sum(c1) + jnp.sum(cnt1)

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (r_io > c_io).astype(jnp.float32)
        off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

        if phase == "offsets":
            off_sref[0] = off_sref[0] + jnp.sum(c1) + jnp.sum(off1)

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        acc, chunk_cnt, ovf1 = pe._compact_chunk(m2, r2, S, SUB, C1, C2,
                                                  lti=lti_ref[...])

        if phase == "concat":
            off_sref[0] = off_sref[0] + jnp.sum(acc) + chunk_cnt
            ovf_ref[0, 0, 0] |= jnp.int32(ovf1)

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        ovf_store = pe._store_window(comp_ref, tail_ref, off_sref, acc,
                                     chunk_cnt, OUT, WIN, C2)
        ovf_ref[0, 0, 0] |= jnp.int32(ovf1 | ovf_store)

        @pl.when(h == n_chunks - 1)
        def _():
            count_ref[0, 0, 0] = off_sref[0]

    pack_mat = pe.make_pack_matrix(SUB)
    lti_mat = pe.make_lti_matrix(SUB)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, RPC, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, W), lambda b, h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB // 8), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, SUB // 8), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W // SUB, SUB // 8), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        interpret=False,
    )
    return call, pack_mat, lti_mat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=0)
    ap.add_argument("--phases", nargs="*", default=list(PHASES))
    args = ap.parse_args()

    from pyrecode_tpu.ops import pallas_encode as pe

    size, B = args.size, args.batch
    n_px = size * size
    raw_bytes = B * n_px * 2

    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1), (args.scan, B, size, size),
                              1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)

    cap = int(args.occupancy * n_px * 2) + 1024
    out_size = 1 << (cap - 1).bit_length()
    out_aligned = max(128, -(-out_size // 128) * 128)
    c1 = pe.CAPACITY_BUCKETS[args.bucket]
    sub = pe._choose_sub(size)
    rpc = pe._choose_rpc(size, size, out_aligned)
    print(f"size={size} B={B} occ={args.occupancy} RPC={rpc} SUB={sub} "
          f"C1={c1} OUT={out_aligned}")

    prev_t = None
    for phase in args.phases:
        call, pack_mat, lti_mat = build_phase_kernel(B, size, size,
                                                     out_aligned, rpc,
                                                     sub, c1, phase)

        def body(frames, thr, pack_mat, lti, _call=call):
            bitmap, comp, counts, ovf = _call(frames, thr, pack_mat, lti)
            return (jnp.sum(bitmap.astype(jnp.float32)),
                    jnp.sum(comp.astype(jnp.float32)),
                    counts.astype(jnp.float32), ovf.astype(jnp.float32))

        t = delta_scan_time(body, frames_all, thr, jnp.asarray(pack_mat),
                            jnp.asarray(lti_mat))
        delta = "" if prev_t is None else f"  (+{(t - prev_t) * 1e3:6.3f} ms)"
        prev_t = t
        print(f"{phase:8s} {t * 1e3:7.3f} ms/batch  "
              f"{raw_bytes / t / 1e9:6.2f} GB/s{delta}")


if __name__ == "__main__":
    main()
