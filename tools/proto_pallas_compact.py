#!/usr/bin/env python
"""Prototype: fused Pallas L1 encode (mask+bitmap+hierarchical compaction).

Run on TPU: python tools/proto_pallas_compact.py [--size 4096]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(x, n):
    """Inclusive cumsum along the last (lane) axis via log-step shifts."""
    acc = x
    d = 1
    while d < n:
        acc = acc + jnp.pad(acc, ((0, 0), (d, 0)))[:, :n]
        d *= 2
    return acc


def _cumsum_sublanes(x, n):
    """Inclusive cumsum along the second-to-last axis via log-step shifts."""
    acc = x
    d = 1
    while d < n:
        acc = acc + jnp.pad(acc, ((d, 0), (0, 0)))[:n, :]
        d *= 2
    return acc


def make_encoder(B, H, W, OUT, RPC=8, SUB=None, C1=32, C2=512):
    """Fused L1 encode: grid (B, H/RPC) sequential; chunk = RPC rows.

    SUB: sub-row width for level-1 compaction (defaults to W, i.e. one image
    row per sub-row). C1 = max fg per sub-row, C2 = max fg per chunk.
    """
    SUB = SUB or W
    assert (RPC * W) % SUB == 0
    S = RPC * W // SUB
    n_chunks = H // RPC

    WIN = C2 + 128  # store window: chunk capacity + max misalignment

    def kernel(x_ref, t_ref, pack_ref, bitmap_ref, comp_ref, count_ref, ovf_ref,
               off_sref, tail_ref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            comp_ref[...] = jnp.zeros_like(comp_ref)
            tail_ref[...] = jnp.zeros_like(tail_ref)

        x = x_ref[0].astype(jnp.int32)           # (RPC, W)
        t = t_ref[...].astype(jnp.int32)
        mask = x > t
        res = jnp.where(mask, x - t, 0)
        m32 = mask.astype(jnp.int32)

        # bitmap via MXU: bytes = mask @ P, P[i,j] = (i//8==j) * 2^(i%8)
        # (0/1 x pow2, row sums <= 1020 -> exact in f32)
        bytes_f = jnp.dot(mask.astype(jnp.float32), pack_ref[...],
                          preferred_element_type=jnp.float32)
        bitmap_ref[0] = bytes_f.astype(jnp.int32).astype(jnp.uint8)

        # ---- level 1: within sub-row ranks and compaction to C1 slots ----
        if S == RPC:  # SUB == W: no reshape needed
            m2, r2 = m32, res
        else:
            m2 = m32.reshape(S, SUB)
            r2 = res.reshape(S, SUB)
        csum = _cumsum_lanes(m2, SUB)
        rank1 = csum - 1
        cnt1 = csum[:, SUB - 1:SUB]               # (S, 1)
        ovf1 = jnp.max(cnt1) > C1

        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, C1), 1)
        c1 = jnp.zeros((S, C1), jnp.int32)
        for j in range(C1):
            colsum = jnp.sum(jnp.where((rank1 == j) & (m2 > 0), r2, 0),
                             axis=1, keepdims=True)          # (S, 1)
            c1 = c1 + colsum * (jrow == j)

        # ---- level 2: ragged concat of S runs via dynamic rolls ----
        # exclusive cumsum over the S sub-row counts as a strictly-lower-
        # triangular matmul (sublane-axis shifts are not lowerable; counts
        # are < 2^24 so f32 accumulation is exact)
        r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        ltri = (r_io > c_io).astype(jnp.float32)
        off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        chunk_cnt = jnp.sum(cnt1)
        ovf2 = chunk_cnt > C2

        acc = jnp.zeros((1, C2), jnp.int32)
        c1_pad = jnp.pad(c1, ((0, 0), (0, C2 - C1)))                # (S, C2)
        for s in range(S):
            acc = acc + pltpu.roll(c1_pad[s:s + 1, :], off1[s, 0], axis=1)

        # ---- store at the running offset (128-aligned window scheme) ----
        # Mosaic supports dynamic vector stores only at lane-tile-aligned
        # offsets and without masks, so: keep the global offset's misalignment
        # as a VMEM tail of < 128 carried elements, roll the new chunk data up
        # by that amount, merge, zero beyond the data, and store the full
        # (C2+128) window at the aligned offset.  Later chunks overwrite the
        # tail region; trailing zeros guarantee clean bytes for bit-packing.
        off = jnp.minimum(off_sref[0], OUT)
        pend = jax.lax.rem(off, 128)
        aligned = off - pend
        acc_pad = jnp.concatenate([acc, jnp.zeros((1, 128), jnp.int32)], axis=1)
        rolled = pltpu.roll(acc_pad, pend, axis=1)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        combined = jnp.where(w_iota < pend, tail_ref[...], rolled)
        combined = jnp.where(w_iota < pend + chunk_cnt, combined, 0)
        comp_ref[0, :, pl.ds(pl.multiple_of(aligned, 128), WIN)] = combined

        new_off = off + chunk_cnt
        new_pend = jax.lax.rem(new_off, 128)
        shift_back = pend + chunk_cnt - new_pend        # multiple of 128
        leftover = pltpu.roll(combined, WIN - shift_back, axis=1)
        tail_ref[...] = jnp.where(w_iota < new_pend, leftover, 0)

        off_sref[0] = new_off
        ovf_ref[0, 0, 0] |= jnp.int32(ovf1 | ovf2 | (new_off > OUT))

        @pl.when(h == n_chunks - 1)
        def _():
            count_ref[0, 0, 0] = off_sref[0]

    grid = (B, n_chunks)
    i = np.arange(W)[:, None]
    j = np.arange(W // 8)[None, :]
    pack_mat = ((i // 8 == j) * (1 << (i % 8))).astype(np.float32)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, RPC, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, W), lambda b, h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W // 8), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RPC, W // 8), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT + C2 + 128), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W // 8), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1, OUT + C2 + 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, C2 + 128), jnp.int32)],
    )
    return lambda frames, thr: call(frames, thr, pack_mat)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--density", type=float, default=0.01)
    parser.add_argument("--rpc", type=int, default=8)
    parser.add_argument("--c1", type=int, default=32)
    parser.add_argument("--sub", type=int, default=None)
    parser.add_argument("--c2", type=int, default=512)
    args = parser.parse_args()

    B, H, W = args.batch, args.size, args.size
    OUT = 1 << (int(args.density * H * W * 2) + 1024 - 1).bit_length()
    print(f"B={B} H={H} W={W} OUT={OUT} RPC={args.rpc} C1={args.c1} C2={args.c2}")

    rng = np.random.default_rng(0)
    frames = np.where(rng.random((B, H, W)) < args.density,
                      rng.integers(1, 4096, (B, H, W)), 0).astype(np.uint16)
    thr = np.zeros((H, W), np.uint16)

    enc = jax.jit(make_encoder(B, H, W, OUT, RPC=args.rpc, SUB=args.sub, C1=args.c1, C2=args.c2))
    t0 = time.time()
    bitmap, comp, counts, ovf = enc(frames, thr)
    jax.block_until_ready(comp)
    print(f"compile+run {time.time()-t0:.1f}s  overflow={np.asarray(ovf).ravel()}")

    from pyrecode_tpu import oracle
    bitmap, comp, counts = np.asarray(bitmap), np.asarray(comp)[:, 0, :OUT], np.asarray(counts)
    ok = True
    for i in range(B):
        e = oracle.reduce_frame(frames[i], thr, 1, 12)
        bm_ok = bitmap[i].reshape(-1).tobytes() == e["packed_binary_map"]
        mask = frames[i] > thr
        expected_vals = (frames[i].astype(np.int32) - thr)[mask]
        n = int(counts[i, 0, 0])
        cv_ok = (n == expected_vals.size) and np.array_equal(comp[i][:n], expected_vals)
        tail_ok = not comp[i][n:].any()
        ok &= bm_ok and cv_ok and tail_ok
        if not (bm_ok and cv_ok and tail_ok):
            print(f"frame {i}: bitmap={bm_ok} comp={cv_ok} tail={tail_ok} n={n} vs {expected_vals.size}")
    print("bit-exact:", ok)

    from tools.profile_kernels import scan_time
    SCAN = 8
    u = jax.random.uniform(jax.random.key(0), (SCAN, B, H, W), dtype=jnp.float32)
    vals = jax.random.randint(jax.random.key(1), (SCAN, B, H, W), 1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.density, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    dt = scan_time(lambda fr, t: enc(fr, t), frames_all, jnp.asarray(thr))
    print(f"fused pallas encode: {dt*1e3:.2f} ms/batch -> {B*H*W*2/1e9/dt:.2f} GB/s")


if __name__ == "__main__":
    main()
