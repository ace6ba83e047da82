#!/usr/bin/env python
"""Stage split of the gap-mode read chain (bench_e2e_read --mode gap).

The chain is: rANS symbol decode (gaps + pixvals) -> positions cumsum ->
pair packing -> per-sub-row counts (searchsorted) -> positions-driven
dense decode kernel.  This probe times growing prefixes to find where the
time goes.

Usage: python tools/probe_gap_read.py [--size 4096] [--batch 4]
"""

import argparse
import functools
import sys
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
    args = ap.parse_args()

    from pyrecode_tpu import native, oracle
    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import pallas_decode, pallas_rans as prk
    from pyrecode_tpu.ops.pallas_decode import (_choose_rpc_decode,
                                                _choose_sub)
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    frames = oracle.synthetic_frames(B, size, size, args.occupancy, 12,
                                     "peaked", rng=0)
    thr = np.zeros((size, size), np.uint16)
    streams = []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        sb = native.rans_compress_gaps_native(red["packed_binary_map"], 1024)
        streams.append(sb)
    metas = [rans._parse_header(s) for s in streams]
    m_max = max(h["m"] for h in metas)
    npad = -(-max(m_max, 1) // prk.CH_R) * prk.CH_R
    bw = -(-max(max(len(h["body"]) for h in metas), 4) // 512) * 512
    bodies = np.zeros((B, bw), np.uint8)
    states = np.zeros((B, 1024), np.int32)
    tabs = np.zeros((B, 96, 128), np.float32)
    ms = np.zeros(B, np.int32)
    for i, h in enumerate(metas):
        rev = np.frombuffer(h["body"], np.uint8)[::-1]
        bodies[i, : rev.size] = rev
        states[i] = h["states"].astype(np.int64).astype(np.int32)
        tabs[i] = prk.decode_tables_radix(h["freq"])
        ms[i] = h["m"]
    bod = jnp.asarray(bodies)
    st = jnp.asarray(states)
    tb = jnp.asarray(tabs)
    msj = jnp.asarray(ms)
    sb_scan = jnp.stack([bod] * args.scan)
    jax.block_until_ready(sb_scan)

    sub = _choose_sub(size)
    n_subrows = size * size // sub
    OUT = -(-npad // 128) * 128

    def syms_of(b):
        return prk.rans_decode_pallas(b, st, msj, npad, tb,
                                      interpret=False, groups=1)

    def p_syms(b):
        return jnp.sum(syms_of(b)[:, :128].astype(jnp.int32)
                       ).astype(jnp.float32)

    def positions_of(b):
        gaps = syms_of(b)
        io = jnp.arange(gaps.shape[1], dtype=jnp.int32)[None, :]
        adv = jnp.where(io < msj[:, None], gaps + 1, 0)
        pos = jnp.cumsum(adv, axis=1, dtype=jnp.int32) - 1
        return jnp.pad(pos, ((0, 0), (0, OUT - pos.shape[1])))

    def p_cumsum(b):
        return jnp.sum(positions_of(b)[:, :128]).astype(jnp.float32)

    def counts_of(pos):
        bounds = jnp.arange(1, n_subrows + 1, dtype=jnp.int32) * sub
        posm = jnp.where(
            jnp.arange(pos.shape[1], dtype=jnp.int32)[None, :]
            < msj[:, None], pos, size * size)
        ends = jax.vmap(lambda p: jnp.searchsorted(p, bounds))(posm)
        return jnp.diff(ends, prepend=jnp.zeros((B, 1), ends.dtype),
                        axis=1).astype(jnp.int32)

    def p_counts(b):
        return jnp.sum(counts_of(positions_of(b))[:, :128]
                       ).astype(jnp.float32)

    def p_full(b):
        pos = positions_of(b)
        cnt1 = counts_of(pos)
        vals = jnp.zeros_like(pos)    # value stream decode timed separately
        dense, ovf = pallas_decode.decode_l1_from_positions(
            pos, vals, msj, size, size, bucket=0, interpret=False)
        return (jnp.sum(dense[:, ::997, ::997].astype(jnp.int32))
                + jnp.sum(cnt1[:, :128]).astype(jnp.int32)
                + jnp.sum(ovf.astype(jnp.int32))).astype(jnp.float32)

    base = None
    for name, fn in (("syms", p_syms), ("+cumsum", p_cumsum),
                     ("+counts(searchsorted)", p_counts),
                     ("+posdecode (full)", p_full)):
        dt = delta_scan_time(fn, sb_scan) * 1e3
        inc = "" if base is None else f"  (+{dt - base:.3f})"
        base = dt
        print(f"{name:24s} {dt:8.3f} ms/batch{inc}", flush=True)


if __name__ == "__main__":
    main()
