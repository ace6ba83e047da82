#!/usr/bin/env python
"""Probe the packed dual compaction's select crossover on real hardware.

The packed positions path (pos_vbits) selects 21-bit lane|value payloads —
rank-match-wide costs C1 unpaired passes (upper half density-gated),
butterfly-wide log2(SUB) heavier stages.  This probe times the FULL fused
encode (with_positions, pos_vbits=12) at bucket 0 (C1=32) with both
variants, verifies byte-identity of values+positions against flatnonzero,
and prints the winner.  Update _PACKED_BUTTERFLY_MIN_C1 only from this
probe's hardware numbers (interpret mode proves nothing — CLAUDE.md
HW exactness warning).

Usage: python tools/probe_packed_select.py [--size 4096] [--batch 4]
"""

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
    ap.add_argument("--scan", type=int, default=12)
    args = ap.parse_args()

    from pyrecode_tpu.ops import pallas_encode as pe

    size, B = args.size, args.batch
    n_px = size * size
    out_size = 1 << int(np.ceil(np.log2(n_px * args.occupancy * 2)))
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1), (args.scan, B, size, size),
                              1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)
    fr0 = np.asarray(frames_all[0])

    results = {}
    for min_c1, label in ((64, "rank-match-wide"), (32, "butterfly-wide")):
        pe._PACKED_BUTTERFLY_MIN_C1 = min_c1
        pe._build_l1_kernel.cache_clear()
        pe._encode_call.clear_cache()

        bm, comp, cnt, ovf, pos = pe.encode_l1_pallas(
            frames_all[0], thr, out_size=out_size, bucket=0,
            interpret=False, with_positions=True, pos_vbits=12)
        ok = not bool(np.asarray(ovf).any())
        for i in range(B):
            ref = np.flatnonzero(fr0[i].reshape(-1))
            n = int(np.asarray(cnt)[i])
            ok = ok and n == ref.size \
                and np.array_equal(np.asarray(pos)[i, :n], ref) \
                and np.array_equal(np.asarray(comp)[i, :n],
                                   fr0[i].reshape(-1)[ref])
        if not ok:
            print(f"{label}: BYTE-IDENTITY FAIL at C1=32 — unusable")
            continue

        def body(fr):
            return pe.encode_l1_pallas(
                fr, thr, out_size=out_size, bucket=0, interpret=False,
                with_positions=True, pos_vbits=12)[:2]

        dt = delta_scan_time(body, frames_all)
        results[label] = dt
        print(f"{label:18s} (C1=32): {dt*1e3:.3f} ms/batch -> "
              f"{B*n_px*2/dt/1e9:.2f} GB/s  [identity OK]")

    pe._PACKED_BUTTERFLY_MIN_C1 = 64
    pe._build_l1_kernel.cache_clear()
    pe._encode_call.clear_cache()
    if len(results) == 2:
        rm, bf = results["rank-match-wide"], results["butterfly-wide"]
        print(f"butterfly/rank-match: {bf/rm:.3f} "
              f"({'butterfly wins' if bf < rm else 'rank-match wins'})")


if __name__ == "__main__":
    main()
