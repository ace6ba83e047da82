#!/usr/bin/env python
"""Hardware bisection of the L1 decode kernel variants vs oracle.

Flips pallas_decode._MXU_CUMSUM / _PAIRED_SELECT and byte-compares dense
output against the encode inputs at the failing config (4096^2, peaked, 1%).

Usage: python tools/probe_decode.py [--size 4096] [--occupancy 0.01]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from pyrecode_tpu.profiling import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--occupancy", type=float, default=0.01)
    args = ap.parse_args()

    from pyrecode_tpu import oracle
    from pyrecode_tpu.ops import bitpack, pallas_decode as pd

    size, B = args.size, args.batch
    frames = oracle.synthetic_frames(B, size, size, args.occupancy, 12,
                                     "peaked", rng=0)
    thr = np.zeros((size, size), np.uint16)
    bms, pks, counts = [], [], []
    for i in range(B):
        red = oracle.reduce_frame(frames[i], thr, 1, 12)
        bms.append(np.frombuffer(red["packed_binary_map"], np.uint8))
        pks.append(np.frombuffer(red["packed_pixvals"], np.uint8))
        counts.append(len(red["packed_pixvals"]) * 8 // 12)
    n_pk = -(-max(len(p) for p in pks) // 384) * 384
    bm_a = np.stack(bms)
    pk_a = np.zeros((B, n_pk), np.uint8)
    for i in range(B):
        pk_a[i, : len(pks[i])] = pks[i]

    for mxu, paired in ((False, False), (True, False), (False, True),
                        (True, True)):
        pd._MXU_CUMSUM, pd._PAIRED_SELECT = mxu, paired
        pd._build_decode_kernel.cache_clear()
        pd._decode_call.clear_cache()
        dense, ovf = pd.decode_l1_pallas(jnp.asarray(bm_a), jnp.asarray(pk_a),
                                         size, size, 12, bucket=0,
                                         interpret=False)
        ok = (not bool(np.asarray(ovf).any())
              and np.array_equal(np.asarray(dense).astype(np.uint16), frames))
        print(f"mxu_cumsum={mxu} paired={paired}: "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            d = np.asarray(dense).astype(np.uint16)
            bad = np.argwhere(d != frames)
            print(f"  first mismatches: {bad[:5].tolist()}  "
                  f"got {[int(d[tuple(b)]) for b in bad[:5]]} "
                  f"want {[int(frames[tuple(b)]) for b in bad[:5]]}")


if __name__ == "__main__":
    main()
