#!/usr/bin/env python
"""Phase attribution for the fused L2/L4 label kernel (VERDICT r4 #4).

No probe existed for the label kernel the way probe_phases does for L1
encode; this one separates its three cost families WITHOUT building
cut-down kernels, by exploiting that halo K controls them with known
op-count laws:

  label propagation: (K + 1) separable box-min iterations, 4 rolls each
  stats/centroid taps: T(K) = 2K^2 + 2K window taps, 1-2 rolls + compare
  fixed: load/halo gather, bitmap pack, root compaction, store

Timing the SAME fixture at K = 1, 2, 3 (rpc pinned so the grid does not
change) gives three (iters, taps) -> ms samples; a least-squares fit of
ms = fixed + a*(K+1) + b*T(K) attributes the per-phase cost.  The fit is
reported per mode (L2 sum and L4 weighted) at 512^2 and 4096^2.

Context: L2/L4 run ~13 GB/s at 512^2 while L1 runs 54 — the question is
whether the gap is the taps (would shrink with smarter gathering) or the
fixed machinery (shared with L1, already optimized).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pyrecode_tpu.profiling import enable_compile_cache, delta_scan_time

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=12)
    args = ap.parse_args()

    from pyrecode_tpu.ops import pallas_label as pL

    for size, batch in ((512, 32), (4096, 4)):
        u = jax.random.uniform(jax.random.key(0),
                               (args.scan, batch, size, size), jnp.float32)
        v = jax.random.randint(jax.random.key(1),
                               (args.scan, batch, size, size), 1, 4096,
                               jnp.int32)
        frames_all = jnp.where(u < 0.01, v, 0).astype(jnp.uint16)
        jax.block_until_ready(frames_all)
        thr = jnp.zeros((size, size), jnp.uint16)
        nbytes = batch * size * size * 2
        OUT = 1 << 19

        for level, kw in ((2, dict(statistic="sum")),
                          (4, dict(scheme="weighted_average"))):
            times = {}
            for K in (1, 2, 3):
                def run(fr, t, K=K):
                    # bypass encode_l2l4_pallas's HALO_BUCKETS table: call
                    # _label_call directly with this K
                    mode = pL._MODE_BY_CONFIG[(level,
                                               kw.get("statistic",
                                                      kw.get("scheme")))]
                    bm, st, cnt, ovf = pL._label_call(
                        fr, t, OUT, K, 32, mode, 12, False, None)
                    return cnt, bm[:, ::997], ovf

                dt = delta_scan_time(run, frames_all, thr)
                times[K] = dt * 1e3
                print(f"{size}^2 L{level} K={K}: {dt*1e3:7.2f} ms/batch "
                      f"({nbytes/1e9/dt:6.2f} GB/s)")

            # fit ms = fixed + a*(K+1) + b*(2K^2+2K)
            A = np.array([[1, K + 1, 2 * K * K + 2 * K] for K in (1, 2, 3)],
                         float)
            y = np.array([times[K] for K in (1, 2, 3)])
            coef, *_ = np.linalg.lstsq(A, y, rcond=None)
            fixed, a, b = coef
            K = 3
            print(f"  fit: fixed {fixed:.2f} ms + label-iters "
                  f"{a * (K + 1):.2f} ms + taps {b * (2 * K * K + 2 * K):.2f}"
                  f" ms at production K=3  (per-tap {b:.3f} ms)")


if __name__ == "__main__":
    main()
