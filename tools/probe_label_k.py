#!/usr/bin/env python
"""L2/L4 kernel halo-size (K) sweep on hardware.

The tap count scales ~(K+1)(2K+1) and the box-min does K+1 iterations, so a
smaller halo is the physics win (electron puddles are a few px across) —
but a puddle whose members exceed Chebyshev distance K from its root flags
overflow and the batch escalates.  This probe times K in {2, 3, 4} on the
bench fixture (uniform-random sparse) and reports the per-frame overflow
rate at each K so the HALO_BUCKETS front can be chosen from data.

Usage: python tools/probe_label_k.py [--size 512] [--batch 32] [--lvl 4]
"""

import argparse
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
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--density", type=float, default=0.01)
    ap.add_argument("--lvl", type=int, default=4, choices=(2, 4))
    ap.add_argument("--scan", type=int, default=8)
    args = ap.parse_args()

    from pyrecode_tpu.ops import pallas_label
    from pyrecode_tpu.ops.pallas_label import _label_call
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1),
                              (args.scan, B, size, size), 1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.density, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)
    out_size = 1 << int(np.ceil(np.log2(size * size * args.density * 2)))
    mode = "l2max" if args.lvl == 2 else "l4w"

    nbytes = B * size * size * 2
    for K in (2, 3, 4):
        def body(fr, K=K):
            bitmap, comp, counts, ovf = _label_call(
                fr, thr, out_size, K, 32, mode, 12, False)
            return (jnp.sum(bitmap[:, :128].astype(jnp.int32)),
                    jnp.sum(counts), jnp.sum(ovf))
        # overflow rate over the scan pool (batch-level escalation prob.)
        novf = 0
        for s in range(args.scan):
            _, _, ovf = jax.jit(body)(frames_all[s])
            novf += int(np.asarray(ovf))
        dt = delta_scan_time(body, frames_all)
        print(f"K={K}: {nbytes/dt/1e9:6.2f} GB/s  "
              f"({dt*1e3:.2f} ms/batch)  overflowing frames: "
              f"{novf}/{args.scan * B}", flush=True)


if __name__ == "__main__":
    main()
