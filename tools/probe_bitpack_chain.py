#!/usr/bin/env python
"""Localize the in-chain bitpack slowdown (probe_e2e_cumulative).

Isolated, `bitpack_values(comp.astype(u32), 12)` on a 4-frame 4096^2 comp
buffer costs 0.52 ms; as an increment inside the encode->bitpack jit it
costs 3.16 ms.  Same shapes, so the suspect is XLA's layout/fusion choice
when the input comes from the Pallas custom call instead of a jit argument.
This probe times the encode prefix plus bitpack variants:

  cur     current chain (cast + word-stack pack)
  barrier optimization_barrier between encode and pack (kills fusion)
  nocast  pass comp (u16) straight in (cast happens inside the reshape)
  copy    explicit jnp.copy of comp before the pack (forces relayout once)

Usage: python tools/probe_bitpack_chain.py [--size 4096] [--batch 4]
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
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--scan", type=int, default=12)
    ap.add_argument("--variants", type=str, default="",
                    help="comma list; empty = all")
    args = ap.parse_args()

    from pyrecode_tpu.ops import bitpack, pallas_encode
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1), (args.scan, B, size, size),
                              1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)
    out_size = 1 << int(np.ceil(np.log2(n_px * args.occupancy * 2)))

    def enc(frames):
        bm, comp, cnt, _ = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=0, interpret=False)
        return bm, comp, cnt

    def tail(pk, cnt):
        return jnp.sum(pk[:, :128].astype(jnp.int32)), cnt

    variants = {
        "enc-only": lambda f: (lambda bm, comp, cnt:
                               (jnp.sum(comp[:, :128]), cnt))(*enc(f)),
        "cur": lambda f: (lambda bm, comp, cnt: tail(
            bitpack.bitpack_values(comp.astype(jnp.uint32), 12), cnt))(*enc(f)),
        "barrier": lambda f: (lambda bm, comp, cnt: tail(
            bitpack.bitpack_values(
                jax.lax.optimization_barrier(comp).astype(jnp.uint32), 12),
            cnt))(*enc(f)),
        "nocast": lambda f: (lambda bm, comp, cnt: tail(
            bitpack.bitpack_values(comp, 12), cnt))(*enc(f)),
        "copy": lambda f: (lambda bm, comp, cnt: tail(
            bitpack.bitpack_values(jnp.copy(comp).astype(jnp.uint32), 12),
            cnt))(*enc(f)),
    }

    pick = [v for v in args.variants.split(",") if v]
    base = None
    for name, fn in variants.items():
        if pick and name not in pick and name != "enc-only":
            continue
        dt = delta_scan_time(fn, frames_all)
        ms = dt * 1e3
        if name == "enc-only":
            base = ms
            print(f"{name:10s} {ms:7.3f} ms/batch", flush=True)
        else:
            print(f"{name:10s} {ms:7.3f} ms/batch  (pack increment "
                  f"{ms - base:+.3f})", flush=True)


if __name__ == "__main__":
    main()
