#!/usr/bin/env python
"""Hardware byte-identity + in-chain timing for ops/pallas_bitpack.

Compares bitpack12_pallas against the XLA word-stack path on the real chip
(Mosaic can miscompile what interpret mode validates — see the butterfly
incident), then times the encode->pack chain with each implementation.

Usage: python tools/probe_pallas_bitpack.py [--size 4096] [--batch 4]
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
    args = ap.parse_args()

    from pyrecode_tpu.ops import bitpack, pallas_bitpack, pallas_encode
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

    # --- byte identity on hw ---
    bm, comp, cnt, _ = pallas_encode.encode_l1_pallas(
        frames_all[0], thr, out_size=out_size, bucket=0, interpret=False)
    ref = np.asarray(bitpack.bitpack_values(comp.astype(jnp.uint32), 12))
    got = np.asarray(pallas_bitpack.bitpack12_pallas(comp))
    ok = np.array_equal(ref, got)
    print(f"hw byte identity (encode output, {comp.shape}): "
          f"{'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.argwhere(ref != got)
        print("first mismatches:", bad[:8].tolist())
        print("ref", ref[tuple(bad[0])], "got", got[tuple(bad[0])])
        sys.exit(1)
    # random dense values too (all 12-bit patterns)
    rv = jax.random.randint(jax.random.key(7), (B, out_size), 0, 4096,
                            jnp.int32).astype(jnp.uint16)
    ref2 = np.asarray(bitpack.bitpack_values(rv.astype(jnp.uint32), 12))
    got2 = np.asarray(pallas_bitpack.bitpack12_pallas(rv))
    ok2 = np.array_equal(ref2, got2)
    print(f"hw byte identity (uniform values): "
          f"{'OK' if ok2 else 'MISMATCH'}", flush=True)
    if not ok2:
        sys.exit(1)

    # --- in-chain timing ---
    def enc(frames):
        _, comp, cnt, _ = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=0, interpret=False)
        return comp, cnt

    def t_enc(frames):
        comp, cnt = enc(frames)
        return jnp.sum(comp[:, :128]), cnt

    def t_xla(frames):
        comp, cnt = enc(frames)
        pk = bitpack.bitpack_values(comp.astype(jnp.uint32), 12)
        return jnp.sum(pk[:, :128].astype(jnp.int32)), cnt

    def t_pallas_words(frames):
        comp, cnt = enc(frames)
        w = pallas_bitpack.bitpack12_words_pallas(comp)
        return jnp.sum(w[:, :128]), cnt

    def t_pallas_bytes(frames):
        comp, cnt = enc(frames)
        pk = pallas_bitpack.bitpack12_pallas(comp)
        return jnp.sum(pk[:, :128].astype(jnp.int32)), cnt

    base = delta_scan_time(t_enc, frames_all) * 1e3
    print(f"enc-only      {base:7.3f} ms/batch", flush=True)
    for name, fn in (("xla", t_xla), ("pallas-words", t_pallas_words),
                     ("pallas-bytes", t_pallas_bytes)):
        ms = delta_scan_time(fn, frames_all) * 1e3
        print(f"{name:13s} {ms:7.3f} ms/batch  (pack {ms - base:+.3f})",
              flush=True)


if __name__ == "__main__":
    main()
