"""Probe: L1 encode with narrow (128-px) sub-rows + smaller C1 vs production.

Rank-match compaction costs C1/2 passes over the whole chunk, so at low
density a narrower sub-row window with a proportionally smaller capacity
(SUB=128, C1=16 instead of SUB=512, C1=32) halves the dominant VPU term,
at the price of ~4x the hierarchical-concat roll traffic.  This probe
byte-checks the variant against the oracle on hardware (output order is
row-major for any SUB) and times both at the 4096^2 / 1% operating point.

Usage: python tools/probe_sub128.py [--size 4096] [--occupancy 0.01]
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
    ap.add_argument("--sub", type=int, default=128)
    ap.add_argument("--c1", type=int, default=16)
    args = ap.parse_args()

    from pyrecode_tpu.ops import pallas_encode as pe
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    rng = np.random.default_rng(0)
    frames_np = (rng.integers(1, 4096, (B, size, size))
                 * (rng.random((B, size, size)) < args.occupancy)
                 ).astype(np.uint16)
    frames = jnp.asarray(frames_np)
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1), (args.scan, B, size, size),
                              1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)
    out_size = 1 << (int(np.ceil(np.log2(n_px * args.occupancy * 2))))

    interp = jax.devices()[0].platform != "tpu"
    print(f"platform={jax.devices()[0].platform} interpret={interp}")

    # production config
    bm0, cp0, cnt0, ovf0 = pe.encode_l1_pallas(frames, thr, out_size=out_size,
                                               bucket=0, interpret=interp)
    assert not bool(np.asarray(ovf0).any())

    # narrow variant via patched sub-row choice
    orig = pe._choose_sub
    pe._choose_sub = lambda w: args.sub
    try:
        out_al = max(128, -(-out_size // 128) * 128)
        bm1, cp1, cnt1, ovf1 = pe._encode_call(frames, thr, out_al, args.c1,
                                               True, interp)
        ovf1 = np.asarray(ovf1)
        print(f"narrow SUB={args.sub} C1={args.c1}: overflow={ovf1.any()}")
        assert not ovf1.any(), "narrow capacity overflowed; raise --c1"
        same_bm = np.array_equal(np.asarray(bm0), np.asarray(bm1))
        same_cp = np.array_equal(np.asarray(cp0), np.asarray(cp1)[:, :out_size])
        same_ct = np.array_equal(np.asarray(cnt0), np.asarray(cnt1))
        print(f"bitmap identical: {same_bm}; values identical: {same_cp}; "
              f"counts identical: {same_ct}")
        # reference check on frame 0: row-major foreground residuals
        mask = frames_np[0] > 0
        ref_vals = frames_np[0][mask].astype(np.int32)
        n = int(np.asarray(cnt1)[0])
        assert n == ref_vals.size
        assert np.array_equal(np.asarray(cp1)[0, :n], ref_vals)
        print("narrow variant matches reference values")

        dt1 = delta_scan_time(
            lambda fr: jnp.sum(pe._encode_call(
                fr, thr, out_al, args.c1, True, interp)[2]).astype(jnp.float32),
            frames_all)
        print(f"narrow : {dt1*1e3:7.3f} ms/batch  "
              f"{B*n_px*2/dt1/1e9:6.2f} GB/s")
    finally:
        pe._choose_sub = orig

    dt0 = delta_scan_time(
        lambda fr: jnp.sum(pe.encode_l1_pallas(
            fr, thr, out_size=out_size, bucket=0,
            interpret=interp)[2]).astype(jnp.float32),
        frames_all)
    print(f"prod   : {dt0*1e3:7.3f} ms/batch  "
          f"{B*n_px*2/dt0/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
