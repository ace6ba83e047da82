"""Sweep rows-per-chunk (RPC) for the fused L1 encode kernel on hardware.

_choose_rpc targets ~32K px per grid step (RPC=8 at 4096 wide -> 512 grid
steps per frame).  If per-grid-step overhead is still material at that size,
larger chunks should win despite heavier concat traffic (S and C2 double
with RPC).  This probe builds the kernel at several RPC values directly
(bypassing _choose_rpc) and reports steady-state GB/s via the relay-honest
delta-scan method.

Usage: python tools/probe_rpc.py [--size 4096] [--batch 4] [--occupancy 0.01]
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
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--rpcs", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--bucket", type=int, default=0)
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

    oracle_counts = None
    for rpc in args.rpcs:
        if size % rpc:
            print(f"RPC={rpc}: skipped (height % rpc != 0)")
            continue
        call, pack_mat, lti_mat = pe._build_l1_kernel(
            B, size, size, out_aligned, rpc, sub, c1,
            with_values=True, interpret=False)

        def body(frames, thr, pack_mat, lti, _call=call):
            bitmap, comp, counts, ovf = _call(frames, thr, pack_mat, lti)
            # checksum everything so no output is dead-code eliminated
            return (jnp.sum(bitmap.astype(jnp.float32)),
                    jnp.sum(comp.astype(jnp.float32)),
                    counts.astype(jnp.float32), ovf.astype(jnp.float32))

        t = delta_scan_time(body, frames_all, thr, jnp.asarray(pack_mat),
                            jnp.asarray(lti_mat))
        # Correctness: full bitmap + compacted-stream byte compare against the
        # first swept RPC, across EVERY scan batch (counts alone are blind to
        # concat/offset corruption — the dec5970 failure class).
        outs = []
        for s in range(args.scan):
            bitmap, comp, counts, ovf = call(frames_all[s], thr,
                                             jnp.asarray(pack_mat),
                                             jnp.asarray(lti_mat))
            counts = np.asarray(counts)[:, 0, 0]
            assert not np.asarray(ovf).any(), f"RPC={rpc}: overflow fired"
            bm = np.asarray(bitmap)
            cp = np.asarray(comp)[:, 0, :]
            outs.append((bm, [cp[b, :counts[b]] for b in range(B)], counts))
        if oracle_counts is None:
            oracle_counts = outs
        else:
            for s, (bm, cps, counts) in enumerate(outs):
                bm0, cps0, counts0 = oracle_counts[s]
                assert (counts == counts0).all(), f"RPC={rpc}: count mismatch"
                assert np.array_equal(bm, bm0), f"RPC={rpc}: bitmap mismatch"
                for b in range(B):
                    assert np.array_equal(cps[b], cps0[b]), \
                        f"RPC={rpc}: compacted stream mismatch batch {s} frame {b}"
        print(f"RPC={rpc:3d}  S={rpc * size // sub:4d}  "
              f"{t * 1e3:7.3f} ms/batch  {raw_bytes / t / 1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
