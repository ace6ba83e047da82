"""Compare bit-packing variants on real TPU (delta-scan method).

The e2e profile showed `bitpack_values` (byte-stack formulation) costing
~0.42 ms/frame at the 4096^2 / 1% operating point — suspiciously slow for a
shift/or kernel, pointing at the (..., 3) minor-dim u8 relayout.  This tool
times the byte-stack and word-stack formulations at the production shape.

Usage: python tools/bench_bitpack.py [--out 524288] [--batch 4] [--depth 12]
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
    ap.add_argument("--out", type=int, default=524288)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--scan", type=int, default=12)
    args = ap.parse_args()

    from pyrecode_tpu.ops import bitpack
    from pyrecode_tpu.profiling import delta_scan_time

    B, OUT, b = args.batch, args.out, args.depth
    vals = jax.random.randint(jax.random.key(0), (args.scan, B, OUT),
                              0, 1 << b, jnp.int32).astype(jnp.uint32)
    jax.block_until_ready(vals)
    nvals = B * OUT

    def report(name, fn):
        dt = delta_scan_time(
            lambda v: jnp.sum(fn(v, b).astype(jnp.int32)).astype(jnp.float32),
            vals)
        print(f"{name:24s} {dt*1e3:8.3f} ms/batch  "
              f"{nvals/dt/1e9:6.2f} Gval/s  "
              f"{nvals*b/8/dt/1e9:6.2f} GB/s packed")

    report("bitpack bytes (current)", bitpack.bitpack_values)
    report("bitpack words", bitpack.bitpack_values_words)

    # byte-identity on device
    got_a = np.asarray(bitpack.bitpack_values(vals[0], b))
    got_b = np.asarray(bitpack.bitpack_values_words(vals[0], b))
    assert np.array_equal(got_a, got_b), "variants disagree on hw"
    print("variants byte-identical on hw")


if __name__ == "__main__":
    main()
