"""Probe: butterfly selection inside the FULL encode kernels, on real TPU.

tools/probe_butterfly.py showed every butterfly formulation is correct in
an isolated minimal kernel on hardware; the dec5970 divergence (summed
pairs at >= 25% density) only appeared in the full production kernels.
This probe swaps pallas_encode._SELECT and runs the REAL pipelines:

  * compact_tokens (128-lane windows, the deflate chain's A.5 pass) on
    token streams at 10/22/35/60% density vs the rank-match output;
  * encode_l1_pallas 512^2 at 1/5/15% density vs the oracle reference
    (row-major foreground values);

and, when a variant survives all of that, times both selections at the
4096^2 L1 + compact production configs.

Run on the real TPU: `python tools/probe_butterfly_full.py [--bench]`.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyrecode_tpu.profiling import enable_compile_cache

enable_compile_cache()


def clear_kernel_caches():
    from pyrecode_tpu.ops import pallas_decode, pallas_encode

    pallas_encode._build_l1_kernel.cache_clear()
    pallas_decode._build_decode_kernel.cache_clear()
    # jit wrappers also cache traced kernels — clear them too
    pallas_encode._encode_call.clear_cache()


def ref_pack(vals):
    """Stable left-pack reference: row-major foreground values."""
    flat = vals.reshape(-1)
    return flat[flat != 0]


def run_compact(jnp, pdk, tok_np, bucket, bound):
    import jax.numpy as jnpp

    dense, cnt, ovf = pdk.compact_tokens(jnpp.asarray(tok_np), bound,
                                         bucket=bucket, interpret=False)
    return (np.asarray(dense), np.asarray(cnt), bool(np.asarray(ovf).any()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyrecode_tpu.ops import pallas_deflate as pdk, pallas_encode as pe

    print("platform:", jax.devices()[0].platform)
    assert jax.devices()[0].platform == "tpu", "run this on the real chip"

    rng = np.random.default_rng(42)

    # ---- fixtures ----
    NPAD = 4 * pdk.CH_B          # 16K token slots per stream
    tok_fixtures = {}
    for dens in (0.10, 0.22, 0.35, 0.60):
        tok_fixtures[dens] = [
            (rng.integers(1, 513, (4, NPAD))
             * (rng.random((4, NPAD)) < dens)).astype(np.uint16)
            for _ in range(3)]
    frames_fixtures = {}
    for dens in (0.01, 0.05, 0.15):
        f = (rng.integers(1, 4096, (4, 512, 512))
             * (rng.random((4, 512, 512)) < dens)).astype(np.uint16)
        frames_fixtures[dens] = f
    thr = jnp.zeros((512, 512), jnp.uint16)

    variants = {
        "rank_match": pe._select_rank_match,
        "butterfly": pe._select_butterfly,
    }
    results = {}
    for name, sel in variants.items():
        pe._SELECT = sel
        clear_kernel_caches()
        ok_all = True
        # compact_tokens contexts (3 data instances per density, one kernel)
        for dens, toks_d in tok_fixtures.items():
            lam = 128 * dens
            need = lam + 5 * max(lam, 1) ** 0.5
            from pyrecode_tpu.ops.pallas_encode import CAPACITY_BUCKETS
            bucket = next((b for b, c in enumerate(CAPACITY_BUCKETS)
                           if c >= need), len(CAPACITY_BUCKETS) - 1)
            bound = NPAD  # top bound: no truncation
            ok = True
            for tok in toks_d:
                dense, cnt, ovf = run_compact(jnp, pdk, tok, bucket, bound)
                ok = ok and not ovf
                for i in range(tok.shape[0]):
                    ref = ref_pack(tok[i].astype(np.int32))
                    ok = ok and cnt[i] == ref.size and np.array_equal(
                        dense[i, :ref.size].astype(np.int32), ref)
            print(f"{name:11s} compact dens={dens:4.2f} bucket={bucket}: "
                  f"{'OK' if ok else 'DIVERGED'}")
            ok_all = ok_all and ok
        # stacked-superframe context (the production small-frame path)
        for dens in (0.01, 0.15):
            frames = (rng.integers(1, 4096, (16, 512, 512))
                      * (rng.random((16, 512, 512)) < dens)
                      ).astype(np.uint16)
            per_bound = 1 << int(np.ceil(np.log2(512 * 512 * dens * 2
                                                 + 512)))
            bucket = 0 if dens <= 0.012 else 2
            bm, comp, cnt, ovf = pe.encode_l1_stacked(
                jnp.asarray(frames), thr, per_frame_bound=per_bound,
                bucket=bucket, interpret=False)
            comp = np.asarray(comp)[0]
            ok = not bool(np.asarray(ovf).any())
            counts = np.array([int((frames[i] > 0).sum())
                               for i in range(16)])
            starts = pe.stacked_offsets(counts)
            for i in range(16):
                ref = frames[i][frames[i] > 0].astype(np.int32)
                got = comp[starts[i]: starts[i] + ref.size]
                ok = ok and np.array_equal(got, ref)
            print(f"{name:11s} L1-stacked dens={dens:4.2f}: "
                  f"{'OK' if ok else 'DIVERGED'}")
            ok_all = ok_all and ok
        # full L1 encode contexts
        for dens, frames in frames_fixtures.items():
            out_size = 1 << int(np.ceil(np.log2(512 * 512 * dens * 2 + 512)))
            bucket = 0 if dens <= 0.012 else (1 if dens <= 0.025 else 2)
            bm, comp, cnt, ovf = pe.encode_l1_pallas(
                jnp.asarray(frames), thr, out_size=out_size, bucket=bucket,
                interpret=False)
            comp = np.asarray(comp)
            cnt = np.asarray(cnt)
            ok = not bool(np.asarray(ovf).any())
            for i in range(frames.shape[0]):
                ref = frames[i][frames[i] > 0].astype(np.int32)
                ok = ok and cnt[i] == ref.size \
                    and np.array_equal(comp[i, :ref.size], ref)
            print(f"{name:11s} L1-512 dens={dens:4.2f} bucket={bucket}: "
                  f"{'OK' if ok else 'DIVERGED'}")
            ok_all = ok_all and ok
        results[name] = ok_all

    if args.bench and all(results.values()):
        from pyrecode_tpu.profiling import delta_scan_time

        size = 4096
        u = jax.random.uniform(jax.random.key(0), (10, 4, size, size))
        vals = jax.random.randint(jax.random.key(1), (10, 4, size, size),
                                  1, 4096, jnp.int32)
        fr = jnp.where(u < 0.01, vals, 0).astype(jnp.uint16)
        th4 = jnp.zeros((size, size), jnp.uint16)
        jax.block_until_ready(fr)
        out_size = 1 << int(np.ceil(np.log2(size * size * 0.01 * 2)))
        # production-size compact: 2MB token streams at 22% density
        NB = 512 * pdk.CH_B
        tb = (rng.integers(1, 513, (4, NB))
              * (rng.random((4, NB)) < 0.22)).astype(np.uint16)
        toks = jnp.asarray(np.broadcast_to(tb[None], (10, 4, NB)).copy())
        tbound = 786432
        for name, sel in variants.items():
            pe._SELECT = sel
            clear_kernel_caches()
            dt_e = delta_scan_time(
                lambda f: jnp.sum(pe.encode_l1_pallas(
                    f, th4, out_size=out_size, bucket=0,
                    interpret=False)[2]).astype(jnp.float32), fr)
            dt_c = delta_scan_time(
                lambda t: jnp.sum(pdk.compact_tokens(
                    t, tbound, bucket=1, interpret=False)[1]
                ).astype(jnp.float32), toks)
            print(f"{name:11s} L1-4096 encode {dt_e*1e3:7.3f} ms/batch "
                  f"({4*size*size*2/dt_e/1e9:5.2f} GB/s); "
                  f"compact {dt_c*1e3:6.3f} ms/batch")

    pe._SELECT = pe._select_rank_match
    clear_kernel_caches()
    print("verdict:", {k: ("SAFE" if v else "MISCOMPILES") for k, v in
                       results.items()})


if __name__ == "__main__":
    main()
