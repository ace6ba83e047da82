#!/usr/bin/env python
"""Pass-A tile-size sweep: (8, 2048) default vs (16, 2048) tall tiles.

The deflate tokenize kernel processes CH_A = ROWS_A x SUB_A bytes per grid
step.  Per-step costs split into per-byte vector work (scans, token
decision, histogram one-hots — constant per byte), per-row scalar chains
(run-start/end carries, adler terms, _row_broadcast masks — the broadcast
is QUADRATIC in ROWS_A), and fixed step overhead (grid sequencing, SMEM
sync, the fused path's compact+store machinery).  Doubling ROWS_A halves
the fixed overhead per byte but doubles the row-chain cost per step; this
probe measures which effect wins on hardware, for both the dense tokenize
and the fused tokenize+compact forms.

Method: build both kernel variants by REBINDING the module constants in a
subprocess-unsafe but probe-local way (ROWS_A/CH_A are read at trace
time; the lru_cache is cleared between variants).  Correctness first
(dense token stream + histogram + adler vs the numpy oracle, and fused
output vs the dense+compact reference, on hardware), then delta-scan
timing at the bench_e2e shapes.

Negative or neutral result gets recorded in the module docstring like the
CH_B=8192 sweep; a >10% win justifies promoting the constant (followed by
the full verify_hw gate).
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


def set_tile(pdk, rows):
    """Rebind the pass-A tile geometry and clear kernel caches.

    The jit wrappers are keyed on shapes only, so both their traces and
    the kernel-builder lru_cache must be dropped or the second variant
    silently reuses the first's compiled kernel."""
    pdk.ROWS_A = rows
    pdk.CH_A = rows * pdk.SUB_A
    pdk._build_tokenize_kernel.cache_clear()
    pdk._tokenize_call.clear_cache()
    pdk._tokenize_compact_call.clear_cache()


def check_correct(pdk, dd, interpret):
    """Dense + fused outputs vs the numpy tokenizer on mixed streams."""
    import zlib
    rng = np.random.default_rng(42)
    raws = []
    for dens in (0.005, 0.08, 0.5):
        n = int(rng.integers(2 * pdk.CH_A, 4 * pdk.CH_A))
        s = (rng.integers(0, 256, n) * (rng.random(n) < dens)).astype(np.uint8)
        raws.append(s.tobytes())
    npad = 4 * pdk.CH_A
    streams = np.zeros((len(raws), npad), np.uint8)
    lengths = np.zeros(len(raws), np.int32)
    for i, r in enumerate(raws):
        streams[i, : len(r)] = np.frombuffer(r, np.uint8)
        lengths[i] = len(r)
    tok, hist, adler = pdk.tokenize_pallas(streams, lengths,
                                           interpret=interpret)
    lut = pdk.NO_TOKEN - np.asarray(tok).astype(np.int32)
    hist = np.asarray(hist)
    for i, raw in enumerate(raws):
        nn = len(raw)
        ref_lut, ref_sym = dd.tokenize_bytes_np(np.frombuffer(raw, np.uint8))
        assert np.array_equal(lut[i, :nn], ref_lut), ("dense", i)
        ref_hist = dd.histogram_np(ref_sym)
        ref_hist[256] -= 1
        assert np.array_equal(hist[i, :286], ref_hist), ("hist", i)
        assert int(np.asarray(adler)[i]) == zlib.adler32(raw), ("adler", i)
    # fused vs dense+compact
    for bkt in (1, 3):
        bound = dd.quantize_bound(int(lengths.max()), pdk.CH_B)
        dense, fh, fa, dcnt, covf = pdk.tokenize_compact_pallas(
            streams, lengths, bkt, bound, interpret=interpret)
        if bool(np.asarray(covf).any()):
            continue
        ref_dense, rcnt, rovf = pdk.compact_tokens(tok, bound, bucket=2,
                                                   interpret=interpret)
        assert not bool(np.asarray(rovf).any())
        d1, d2 = np.asarray(dense), np.asarray(ref_dense)
        c1, c2 = np.asarray(dcnt), np.asarray(rcnt)
        assert np.array_equal(c1, c2), ("cnt", bkt)
        for i in range(len(raws)):
            assert np.array_equal(d1[i, : c1[i]], d2[i, : c2[i]]), \
                ("fused", bkt, i)
    print("  correctness: OK")


def timeit(pdk, dd, scan, B, nbytes, density, label):
    rng = np.random.default_rng(0)
    npad = -(-nbytes // pdk.CH_A) * pdk.CH_A
    data = (rng.integers(0, 256, (B, npad))
            * (rng.random((B, npad)) < density)).astype(np.uint8)
    lengths = jnp.full((B,), nbytes, jnp.int32)
    xs = jnp.stack([jnp.asarray(data)] * scan)
    jax.block_until_ready(xs)
    dt = delta_scan_time(
        lambda st: jnp.sum(pdk.tokenize_pallas(
            st, lengths, interpret=False)[1]).astype(jnp.float32), xs)
    print(f"  {label} dense tokenize  : {dt*1e3:6.2f} ms/batch")
    tok0 = int(np.asarray(pdk.tokenize_pallas(
        jnp.asarray(data), lengths,
        interpret=False)[1])[:, :286].sum(1).max())
    bound = dd.quantize_bound(int(tok0 * 1.05), pdk.CH_B)
    bkt = pdk.token_bucket_for(tok0 / nbytes)
    dt2 = delta_scan_time(
        lambda st: jnp.sum(pdk.tokenize_compact_pallas(
            st, lengths, bkt, bound,
            interpret=False)[1]).astype(jnp.float32), xs)
    print(f"  {label} fused tok+compact: {dt2*1e3:6.2f} ms/batch "
          f"(bkt={bkt} bound={bound})")
    return dt, dt2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.ops import pallas_deflate as pdk

    nbytes = 4096 * 4096 // 8          # one 4096^2 bitmap stream
    for rows in (8, 16):
        set_tile(pdk, rows)
        print(f"tile ({rows}, {pdk.SUB_A}) = {pdk.CH_A} bytes/step:")
        check_correct(pdk, dd, args.interpret)
        if not args.interpret:
            timeit(pdk, dd, args.scan, args.batch, nbytes, 0.077,
                   f"rows={rows}")
    set_tile(pdk, 8)


if __name__ == "__main__":
    main()
