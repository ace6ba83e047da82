#!/usr/bin/env python
"""Cumulative timing of the deflate e2e device chain.

profile_e2e_stages times stages in ISOLATION; the full chain measured by
bench_e2e runs ~1.5 ms/batch slower than the stage sum.  This probe times
growing prefixes of the real chain (encode; +bitpack; +fused tok/compact;
+assemble-bm; +tokenize-pk) so each increment includes any XLA-inserted
copies or fusion boundaries the isolated runs hide.

Usage: python tools/probe_e2e_cumulative.py [--size 4096] [--batch 4]
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

    from pyrecode_tpu import native
    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.codecs.dyndeflate import LEN_EXTRA
    from pyrecode_tpu.ops import bitpack, pallas_deflate as pdk, pallas_encode
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    vals = jax.random.randint(jax.random.key(1), (args.scan, B, size, size),
                              1, 4096, jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)

    bucket = 0
    out_size = 1 << (int(np.ceil(np.log2(n_px * args.occupancy * 2))))
    bm0, comp0, cnt0, _ = pallas_encode.encode_l1_pallas(
        frames_all[0], thr, out_size=out_size, bucket=bucket, interpret=False)
    pk0 = bitpack.bitpack_values_device(comp0, 12)
    n_bm = bm0.shape[1]
    npad_bm = -(-n_bm // pdk.CH_A) * pdk.CH_A
    n_pk = pk0.shape[1]
    npad_pk = -(-n_pk // pdk.CH_A) * pdk.CH_A

    def tables_for(stream_row, n):
        _, hist, _ = pdk.tokenize_pallas(stream_row, np.array([n], np.int32),
                                         interpret=False)
        lfreq = np.asarray(hist)[0, :286].astype(np.uint32).copy()
        lfreq[256] += 1
        llen, lcode = native.dyn_tables(lfreq)
        hb, hbits = native.dyn_header(llen)
        lutab = dd.luts_as_radix(llen, lcode)
        f = np.asarray(hist)[0, :286].astype(np.int64)
        sb = llen[:286].astype(np.int64).copy()
        sb[257:286] += LEN_EXTRA[: 286 - 257].astype(np.int64) + 1
        ntok = max(int(f.sum()), 1)
        est = int((f * sb).sum()) * pdk.CH_B // ntok
        nw = pdk.window_rows_for(int(est * 1.3) + 8)
        return ((jnp.asarray(np.broadcast_to(lutab, (B, 48, 32)).copy()),
                 jnp.full((B,), hbits % 8, jnp.int32),
                 jnp.full((B,), int(hb[-1]) if hbits % 8 else 0, jnp.int32)),
                nw, ntok)

    bm_pad0 = jnp.pad(bm0[:1], ((0, 0), (0, npad_bm - n_bm)))
    tab_bm, nw_bm, tok0 = tables_for(bm_pad0, n_bm)
    tok_bound = dd.quantize_bound(int(tok0 * 1.02), pdk.CH_B)
    fbkt = pdk.token_bucket_for(tok0 / n_bm)
    out_bm = -(-(min(2 * npad_bm,
                     (tok_bound * pdk.MAX_TOKEN_BITS + 7) // 8) + 256)
               // 128) * 128

    def p1(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        return (jnp.sum(bitmap[:, :128].astype(jnp.int32)),
                jnp.sum(comp[:, :128]), counts)

    def p2(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        return (jnp.sum(bitmap[:, :128].astype(jnp.int32)),
                jnp.sum(packed[:, :128].astype(jnp.int32)), counts)

    def p3(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        dense_bm, hist_bm, ad_bm, dcnt, covf = pdk.tokenize_compact_pallas(
            bm, lens_bm, fbkt, tok_bound, interpret=False)
        return (jnp.sum(dense_bm[:, :128]), jnp.sum(packed[:, :128]
                                                    .astype(jnp.int32)),
                jnp.sum(ad_bm.astype(jnp.uint32)).astype(jnp.int32))

    def p4(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        dense_bm, hist_bm, ad_bm, dcnt, covf = pdk.tokenize_compact_pallas(
            bm, lens_bm, fbkt, tok_bound, interpret=False)
        body_bm, bits_bm, _ = pdk.assemble_pallas(dense_bm, *tab_bm,
                                                  out_bm, nw=nw_bm,
                                                  interpret=False)
        return (jnp.sum(bits_bm), jnp.sum(packed[:, :128].astype(jnp.int32)),
                jnp.sum(ad_bm.astype(jnp.uint32)).astype(jnp.int32))

    def p5(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        pk = jnp.pad(packed, ((0, 0), (0, npad_pk - n_pk)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        lens_pk = ((counts * 12 + 7) // 8).astype(jnp.int32)
        dense_bm, hist_bm, ad_bm, dcnt, covf = pdk.tokenize_compact_pallas(
            bm, lens_bm, fbkt, tok_bound, interpret=False)
        body_bm, bits_bm, _ = pdk.assemble_pallas(dense_bm, *tab_bm,
                                                  out_bm, nw=nw_bm,
                                                  interpret=False)
        tok_pk, hist_pk, ad_pk = pdk.tokenize_pallas(pk, lens_pk,
                                                     interpret=False)
        return (jnp.sum(bits_bm) + jnp.sum(hist_pk)
                + jnp.sum(ad_pk.astype(jnp.uint32)).astype(jnp.int32),
                jnp.sum(packed[:, :128].astype(jnp.int32)),
                jnp.sum(ad_bm.astype(jnp.uint32)).astype(jnp.int32))

    prev = 0.0
    for name, fn in (("encode", p1), ("+bitpack", p2),
                     ("+fused tok/compact bm", p3), ("+assemble bm", p4),
                     ("+tokenize pk (full chain)", p5)):
        dt = delta_scan_time(fn, frames_all)
        print(f"{name:28s} {dt*1e3:7.3f} ms/batch  (+{(dt-prev)*1e3:6.3f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
