"""Per-stage timing of the relay-independent e2e device chain.

Times each stage of tools/bench_e2e.py's device_batch separately with the
honest delta-scan method, at the same shapes/buckets the e2e bench uses, so
the 19-ish ms/batch total can be attributed.  Stages measured on realistic
inputs (each stage's input comes from actually running the upstream stages
once).

Usage: python tools/profile_e2e_stages.py [--size 4096] [--batch 4]
       [--occupancy 0.01]
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

    bucket = 0 if args.occupancy <= 0.012 else (1 if args.occupancy <= 0.025
                                                else 2)
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
    pk_pad0 = jnp.pad(pk0[:1], ((0, 0), (0, npad_pk - n_pk)))
    tab_bm, nw_bm, tok0 = tables_for(bm_pad0, n_bm)
    plen0 = int((int(np.asarray(cnt0)[0]) * 12 + 7) // 8)
    tab_pk, nw_pk, tok_pk0 = tables_for(pk_pad0, plen0)
    out_pk = -(-(2 * npad_pk + 256) // 128) * 128

    # quarter-octave bound like production deflate_batch_device: the old
    # pow2-of-1.5x rule left ~50% pad steps, inflating the assemble figure
    # (2.9 ms "measured" vs ~1.7 at production slack, r5)
    from pyrecode_tpu.codecs.dyndeflate import quantize_bound
    tok_bound = quantize_bound(int(tok0 * 1.1) + 1, pdk.CH_B)
    cbkt = pdk.compact_bucket_for(tok0 / n_bm)
    out_bm = -(-(min(2 * npad_bm,
                     (tok_bound * pdk.MAX_TOKEN_BITS + 7) // 8) + 256)
               // 128) * 128
    print(f"bm stream: n={n_bm} tokens~{tok0} ({100*tok0/n_bm:.1f}%) "
          f"cbkt={cbkt} tok_bound={tok_bound} nw={nw_bm}")
    print(f"pk stream: n~{plen0} tokens~{tok_pk0} "
          f"({100*tok_pk0/max(plen0,1):.1f}%) nw={nw_pk}")

    # ---- stage inputs (run the chain once, materialized per scan step) ----
    def chain(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        pk = jnp.pad(packed, ((0, 0), (0, npad_pk - n_pk)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        lens_pk = ((counts * 12 + 7) // 8).astype(jnp.int32)
        tok_bm, hist_bm, ad_bm = pdk.tokenize_pallas(bm, lens_bm,
                                                     interpret=False)
        dense_bm, dcnt, covf = pdk.compact_tokens(
            tok_bm, tok_bound, bucket=cbkt, interpret=False)
        tok_pk, hist_pk, ad_pk = pdk.tokenize_pallas(pk, lens_pk,
                                                     interpret=False)
        return bm, pk, lens_bm, lens_pk, tok_bm, dense_bm, tok_pk, comp

    outs = jax.jit(chain)(frames_all[0])
    bms = jnp.stack([outs[0]] * args.scan)
    pks = jnp.stack([outs[1]] * args.scan)
    lens_bm0, lens_pk0 = outs[2], outs[3]
    tok_bms = jnp.stack([outs[4]] * args.scan)
    dense_bms = jnp.stack([outs[5]] * args.scan)
    tok_pks = jnp.stack([outs[6]] * args.scan)
    comps = jnp.stack([outs[7]] * args.scan)
    jax.block_until_ready(dense_bms)

    def report(name, dt):
        print(f"{name:36s} {dt*1e3:8.3f} ms/batch "
              f"({dt*1e3/B:6.3f} ms/frame)")

    # encode
    dt = delta_scan_time(
        lambda fr: jnp.sum(pallas_encode.encode_l1_pallas(
            fr, thr, out_size=out_size, bucket=bucket,
            interpret=False)[2]).astype(jnp.float32), frames_all)
    report("L1 encode (fused pallas)", dt)

    # bitpack
    dt = delta_scan_time(
        lambda c: jnp.sum(bitpack.bitpack_values(
            c.astype(jnp.uint32), 12).astype(jnp.int32)).astype(jnp.float32),
        comps)
    report("intensity bitpack (12b)", dt)

    # tokenize bm
    dt = delta_scan_time(
        lambda bm: jnp.sum(pdk.tokenize_pallas(
            bm, lens_bm0, interpret=False)[1]).astype(jnp.float32), bms)
    report("tokenize bm (2MB)", dt)

    # compact bm
    dt = delta_scan_time(
        lambda t: jnp.sum(pdk.compact_tokens(
            t, tok_bound, bucket=cbkt,
            interpret=False)[1]).astype(jnp.float32), tok_bms)
    report(f"compact bm (C1 bkt {cbkt})", dt)

    # fused tokenize+compact bm (the dyndeflate session default)
    fbkt = pdk.token_bucket_for(tok0 / n_bm)
    dt = delta_scan_time(
        lambda bm: jnp.sum(pdk.tokenize_compact_pallas(
            bm, lens_bm0, fbkt, tok_bound,
            interpret=False)[1]).astype(jnp.float32), bms)
    report(f"fused tok+compact bm (C1={pdk.TOKEN_BUCKETS[fbkt]})", dt)

    # assemble bm
    dt = delta_scan_time(
        lambda d: jnp.sum(pdk.assemble_pallas(
            d, *tab_bm, out_bm, nw=nw_bm,
            interpret=False)[1]).astype(jnp.float32), dense_bms)
    report(f"assemble bm (nw={nw_bm})", dt)

    # tokenize pk
    dt = delta_scan_time(
        lambda pk: jnp.sum(pdk.tokenize_pallas(
            pk, lens_pk0, interpret=False)[1]).astype(jnp.float32), pks)
    report(f"tokenize pk ({npad_pk//1024}KB pad)", dt)

    # assemble pk (direct, uncompacted)
    dt = delta_scan_time(
        lambda t: jnp.sum(pdk.assemble_pallas(
            t, *tab_pk, out_pk, nw=nw_pk,
            interpret=False)[1]).astype(jnp.float32), tok_pks)
    report(f"assemble pk direct (nw={nw_pk})", dt)


if __name__ == "__main__":
    main()
