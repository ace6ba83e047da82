#!/usr/bin/env python
"""Per-stage timing of the scheme-12 (symbol-mode rANS) e2e device chain.

Attributes tools/bench_e2e.py --scheme 12's ms/batch across stages with the
honest delta-scan method: fused L1 encode, intensity bit-pack, device
histogram and rANS encode for each stream, adler partials.

Usage: python tools/profile_rans_stages.py [--size 4096] [--batch 4]
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

    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import bitpack, pallas_encode, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time
    from tools.bench_e2e import _adler_partials

    size, B = args.size, args.batch
    n_px = size * size

    e = jax.random.exponential(jax.random.key(1), (args.scan, B, size, size))
    vals = jnp.minimum(1 + jnp.floor(6.0 * e), 4095).astype(jnp.int32)
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)

    bucket = 0 if args.occupancy <= 0.012 else (1 if args.occupancy <= 0.025
                                                else 2)
    out_size = 1 << (int(np.ceil(np.log2(n_px * args.occupancy * 2))))
    bm0, comp0, cnt0, _ = pallas_encode.encode_l1_pallas(
        frames_all[0], thr, out_size=out_size, bucket=bucket, interpret=False)
    n_bm = bm0.shape[1]
    npad_bm = -(-n_bm // prk.CH_R) * prk.CH_R
    npad_pk = -(-out_size // prk.CH_R) * prk.CH_R
    cnt0_np = int(np.asarray(cnt0)[0])
    m_bm = np.full((B,), n_bm, np.int32)

    bm_vals0 = jnp.pad(bm0[:1].astype(jnp.int32), ((0, 0), (0, npad_bm - n_bm)))
    pk_vals0 = jnp.pad(comp0[:1].astype(jnp.int32),
                       ((0, 0), (0, npad_pk - out_size)))
    hist_bm0 = np.asarray(prk.hist_symbols_pallas(
        bm_vals0, np.array([n_bm], np.int32), interpret=False))[0]
    hist_pk0 = np.asarray(prk.hist_symbols_pallas(
        pk_vals0, np.array([cnt0_np], np.int32), interpret=False))[0]
    freq_bm = rans.quantize_freqs(hist_bm0[:256].astype(np.int64))
    freq_pk = rans.quantize_freqs(hist_pk0.astype(np.int64))
    elut_bm = jnp.asarray(np.broadcast_to(
        prk.encode_luts_symbols8(freq_bm), (B, 8, 64)).copy())
    elut_pk = jnp.asarray(np.broadcast_to(
        prk.encode_luts_symbols(freq_pk), (B, 128, 64)).copy())
    g_bm = prk.ROWS_R if n_bm >= (1 << 21) else 1
    out_bound_bm = 2 * npad_bm + 4096
    out_bound_pk = 2 * npad_pk + 4096

    # stage inputs materialized once per scan step
    def chain(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values(comp.astype(jnp.uint32), 12)
        bm_vals = jnp.pad(bitmap.astype(jnp.int32),
                          ((0, 0), (0, npad_bm - n_bm)))
        pk_vals = jnp.pad(comp.astype(jnp.int32),
                          ((0, 0), (0, npad_pk - out_size)))
        return bitmap, comp, counts, packed, bm_vals, pk_vals

    outs = jax.jit(chain)(frames_all[0])
    bm_s = jnp.stack([outs[4]] * args.scan)
    pk_s = jnp.stack([outs[5]] * args.scan)
    cnt_s = jnp.stack([outs[2]] * args.scan)
    packed_s = jnp.stack([outs[3]] * args.scan)
    bitmap_s = jnp.stack([outs[0]] * args.scan)
    comp_s = jnp.stack([outs[1]] * args.scan)
    jax.block_until_ready((bm_s, pk_s, cnt_s, packed_s, bitmap_s, comp_s))

    stages = []

    def stage(name, fn, *xs):
        dt = delta_scan_time(fn, *xs)
        stages.append((name, dt))
        print(f"{name:40s} {dt*1e3:6.3f} ms/batch "
              f"({dt*1e3/B:6.3f} ms/frame)", flush=True)

    stage("L1 encode (fused pallas)",
          lambda fr: pallas_encode.encode_l1_pallas(
              fr, thr, out_size=out_size, bucket=bucket, interpret=False)[:2],
          frames_all)
    stage("L1 encode + packed positions (vbits=12)",
          lambda fr: pallas_encode.encode_l1_pallas(
              fr, thr, out_size=out_size, bucket=bucket, interpret=False,
              with_positions=True, pos_vbits=12)[:2],
          frames_all)
    stage("intensity bitpack (12b)",
          lambda c: bitpack.bitpack_values(c.astype(jnp.uint32), 12), comp_s)
    stage("hist bm (8-bit syms)",
          lambda v: prk.hist_symbols_pallas(v, m_bm, interpret=False), bm_s)
    stage(f"rANS encode bm (groups={g_bm})",
          lambda v: prk.rans_encode_symbols_pallas(
              v, elut_bm, m_bm, out_bound_bm, interpret=False,
              groups=g_bm)[2],
          bm_s)
    stage("hist pk (12-bit syms)",
          lambda xs: prk.hist_symbols_pallas(xs[0], xs[1], interpret=False),
          (pk_s, cnt_s))
    stage("rANS encode pk (groups=1)",
          lambda xs: prk.rans_encode_symbols_pallas(
              xs[0], elut_pk, xs[1], out_bound_pk, interpret=False,
              groups=1)[2],
          (pk_s, cnt_s))
    stage("adler partials (both streams)",
          lambda xs: _adler_partials(xs[0], jnp.full((B,), n_bm, jnp.int32))
          + _adler_partials(xs[1], (xs[2] * 12 + 7) // 8),
          (bitmap_s, packed_s, cnt_s))

    total = sum(dt for _, dt in stages)
    print(f"{'sum of stages':40s} {total*1e3:6.3f} ms/batch -> "
          f"{B*n_px*2/total/1e9:.2f} GB/s raw")

    # ---- GAP-mode bitmap stream stages (the writer default) ----
    from pyrecode_tpu.codecs import rans as _rans
    from pyrecode_tpu.ops import pallas_gaps as pgk

    npad_g = -(-out_size // prk.CH_R) * prk.CH_R
    out_bound_g = 2 * npad_g + 4096
    for pbucket in range(len(pallas_encode.CAPACITY_BUCKETS)):
        pos0, pcnt0, povf0 = pgk.bitmap_positions_pallas(
            outs[0], out_size, bucket=pbucket, interpret=False)
        if not bool(np.asarray(povf0).any()):
            break
    io_g = jnp.arange(out_size, dtype=jnp.int32)[None, :]

    def gaps_of(pos, pcnt):
        prev = jnp.concatenate(
            [jnp.full((pos.shape[0], 1), -1, jnp.int32), pos[:, :-1]],
            axis=1)
        g = jnp.where(io_g < pcnt[:, None], pos - prev - 1, 0)
        return jnp.minimum(g, 4094)

    gaps0 = gaps_of(pos0, pcnt0)
    gaps0p = jnp.pad(gaps0, ((0, 0), (0, npad_g - out_size)))
    hist_g0 = np.asarray(prk.hist_symbols_pallas(
        gaps0p, np.asarray(pcnt0, np.int32), interpret=False))[0]
    freq_g = _rans.quantize_freqs(hist_g0.astype(np.int64))
    elut_g = jnp.asarray(np.broadcast_to(
        prk.encode_luts_symbols(freq_g), (B, 128, 64)).copy())
    gaps_s = jnp.stack([gaps0p] * args.scan)
    pcnt_s = jnp.stack([jnp.asarray(pcnt0, jnp.int32)] * args.scan)
    jax.block_until_ready((gaps_s, pcnt_s))

    gstages = []

    def gstage(name, fn, *xs):
        dt = delta_scan_time(fn, *xs)
        gstages.append((name, dt))
        print(f"{name:40s} {dt*1e3:6.3f} ms/batch "
              f"({dt*1e3/B:6.3f} ms/frame)", flush=True)

    print("--- gap-mode bitmap stream (writer default) ---")
    gstage(f"bitmap->positions (bucket {pbucket})",
           lambda bm: pgk.bitmap_positions_pallas(
               bm, out_size, bucket=pbucket, interpret=False)[:2],
           bitmap_s)
    gstage("gaps from positions (XLA)",
           lambda xs: gaps_of(xs[0], xs[1]),
           (jnp.stack([pos0] * args.scan), pcnt_s))
    gstage("hist gaps (12-bit syms)",
           lambda xs: prk.hist_symbols_pallas(xs[0], xs[1],
                                              interpret=False),
           (gaps_s, pcnt_s))
    gstage("rANS encode gaps (groups=1)",
           lambda xs: prk.rans_encode_symbols_pallas(
               xs[0], elut_g, xs[1], out_bound_g, interpret=False,
               groups=1)[2],
           (gaps_s, pcnt_s))
    gtotal = sum(dt for _, dt in gstages)
    print(f"{'gap-mode bm stream total':40s} {gtotal*1e3:6.3f} ms/batch "
          f"(byte-mode bm stages above: hist+rANS)")


if __name__ == "__main__":
    main()
