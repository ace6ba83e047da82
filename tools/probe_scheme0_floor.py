#!/usr/bin/env python
"""Op-bound floor analysis of the SCHEME-0 (deflate) write chain (r5).

Companion to tools/probe_write_floor.py (which covers the scheme-12 gap
chain): measures every device stage of the realistic 4096^2 scheme-0
write at the production configuration (peaked residuals => dynamic-mode
pixval stream, fused tokenize+compact on the bitmap stream, sliced
assembly on the literal-dense pixval stream) and computes per-stage
vector/matrix op-count floors at v5e throughput, so the ">= 15 GB/s
serial" feasibility question is reproducible arithmetic.

v5e per-core throughput used for the floors:
  VPU: 8 sublanes x 128 lanes/cycle at 0.94 GHz  ~= 962 G lane-ops/s
  MXU: 128x128 MACs/cycle bf16                   ~= 197 T MAC/s

Floor arithmetic for the entropy stages (4-frame 4096^2 batch, 1%):

  pass A tokenize, per 16384-byte grid step ((8, 2048) tile):
    run-start prefix-max   11 log-shift stages x ~3 ops    ~0.54 M lane-ops
    run-end suffix-min     symmetric                        ~0.54 M
    token decision         ~15 ops/byte                     ~0.25 M
    histogram one-hots     48 rows x 16384 compares         ~0.79 M
    adler reduction        ~2 ops/byte                      ~0.03 M
    => ~134 lane-ops per BYTE of stream scanned.  The bitmap stream is
    2 MB/frame at ANY occupancy — per-byte machinery costs ~1.1 ms per
    8 MB batch even at the VPU roofline.  (The positions-driven
    tokenizer that would scale with foreground bytes was measured
    SLOWER: tools/probe_pairs_tokens.py, 3.50 vs 1.52 ms/batch — the
    per-byte scan's closed-form rules beat per-element slot machinery.)

  pass B assemble, per 4096-token grid step:
    LUT bilinear one-hots + scatter-plane construction      ~1.1 M
    stacked NT scatter matmul 128 x (4 x NW) x 4096         MXU-trivial
    => ~270 lane-ops/token; the serial window-store chain adds a
    per-step latency term the split-assembly experiment measured as
    NOT binding (assemble_pallas_split: neutral).

The conclusion printed at the bottom: with every stage at its op floor
and the measured encode/bitpack/host terms, the serial chain floor is
~9 ms/batch => ~14.5-15.5 GB/s is the ABSOLUTE ceiling of this
algorithm; the realistic achievable point (stages at their measured
percent-of-floor) is ~12-13 GB/s serial, and the writer's 1-batch
lookahead (host stage overlapped) is the supported route above that.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from pyrecode_tpu.profiling import enable_compile_cache, delta_scan_time

enable_compile_cache()

VPU_OPS = 962e9      # lane-ops/s
MXU_MAC = 197e12     # bf16 MAC/s


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

    size, B = args.size, args.batch
    n_px = size * size
    batch_bytes = B * n_px * 2

    # realistic peaked residuals (the distribution that makes the pixval
    # stream take DYNAMIC mode, like bench_e2e --dist peaked)
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    e = jax.random.exponential(jax.random.key(1), (args.scan, B, size, size))
    vals = jnp.minimum(1 + jnp.floor(6.0 * e), 4095).astype(jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)

    bucket = 0
    out_size = 1 << int(np.ceil(np.log2(n_px * args.occupancy * 2)))
    bm0, comp0, cnt0, _ = pallas_encode.encode_l1_pallas(
        frames_all[0], thr, out_size=out_size, bucket=bucket, interpret=False)
    pk0 = bitpack.bitpack_values_device(comp0, 12)
    n_bm = bm0.shape[1]
    npad_bm = -(-n_bm // pdk.CH_A) * pdk.CH_A
    n_pk = pk0.shape[1]
    npad_pk = -(-n_pk // pdk.CH_A) * pdk.CH_A
    plen0 = int((int(np.asarray(cnt0)[0]) * 12 + 7) // 8)

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
    tab_pk, nw_pk, tok_pk0 = tables_for(pk_pad0, plen0)

    tok_bound = dd.quantize_bound(int(tok0 * 1.02), pdk.CH_B)
    fbkt = pdk.token_bucket_for(tok0 / n_bm)
    out_bm = -(-(min(2 * npad_bm,
                     (tok_bound * pdk.MAX_TOKEN_BITS + 7) // 8) + 256)
               // 128) * 128
    pk_cols = min(npad_pk, dd.quantize_bound(int(plen0 * 1.1), pdk.CH_B))
    out_pk = -(-(2 * pk_cols + 256) // 128) * 128

    print(f"config: {B}x{size}^2 occ={args.occupancy} n_bm={n_bm} "
          f"plen~{plen0} tok_bm~{tok0} pk_cols={pk_cols} (pad {npad_pk})")

    # ---- measured stages (delta-scan, each on realistic inputs) ----
    def chain_once(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        pk = jnp.pad(packed, ((0, 0), (0, npad_pk - n_pk)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        dense_bm, hist_bm, ad_bm, dcnt, covf = pdk.tokenize_compact_pallas(
            bm, lens_bm, fbkt, tok_bound, interpret=False)
        lens_pk = ((counts * 12 + 7) // 8).astype(jnp.int32)
        tok_pk, hist_pk, ad_pk = pdk.tokenize_pallas(pk, lens_pk,
                                                     interpret=False)
        return bm, pk, dense_bm, tok_pk, comp, lens_pk

    outs = jax.jit(chain_once)(frames_all[0])
    bms = jnp.stack([outs[0]] * args.scan)
    pks = jnp.stack([outs[1]] * args.scan)
    dense_bms = jnp.stack([outs[2]] * args.scan)
    tok_pks = jnp.stack([outs[3]] * args.scan)
    comps = jnp.stack([outs[4]] * args.scan)
    lens_pk0 = outs[5]
    lens_bm0 = jnp.full((B,), n_bm, jnp.int32)
    jax.block_until_ready(tok_pks)

    meas = {}

    def stage(name, fn, xs):
        dt = delta_scan_time(fn, xs)
        meas[name] = dt
        print(f"  measured {name:34s}: {dt*1e3:6.2f} ms/batch")

    print("\nmeasured device stages:")
    stage("L1 encode", lambda fr: jnp.sum(pallas_encode.encode_l1_pallas(
        fr, thr, out_size=out_size, bucket=bucket,
        interpret=False)[2]).astype(jnp.float32), frames_all)
    stage("intensity bitpack", lambda c: jnp.sum(bitpack.bitpack_values(
        c.astype(jnp.uint32), 12).astype(jnp.int32)).astype(jnp.float32),
        comps)
    stage("fused tok+compact bm", lambda bm: jnp.sum(
        pdk.tokenize_compact_pallas(bm, lens_bm0, fbkt, tok_bound,
                                    interpret=False)[1]).astype(jnp.float32),
        bms)
    stage("assemble bm", lambda d: jnp.sum(pdk.assemble_pallas(
        d, *tab_bm, out_bm, nw=nw_bm,
        interpret=False)[1]).astype(jnp.float32), dense_bms)
    stage("tokenize pk", lambda pk: jnp.sum(pdk.tokenize_pallas(
        pk, lens_pk0, interpret=False)[1]).astype(jnp.float32), pks)
    stage("assemble pk (sliced)", lambda t: jnp.sum(pdk.assemble_pallas(
        t[:, :pk_cols], *tab_pk, out_pk, nw=nw_pk,
        interpret=False)[1]).astype(jnp.float32), tok_pks)

    # host stage per frame (tables x2 + record assembly)
    reps = 50
    cbm = native.deflate_sparse(np.asarray(bm0[0]).tobytes())
    raw_pk = np.asarray(pk0[0, :plen0]).tobytes()
    cpx = native.deflate_sparse(raw_pk)
    lfreq = np.zeros(286, np.uint32)
    lfreq[:256] = 50
    lfreq[256] = 1
    t0 = time.perf_counter()
    for _ in range(reps):
        for _ in range(2):
            llen, lcode = native.dyn_tables(lfreq)
            hb, hbits = native.dyn_header(llen)
            dd.luts_as_radix(llen, lcode)
        rec = (b"\x00" * 4 + len(cbm).to_bytes(4, "little")
               + len(cpx).to_bytes(4, "little") + plen0.to_bytes(4, "little")
               + cbm + cpx)
        del rec
    dt_host = (time.perf_counter() - t0) / reps
    print(f"  measured {'host (tables x2 + record)':34s}: "
          f"{dt_host*B*1e3:6.2f} ms/batch ({dt_host*1e3:.2f} ms/frame)")

    # ---- op-count floors for the entropy stages ----
    def tokenize_floor(nbytes):
        steps = nbytes / pdk.CH_A
        per_step = (2 * 11 * 3 * pdk.CH_A      # prefix-max + suffix-min scans
                    + 15 * pdk.CH_A            # token decision
                    + 48 * pdk.CH_A            # histogram one-hot rows
                    + 2 * pdk.CH_A)            # adler
        return steps * per_step / VPU_OPS

    def assemble_floor(ntok, nw):
        steps = ntok / pdk.CH_B
        per_step_vpu = 270 * pdk.CH_B          # LUT one-hots + plane build
        per_step_mxu = 128 * (4 * nw * 128) * (pdk.CH_B / 128)
        return steps * (per_step_vpu / VPU_OPS + per_step_mxu / MXU_MAC)

    fl = {
        "L1 encode (probe_write_floor, plain)": 4.1e-3 * batch_bytes
        / (4 * 4096 * 4096 * 2),
        "intensity bitpack (measured: thin)": meas["intensity bitpack"],
        "tokenize bm (134 ops/byte)": B * tokenize_floor(npad_bm),
        "assemble bm (270 ops/token)": B * assemble_floor(tok_bound, nw_bm),
        "tokenize pk (134 ops/byte)": B * tokenize_floor(npad_pk),
        "assemble pk (270 ops/token)": B * assemble_floor(pk_cols, nw_pk),
        "host stage (measured)": dt_host * B,
    }
    print("\nper-stage floors (op-count at v5e roofline):")
    tot = 0.0
    for k, v in fl.items():
        tot += v
        print(f"  {k:42s}: {v*1e3:6.2f} ms/batch")
    print(f"  {'serial chain floor TOTAL':42s}: {tot*1e3:6.2f} ms/batch = "
          f"{batch_bytes / tot / 1e9:.1f} GB/s ceiling")

    dev_meas = sum(meas.values())
    serial_meas = dev_meas + dt_host * B
    print(f"\nmeasured serial chain: {serial_meas*1e3:.2f} ms/batch = "
          f"{batch_bytes / serial_meas / 1e9:.1f} GB/s "
          f"({100 * tot / serial_meas:.0f}% of floor)")
    need = batch_bytes / 15e9
    print(f">= 15 GB/s serial needs {need*1e3:.2f} ms/batch -> "
          f"{'FEASIBLE only with every stage at its op floor' if need >= tot else 'OP-BOUND INFEASIBLE'}"
          " for this algorithm")
    print("conclusion: the bitmap stream's per-byte tokenize (2 MB/frame at "
          "any occupancy) and the dense-lane encode selection are the "
          "binding terms; the positions-driven tokenizer that would scale "
          "with occupancy measured slower (probe_pairs_tokens).  The "
          "writer's lookahead pipelining (host overlapped) is the supported "
          "route above the serial number.")


if __name__ == "__main__":
    main()
