"""Relay-independent end-to-end write throughput at 4096^2.

Measures what the production pipeline would sustain with co-located
host+TPU, excluding this environment's network relay:

* **device chain** — ONE jitted lax.scan whose body runs the full per-batch
  device work: fused L1 encode -> intensity bit-pack -> deflate tokenize
  (histogram+adler) -> deflate bitstream assembly for BOTH streams.  Huffman
  tables are precomputed from a representative frame (the host table step is
  ~0.6 ms/stream, measured and added separately); only a scalar checksum is
  read back.
* **host stage** — per-frame table build + record assembly (byte concat)
  measured on this host with real compressed sizes.

The reported metric divides RAW frame bytes (the detector's data rate) by
the summed per-frame time — the number comparable to the reference's writer
hot loop (recode_writer.py:383-428), which runs its entropy stage on host
CPU at ~0.1 GB/s/thread.

Usage: python tools/bench_e2e.py [--size 4096] [--batch 4] [--occupancy 0.01]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pyrecode_tpu.profiling import enable_compile_cache

enable_compile_cache()


def _adler_partials(packed, lens):
    """Device half of codecs.rans._adler32_device_chunks: per-2048-byte
    partial (s1, s2) sums mod 65521; the host combine is O(n_chunks)."""
    B, NB = packed.shape
    CH = 2048
    pad = (-NB) % CH
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        NB += pad
    nch = NB // CH
    d = packed.reshape(B, nch, CH).astype(jnp.int32)
    gidx = jnp.arange(nch)[:, None] * CH + jnp.arange(CH)[None, :]
    d = jnp.where(gidx[None] < jnp.asarray(lens, jnp.int32)[:, None, None],
                  d, 0)
    jloc = jnp.arange(CH, dtype=jnp.int32)[None, None, :]
    return jnp.sum(d, axis=2) % 65521, jnp.sum(d * jloc, axis=2) % 65521


def run_scheme12(args, frames_all, thr, bucket, out_size, bm0, comp0, cnt0,
                 pk0):
    """End-to-end write with the scheme-12 SYMBOL-MODE rANS entropy stage.

    Both streams are device-coded order-0 (bitmap bytes as 8-bit symbols,
    residual values directly as 12-bit symbols — no LZ pass, no bitstream
    assembly scatter): fused L1 encode -> bit-pack -> device histogram ->
    device interleaved-rANS encode + device adler partials, one jitted
    lax.scan.  The host does O(alphabet) frequency quantization, LUT build,
    adler combine and header/record assembly per frame (timed separately,
    mirroring codecs.rans.rans_symbols_batch_device's split)."""
    import time
    import zlib

    from pyrecode_tpu.codecs import rans
    from pyrecode_tpu.ops import bitpack, pallas_encode, pallas_rans as prk
    from pyrecode_tpu.profiling import delta_scan_time

    size, B = args.size, args.batch
    n_px = size * size
    raw_bytes = B * n_px * 2
    n_bm = bm0.shape[1]
    npad_bm = -(-n_bm // prk.CH_R) * prk.CH_R
    npad_pk = -(-out_size // prk.CH_R) * prk.CH_R
    cnt0_np = int(np.asarray(cnt0)[0])
    plen0 = (cnt0_np * 12 + 7) // 8

    # representative tables from frame 0 (production rebuilds these per
    # frame from the device histogram; that host cost is timed below)
    m_bm = np.full((B,), n_bm, np.int32)
    bm_vals0 = jnp.pad(bm0[:1].astype(jnp.int32),
                       ((0, 0), (0, npad_bm - n_bm)))
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
    # interleave-width rule of rans_symbols_batch_device
    g_bm = prk.ROWS_R if n_bm >= (1 << 21) else 1
    g_pk = prk.ROWS_R if cnt0_np >= (1 << 21) else 1
    out_bound_bm = 2 * npad_bm + 4096
    out_bound_pk = 2 * npad_pk + 4096

    # GAP-mode bitmap stream (writer default for scheme 12): set-bit
    # positions -> first-order gaps -> 12-bit-symbol rANS — one symbol per
    # SET BIT instead of one per byte (~12.5x fewer at 1% occupancy), so
    # the serial rANS chain almost vanishes from the bitmap stream's cost.
    gap_mode = getattr(args, "bm_mode", "gap") == "gap"
    if gap_mode:
        from pyrecode_tpu.ops import pallas_gaps as pgk

        npad_g = -(-out_size // prk.CH_R) * prk.CH_R
        out_bound_g = 2 * npad_g + 4096
        # representative gap tables + positions bucket from frame 0
        for pbucket in range(len(pallas_encode.CAPACITY_BUCKETS)):
            pos0, pcnt0, povf0 = pgk.bitmap_positions_pallas(
                bm0[:1], out_size, bucket=pbucket, interpret=False)
            if not bool(np.asarray(povf0).any()):
                break
        io_g = jnp.arange(out_size, dtype=jnp.int32)[None, :]
        prev0 = jnp.concatenate(
            [jnp.full((1, 1), -1, jnp.int32), pos0[:, :-1]], axis=1)
        gaps0 = jnp.where(io_g < pcnt0[:, None], pos0 - prev0 - 1, 0)
        gaps0 = jnp.minimum(gaps0, 4094)
        gaps0p = jnp.pad(gaps0, ((0, 0), (0, npad_g - out_size)))
        hist_g0 = np.asarray(prk.hist_symbols_pallas(
            gaps0p, np.asarray(pcnt0, np.int32), interpret=False))[0]
        freq_g = rans.quantize_freqs(hist_g0.astype(np.int64))
        elut_g = jnp.asarray(np.broadcast_to(
            prk.encode_luts_symbols(freq_g), (B, 128, 64)).copy())

    def device_batch(frames):
        if gap_mode:
            # fused: the L1 kernel emits the rank-aligned global-position
            # stream alongside the values (one shared mask/cumsum/select
            # pass instead of re-expanding the bitmap in a second kernel)
            bitmap, comp, counts, ovf, pos = pallas_encode.encode_l1_pallas(
                frames, thr, out_size=out_size, bucket=bucket,
                interpret=False, with_positions=True, pos_vbits=12)
        else:
            bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
                frames, thr, out_size=out_size, bucket=bucket,
                interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        plens = ((counts * 12 + 7) // 8).astype(jnp.int32)
        pk_vals = jnp.pad(comp.astype(jnp.int32),
                          ((0, 0), (0, npad_pk - out_size)))
        if gap_mode:
            pcnt = counts
            prev = jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), pos[:, :-1]], axis=1)
            gaps = jnp.where(io_g < pcnt[:, None], pos - prev - 1, 0)
            gaps = jnp.minimum(gaps, 4094)
            bm_vals = jnp.pad(gaps, ((0, 0), (0, npad_g - out_size)))
            hist_bm = prk.hist_symbols_pallas(bm_vals, pcnt,
                                              interpret=False)
            body_bm, st_bm, cnt_bm = prk.rans_encode_symbols_pallas(
                bm_vals, elut_g, pcnt, out_bound_g, interpret=False,
                groups=1)
        else:
            bm_vals = jnp.pad(bitmap.astype(jnp.int32),
                              ((0, 0), (0, npad_bm - n_bm)))
            hist_bm = prk.hist_symbols_pallas(bm_vals, m_bm,
                                              interpret=False)
            body_bm, st_bm, cnt_bm = prk.rans_encode_symbols_pallas(
                bm_vals, elut_bm, m_bm, out_bound_bm, interpret=False,
                groups=g_bm)
        hist_pk = prk.hist_symbols_pallas(pk_vals, counts, interpret=False)
        body_pk, st_pk, cnt_pk = prk.rans_encode_symbols_pallas(
            pk_vals, elut_pk, counts, out_bound_pk, interpret=False,
            groups=g_pk)
        s1b, s2b = _adler_partials(bitmap, jnp.full((B,), n_bm, jnp.int32))
        s1p, s2p = _adler_partials(packed, plens)
        return (jnp.sum(cnt_bm) + jnp.sum(cnt_pk)
                + jnp.sum(st_bm[:, :1]) + jnp.sum(st_pk[:, :1])
                + jnp.sum(hist_bm[:, :1]) + jnp.sum(hist_pk[:, :1])
                + jnp.sum(s1b[:, :1]) + jnp.sum(s1p[:, :1])
                + jnp.sum(s2b[:, :1]) + jnp.sum(s2p[:, :1])
                + jnp.sum(counts)).astype(jnp.float32)

    dt_dev = delta_scan_time(device_batch, frames_all)
    dev_gbps = raw_bytes / dt_dev / 1e9
    print(f"device chain (encode+pack+rANS both streams): "
          f"{dt_dev*1e3:.2f} ms/{B}-frame batch -> {dev_gbps:.2f} GB/s raw")

    # ---- host stage per frame: quantize + LUT x2, adler combine, header +
    # record assembly with real frame-0 compressed bodies ----
    cbm12 = rans.compress_symbols(np.asarray(bm0[0]).tobytes(), 8)
    raw_pk = np.asarray(pk0[0, :plen0]).tobytes()
    cpx12 = rans.compress_symbols(raw_pk, 12)
    nch_bm = -(-n_bm // 2048)
    nch_pk = -(-plen0 // 2048)
    s1 = np.ones(max(nch_bm, nch_pk), np.int64)
    s2 = np.ones(max(nch_bm, nch_pk), np.int64)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        for hist, bits in ((hist_bm0[:256], 8), (hist_pk0, 12)):
            fr = rans.quantize_freqs(hist.astype(np.int64))
            (prk.encode_luts_symbols8 if bits == 8
             else prk.encode_luts_symbols)(fr)
        for nch, n in ((nch_bm, n_bm), (nch_pk, plen0)):
            a = (1 + int(s1[:nch].sum())) % 65521
            base = np.arange(nch, dtype=np.int64) * 2048
            bacc = n + int(((n - base) * s1[:nch] - s2[:nch]).sum())
            _ = ((bacc % 65521) << 16) | a
        rec = (b"\x00" * 4 + len(cbm12).to_bytes(4, "little")
               + len(cpx12).to_bytes(4, "little")
               + plen0.to_bytes(4, "little") + cbm12 + cpx12)
        del rec
    dt_host = (time.perf_counter() - t0) / reps
    print(f"host stage (quantize+LUT x2 + adler combine + record): "
          f"{dt_host*1e3:.2f} ms/frame")

    per_frame = dt_dev / B + dt_host
    total_gbps = (n_px * 2) / per_frame / 1e9
    suffix = " realistic" if args.dist == "peaked" else ""
    if gap_mode:
        suffix += " gap-bm"
    # the production writer overlaps the host stage with the NEXT batch's
    # device encode (writer.py 1-batch lookahead), so its steady state is
    # max(device, host) per frame — report both, serial first
    pipe_frame = max(dt_dev / B, dt_host)
    pipe_gbps = (n_px * 2) / pipe_frame / 1e9
    print(f'pipelined writer (host stage overlapped, writer.py lookahead): '
          f'{pipe_gbps:.2f} GB/s')
    print(f'{{"metric": "end-to-end write (relay-independent) {size}^2'
          f'{suffix} scheme12", "value": {total_gbps:.2f}, "unit": "GB/s"}}')

    # ---- compression ratio vs the reference's host codecs on frame 0 ----
    ours = len(cbm12) + len(cpx12)
    z1 = len(zlib.compress(np.asarray(bm0[0]).tobytes(), 1)) + \
        len(zlib.compress(raw_pk, 1))
    report = {"ours_bytes": ours, "zlib1_bytes": z1,
              "ratio_vs_raw": round(n_px * 2 / ours, 2)}
    try:
        import zstandard

        cctx = zstandard.ZstdCompressor(level=1, write_content_size=False)
        report["zstd1_bytes"] = len(cctx.compress(
            np.asarray(bm0[0]).tobytes())) + len(cctx.compress(raw_pk))
    except ImportError:
        pass
    print("compressed size frame 0:", report)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--occupancy", type=float, default=0.01)
    ap.add_argument("--scan", type=int, default=12)
    ap.add_argument("--two-pass", action="store_true",
                    help="separate tokenize+compact instead of the fused "
                         "default")
    ap.add_argument("--dist", choices=("uniform", "peaked"), default="uniform",
                    help="foreground residual distribution: 'peaked' = "
                         "exponential single-electron residuals (realistic; "
                         "pixval stream becomes entropy-codable), 'uniform' "
                         "= full-range (incompressible pixvals, stored path)")
    ap.add_argument("--scale", type=float, default=6.0,
                    help="exponential scale for --dist peaked")
    ap.add_argument("--bm-mode", choices=("gap", "byte"), default="gap",
                    help="scheme-12 bitmap stream coding: 'gap' = set-bit "
                         "gaps as 12-bit symbols (writer default, "
                         "~1/occupancy fewer rANS symbols), 'byte' = bitmap "
                         "bytes as 8-bit symbols")
    ap.add_argument("--scheme", type=int, choices=(1, 12), default=1,
                    help="entropy stage: 1 = device dynamic-Huffman deflate "
                         "(zlib-compatible), 12 = device symbol-mode rANS "
                         "(order-0, both streams fully device-coded)")
    args = ap.parse_args()

    from pyrecode_tpu import native
    from pyrecode_tpu.codecs import dyndeflate as dd
    from pyrecode_tpu.ops import bitpack, pallas_deflate as pdk, pallas_encode

    size, B = args.size, args.batch
    n_px = size * size
    raw_bytes = B * n_px * 2

    # device-generated sparse fixtures (distinct per scan step)
    u = jax.random.uniform(jax.random.key(0), (args.scan, B, size, size))
    if args.dist == "peaked":
        e = jax.random.exponential(jax.random.key(1),
                                   (args.scan, B, size, size))
        vals = jnp.minimum(1 + jnp.floor(args.scale * e), 4095).astype(jnp.int32)
    else:
        vals = jax.random.randint(jax.random.key(1),
                                  (args.scan, B, size, size), 1, 4096,
                                  jnp.int32)
    frames_all = jnp.where(u < args.occupancy, vals, 0).astype(jnp.uint16)
    jax.block_until_ready(frames_all)
    thr = jnp.zeros((size, size), jnp.uint16)

    # representative tables from frame 0's streams (production refreshes
    # them per frame between the two passes; the table build itself is timed
    # below and added to the budget)
    # capacity bucket like the production writer picks for this occupancy
    # (bench.py uses the same rule); rank-match cost scales with C1, so
    # oversizing the bucket is a real slowdown, not just wasted capacity
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

    if args.scheme == 12:
        run_scheme12(args, frames_all, thr, bucket, out_size, bm0, comp0,
                     cnt0, pk0)
        return

    from pyrecode_tpu.codecs.dyndeflate import LEN_EXTRA

    def tables_for(stream_row, n):
        _, hist, _ = pdk.tokenize_pallas(stream_row, np.array([n], np.int32),
                                         interpret=False)
        lfreq = np.asarray(hist)[0, :286].astype(np.uint32).copy()
        lfreq[256] += 1
        llen, lcode = native.dyn_tables(lfreq)
        hb, hbits = native.dyn_header(llen)
        lutab = dd.luts_as_radix(llen, lcode)
        # narrow scatter-window preset from exact body bits (same choice
        # dyndeflate's host step makes per frame from the histogram)
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

    # stored-vs-dynamic decision for the pixval stream, same EXACT rule as
    # dyndeflate.deflate_batch_device: high-entropy packed intensities take
    # RFC1951 stored blocks (smaller output, no assembly kernel) — the
    # per-frame histogram/adler still runs on device (tokenize pass)
    def dyn_final_len(stream_row, n):
        _, hist, _ = pdk.tokenize_pallas(stream_row, np.array([n], np.int32),
                                         interpret=False)
        lfreq = np.asarray(hist)[0, :286].astype(np.uint32).copy()
        lfreq[256] += 1
        llen, lcode = native.dyn_tables(lfreq)
        hb, hbits = native.dyn_header(llen)
        f = np.asarray(hist)[0, :286].astype(np.int64)
        sb = llen[:286].astype(np.int64).copy()
        sb[257:286] += LEN_EXTRA[: 286 - 257].astype(np.int64) + 1
        bits2 = hbits % 8 + int((f * sb).sum()) + int(llen[256])
        return hbits // 8 + (bits2 + 7) // 8

    pk_stored = dyn_final_len(pk_pad0, plen0) > \
        2 + plen0 + 5 * (plen0 // 65535 + 1)
    print(f"pixval stream mode: {'stored blocks' if pk_stored else 'dynamic'}")

    # dynamic pixval assembly: literal-dense tokens all sit below the stream
    # length, so the assembly grid runs over a length-bound SLICE of the
    # token stream, not the full capacity pad (deflate_batch_device does the
    # same; 786K -> 256K slots per frame at 1% occupancy)
    pk_cols = min(npad_pk, dd.quantize_bound(int(plen0 * 1.1), pdk.CH_B))
    out_pk = -(-(2 * pk_cols + 256) // 128) * 128

    # bitmap stream: token-compact before assembly — the production path
    # (bound quantized from frame 0's histogram, dyndeflate.quantize_bound).
    # Default = the FUSED tokenize+compact kernel (dyndeflate's session
    # default once the density hint is seeded); --two-pass measures the
    # separate tokenize -> compact chain instead.
    tok_bound = dd.quantize_bound(int(tok0 * 1.02), pdk.CH_B)
    cbkt = pdk.compact_bucket_for(tok0 / n_bm)
    fbkt = pdk.token_bucket_for(tok0 / n_bm)
    out_bm = -(-(min(2 * npad_bm,
                     (tok_bound * pdk.MAX_TOKEN_BITS + 7) // 8) + 256)
               // 128) * 128

    def device_batch(frames):
        bitmap, comp, counts, ovf = pallas_encode.encode_l1_pallas(
            frames, thr, out_size=out_size, bucket=bucket, interpret=False)
        packed = bitpack.bitpack_values_device(comp, 12)
        bm = jnp.pad(bitmap, ((0, 0), (0, npad_bm - n_bm)))
        pk = jnp.pad(packed, ((0, 0), (0, npad_pk - n_pk)))
        lens_bm = jnp.full((B,), n_bm, jnp.int32)
        lens_pk = ((counts * 12 + 7) // 8).astype(jnp.int32)

        if args.two_pass:
            tok_bm, hist_bm, ad_bm = pdk.tokenize_pallas(bm, lens_bm,
                                                         interpret=False)
            dense_bm, dcnt, covf = pdk.compact_tokens(
                tok_bm, tok_bound, bucket=cbkt, interpret=False)
        else:
            dense_bm, hist_bm, ad_bm, dcnt, covf = \
                pdk.tokenize_compact_pallas(bm, lens_bm, fbkt, tok_bound,
                                            interpret=False)
        body_bm, bits_bm, _ = pdk.assemble_pallas(dense_bm, *tab_bm,
                                                  out_bm, nw=nw_bm,
                                                  interpret=False)
        tok_pk, hist_pk, ad_pk = pdk.tokenize_pallas(pk, lens_pk,
                                                     interpret=False)
        if pk_stored:
            bits_pk = jnp.zeros((), jnp.int32)  # stored: no assembly pass
        else:
            body_pk, bits_pk, _ = pdk.assemble_pallas(tok_pk[:, :pk_cols],
                                                      *tab_pk,
                                                      out_pk, nw=nw_pk,
                                                      interpret=False)
        return (jnp.sum(bits_bm) + jnp.sum(bits_pk)
                + jnp.sum(ad_bm.astype(jnp.uint32)).astype(jnp.int32)
                + jnp.sum(ad_pk.astype(jnp.uint32)).astype(jnp.int32)
                + jnp.sum(covf.astype(jnp.int32))
                + jnp.sum(hist_pk) + jnp.sum(counts)).astype(jnp.float32)

    from pyrecode_tpu.profiling import delta_scan_time

    dt_dev = delta_scan_time(device_batch, frames_all)
    dev_gbps = raw_bytes / dt_dev / 1e9
    print(f"device chain (encode+pack+deflate both streams): "
          f"{dt_dev*1e3:.2f} ms/{B}-frame batch -> {dev_gbps:.2f} GB/s raw")

    # ---- host stage: table build x2 + record assembly per frame (and the
    # stored-block splice when the pixval stream takes that path) ----
    reps = 20
    cbm = native.deflate_sparse(np.asarray(bm0[0]).tobytes())
    raw_pk = np.asarray(pk0[0, :plen0]).tobytes()
    cpx = native.deflate_sparse(raw_pk)
    t0 = time.perf_counter()
    for _ in range(reps):
        lfreq = np.zeros(286, np.uint32)
        lfreq[0] = 100
        lfreq[256] = 1
        for _ in range(2):  # two streams per frame
            llen, lcode = native.dyn_tables(lfreq)
            hb, hbits = native.dyn_header(llen)
            dd.luts_as_radix(llen, lcode)
        if pk_stored:
            cpx = dd.stored_blocks(raw_pk, plen0) + b"\x00\x00\x00\x00"
        rec = (b"\x00" * 4 + len(cbm).to_bytes(4, "little")
               + len(cpx).to_bytes(4, "little") + plen0.to_bytes(4, "little")
               + cbm + cpx)
        del rec
    dt_host = (time.perf_counter() - t0) / reps
    print(f"host stage (tables x2 + record assembly"
          f"{' + stored splice' if pk_stored else ''}): "
          f"{dt_host*1e3:.2f} ms/frame")

    per_frame = dt_dev / B + dt_host
    total_gbps = (n_px * 2) / per_frame / 1e9
    suffix = " realistic" if args.dist == "peaked" else ""
    pipe_frame = max(dt_dev / B, dt_host)
    print(f'pipelined writer (host stage overlapped, writer.py lookahead): '
          f'{(n_px * 2) / pipe_frame / 1e9:.2f} GB/s')
    print(f'{{"metric": "end-to-end write (relay-independent) {size}^2'
          f'{suffix}", "value": {total_gbps:.2f}, "unit": "GB/s"}}')

    # ---- compression ratio vs the reference's host codecs on frame 0 ----
    import zlib

    raw_reduced = np.asarray(bm0[0]).tobytes() + raw_pk
    ours = len(cbm) + len(cpx)
    z1 = len(zlib.compress(np.asarray(bm0[0]).tobytes(), 1)) + \
        len(zlib.compress(raw_pk, 1))
    report = {"ours_bytes": ours, "zlib1_bytes": z1,
              "ratio_vs_raw": round(n_px * 2 / ours, 2),
              "pixval_mode": "stored" if pk_stored else "dynamic"}
    try:
        import zstandard

        cctx = zstandard.ZstdCompressor(level=1, write_content_size=False)
        report["zstd1_bytes"] = len(cctx.compress(
            np.asarray(bm0[0]).tobytes())) + len(cctx.compress(raw_pk))
    except ImportError:
        pass
    print("compressed size frame 0:", report)


if __name__ == "__main__":
    main()
