"""Fused Pallas TPU kernel for L2/L4 encode (connected components + stats).

Replaces the XLA path (iterative reduce_window labeling + segment scatters,
~0.08 GB/s at 512^2 — the gathers/scatters serialize) with a chunk-local
design that exploits the physics: electron puddles are a few pixels across.

Per chunk of RPC image rows, with a K-row halo taken from the neighboring
row-blocks (three clamped input views of the same array — Pallas blocks
cannot overlap):

* inputs arrive pre-halo'd: an XLA gather materialises (B, n_chunks, R, W)
  row windows (R = RPC + 2K, edge rows clamped and later masked), so the
  kernel reads each chunk once instead of assembling halos from three
  block views with selection matmuls.
* labels: 8-connected min-propagation of the in-halo linear index, K
  statically-unrolled iterations of a SEPARABLE 3x3 box-min (horizontal
  min then vertical min -- 4 ``pltpu.roll`` ops per iteration instead of
  8).  One extra iteration detects non-convergence; a Chebyshev bound
  check detects converged puddles wider than the stats window; either
  flags overflow -> the caller escalates K or falls back to XLA.
* roots: a pixel whose converged label equals its own index is its puddle's
  first pixel in raster order, so per-chunk root order concatenated across
  chunks reproduces scipy.ndimage.label's global label order exactly.
* stats/centroids: every window gather exploits that "pixel q belongs to
  the root at p" iff q's OWN displacement-from-root equals the window
  offset p-q.  Each pixel packs (displacement code << 16 | raw value)
  into one int32 key; a window tap is then ONE lane/sublane roll plus a
  compare against a per-offset constant -- no label compares, no second
  value roll.  Because the root is its puddle's topmost pixel (leftmost
  in the top row), offsets are restricted to dr in [0..K] (dc in [0..K]
  on the root's own row), nearly halving the taps.
* centroids (L4) accumulate (wsum, sum dr*w, sum dc*w) relative to the
  root and divide with the same round-half-even semantics as the
  oracle via a base+offset form that cannot overflow int32; the centroid
  bitmap is rasterised by comparing rolled centroid linear indices
  against each pixel's own linear index (one roll + compare per tap).
* per-puddle outputs are appended to a per-frame stream with the same
  compaction/aligned-store machinery as the L1 kernel (pallas_encode).

Byte-identical to oracle.reduce_frame for L2 (both stats) and L4
(weighted_average / unweighted / max schemes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode import (_compact_chunk, _store_window, make_lti_matrix,
                            make_pack_matrix)

_BIG = 1 << 30  # plain int: jnp scalars would be captured as kernel constants

# halo sizes to escalate through (puddle geodesic radius bound).  K=3 is
# overflow-free on the 1%-uniform bench fixture (tools/probe_label_k.py,
# 0/256 frames) and 17-37% faster than K=4 (L2 14.26 vs 10.62 GB/s, L4
# 6.91 vs 5.80 at 512^2); K=2 is faster still but overflows 9% of frames,
# which at per-batch escalation re-runs nearly every batch.  Electron
# puddles are a few px across, so real data sits even safer inside K=3.
HALO_BUCKETS = (3, 8)


def _roll_rows(x, down: int, fill):
    """Shift rows down by ``down`` (may be negative) with ``fill`` at edges."""
    R = x.shape[0]
    shifted = pltpu.roll(x, down % R, axis=0)
    r_io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if down > 0:
        return jnp.where(r_io < down, fill, shifted)
    if down < 0:
        return jnp.where(r_io >= R + down, fill, shifted)
    return x


def _roll_lanes(x, right: int, fill):
    """Shift lanes right by ``right`` (may be negative) with ``fill`` at edges."""
    Wd = x.shape[1]
    shifted = pltpu.roll(x, right % Wd, axis=1)
    c_io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if right > 0:
        return jnp.where(c_io < right, fill, shifted)
    if right < 0:
        return jnp.where(c_io >= Wd + right, fill, shifted)
    return x


def _box3_min(x, fill):
    """Min over the 3x3 neighbourhood, separably (4 rolls instead of 8)."""
    h = jnp.minimum(x, jnp.minimum(_roll_lanes(x, 1, fill),
                                   _roll_lanes(x, -1, fill)))
    return jnp.minimum(h, jnp.minimum(_roll_rows(h, 1, fill),
                                      _roll_rows(h, -1, fill)))


@functools.lru_cache(maxsize=64)
def _build_l2l4_kernel(B, H, W, OUT, RPC, K, SUB, C1, mode, bit_depth, interpret):
    """mode: 'l2max' | 'l2sum' | 'l4w' | 'l4u' | 'l4m'."""
    assert RPC >= K
    R = RPC + 2 * K
    n_chunks = H // RPC
    S = RPC * W // SUB
    C2 = S * C1
    WIN = C2 + 128
    is_l4 = mode.startswith("l4")
    with_stats = not is_l4
    # L2 sums saturate at the declared bit depth, matching
    # oracle.reduce_frame (which clamps before bit-packing so large puddle
    # sums don't silently truncate); hw-gated at 4096^2 for BOTH
    # statistics since round 5 (tools/verify_hw.py)
    stat_limit = (1 << bit_depth) - 1
    D = 2 * K + 1            # displacement-code row stride

    def taps():
        """(dr, dc) root->member window offsets, member raster order.

        The root is its puddle's raster-first pixel: topmost, and leftmost
        within its top row, so members lie at dr in [0..K] with dc >= 1
        when dr == 0."""
        out = [(0, dc) for dc in range(1, K + 1)]
        for dr in range(1, K + 1):
            out.extend((dr, dc) for dc in range(-K, K + 1))
        return out

    def kernel(x_ref, t_ref, pack_ref, selk_ref, lti_ref,
               bitmap_ref, comp_ref, count_ref, ovf_ref,
               off_sref, tail_ref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            comp_ref[...] = jnp.zeros_like(comp_ref)
            tail_ref[...] = jnp.zeros_like(tail_ref)

        xh = x_ref[0, 0].astype(jnp.int32)          # (R, W) pre-halo'd
        th = t_ref[0].astype(jnp.int32)

        r_io = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        global_row = h * RPC - K + r_io
        valid = (global_row >= 0) & (global_row < H)
        mask = (xh > th) & valid
        # stats/centroid weights use RAW values (reference recode_writer.py:446
        # and converters.py:168 pass the frame, not the residual)
        val = jnp.where(mask, xh, 0)

        # ---- label propagation: separable 3x3 box-min, K iterations ----
        # (geodesic eccentricity of the root <= K within the bucket's bound;
        # anything slower is caught by the convergence check below)
        lin = r_io * W + c_io
        lbl = jnp.where(mask, lin, _BIG)
        for _ in range(K):
            lbl = jnp.where(mask, _box3_min(lbl, _BIG), _BIG)

        # one extra iteration: any change means labels had not converged
        lbl_extra = jnp.where(mask, _box3_min(lbl, _BIG), _BIG)
        ovf_halo = jnp.sum((lbl_extra != lbl).astype(jnp.int32)) > 0

        in_chunk = (r_io >= K) & (r_io < K + RPC) & valid
        is_root = mask & (lbl == lin) & in_chunk

        root_row = lbl // W
        root_col = lbl - root_row * W
        dr_p = r_io - root_row        # displacement from root (>= 0)
        dc_p = c_io - root_col
        root_in_chunk = (root_row >= K) & (root_row < K + RPC)

        # a foreground pixel on the halo boundary whose root lies in this
        # chunk means the puddle may extend beyond the halo: its stats would
        # be silently truncated -> flag overflow (escalate K)
        at_boundary = (r_io == 0) | (r_io == R - 1)
        ovf_halo = ovf_halo | (jnp.sum(
            (mask & at_boundary & root_in_chunk).astype(jnp.int32)) > 0)

        # the stats/centroid windows only reach CHEBYSHEV distance K from
        # the root.  Label convergence alone does not guarantee that bound:
        # a straight-line puddle of K+2 pixels has geodesic radius K+1
        # (labels converge) yet its far pixel sits outside the +-K window
        # and its sum/centroid would be silently truncated.  Flag any owned
        # pixel beyond the box.
        in_window = (dr_p <= K) & (dc_p >= -K) & (dc_p <= K)
        ovf_halo = ovf_halo | (jnp.sum(
            (mask & root_in_chunk & ~in_window).astype(jnp.int32)) > 0)

        # ---- packed window key: (displacement code << 16) | raw value ----
        # "q belongs to the root at p" iff q's OWN (dr_p, dc_p) equals the
        # window offset p-q, so each tap is one roll + one compare against
        # a per-offset constant.  The gate can only fire where p is a root.
        relc = jnp.where(mask & in_window, dr_p * D + dc_p + K, -1)
        key = relc * 65536 + val      # relc -1 -> key < 0 -> key >> 16 == -1

        key_rows = {0: key}
        for dr in range(1, K + 1):
            key_rows[dr] = _roll_rows(key, -dr, jnp.int32(-1))

        def gathered(dr, dc):
            shifted = key_rows[dr] if dc == 0 else \
                _roll_lanes(key_rows[dr], -dc, jnp.int32(-1))
            gate = (shifted >> 16) == (dr * D + dc + K)
            return gate, shifted

        own_root = (key >> 16) == K        # relc == K exactly at roots

        # ---- per-puddle statistic ----
        if mode == "l2max":
            acc = jnp.where(own_root, val, 0)
            for dr, dc in taps():
                gate, shifted = gathered(dr, dc)
                acc = jnp.maximum(acc, jnp.where(gate, shifted & 0xFFFF, 0))
            stat = jnp.minimum(acc, stat_limit)
        elif mode == "l2sum":
            acc = jnp.where(own_root, val, 0)
            for dr, dc in taps():
                gate, shifted = gathered(dr, dc)
                acc = acc + jnp.where(gate, shifted & 0xFFFF, 0)
            stat = jnp.minimum(acc, stat_limit)
        else:
            if mode == "l4m":
                # first raster-order argmax: taps iterate members in raster
                # order, so strict > keeps the earliest on ties
                best_v = jnp.where(own_root, val, 0)
                best_dr = jnp.zeros((R, W), jnp.int32)
                best_dc = jnp.zeros((R, W), jnp.int32)
                for dr, dc in taps():
                    gate, shifted = gathered(dr, dc)
                    v = jnp.where(gate, shifted & 0xFFFF, 0)
                    take = v > best_v
                    best_v = jnp.where(take, v, best_v)
                    best_dr = jnp.where(take, dr, best_dr)
                    best_dc = jnp.where(take, dc, best_dc)
                cent_r = global_row + best_dr
                cent_c = c_io + best_dc
            else:
                # centroid moments RELATIVE to the root: (wsum, sum dr*w,
                # sum dc*w).  int32-safe: |sum| <= K * 65535 * (K+1)(2K+1).
                if mode == "l4w":
                    w0 = jnp.where(own_root, val, 0)
                else:  # unweighted: count weights
                    w0 = own_root.astype(jnp.int32)
                wsum, sdr, sdc = w0, jnp.zeros_like(w0), jnp.zeros_like(w0)
                for dr, dc in taps():
                    gate, shifted = gathered(dr, dc)
                    if mode == "l4w":
                        g = jnp.where(gate, shifted & 0xFFFF, 0)
                    else:
                        g = gate.astype(jnp.int32)
                    wsum = wsum + g
                    if dr:
                        sdr = sdr + dr * g
                    if dc:
                        sdc = sdc + dc * g

                def round_div_plus(base, num, den, q_lo, q_hi):
                    # round-half-even((base*den + num) / den) in base+offset
                    # form so the full numerator (which can exceed int32 for
                    # large rows x heavy puddles) is never materialised.
                    # Matches the oracle's exact integer rounding.
                    #
                    # The quotient is BOUNDED: |num| <= K*den by construction
                    # (centroids lie within Chebyshev distance K of the
                    # root), so floor(num/den) comes from a (q_hi - q_lo)-
                    # compare ladder instead of a vector integer division —
                    # Mosaic has no VPU divide and lowers // and % to long
                    # multiword sequences.
                    den_safe = jnp.maximum(den, 1)
                    q = jnp.full_like(num, q_lo)
                    for t in range(q_lo + 1, q_hi + 1):
                        q = q + (num >= t * den_safe).astype(jnp.int32)
                    rem = num - q * den_safe     # in [0, den)
                    qt = base + q
                    down = den_safe - rem
                    up = (rem > down) | ((rem == down) & ((qt & 1) == 1))
                    return qt + up.astype(jnp.int32)

                cent_r = round_div_plus(global_row, sdr, wsum, 0, K)
                cent_c = round_div_plus(c_io, sdc, wsum, -K, K)

            # rasterize SEPARABLY: pixel p is a centroid iff some root within
            # the box has its centroid at p.  Roots sit above-or-level with
            # their centroid row, so the row phase only shifts downward: each
            # root's mark moves down by its centroid row offset ddr in [0..K]
            # carrying the pending lane offset ddc as one bit of a
            # (2K+1)-bit field (colliding marks OR; same bit = same centroid
            # position, distinct bits stay distinct), then the lane phase
            # tests each bit with a static shift.  (K+1) + (2K+1) passes
            # instead of the (K+1)(2K+1) shifted-compare taps this replaces.
            # Halo roots count: a neighbouring chunk's root can centroid
            # into this chunk; the Chebyshev/boundary checks guarantee such
            # puddles are fully visible here or flagged.
            is_root_any = mask & (lbl == lin) & valid
            ddr = cent_r - global_row
            ddc = cent_c - c_io
            # dynamic LEFT shift by a vector amount is Mosaic-safe on v5e
            # (the encode select uses it, hw-gated); dynamic RIGHT shifts
            # by vector are NOT — the lane phase below uses static shifts
            markbit = jnp.where(is_root_any, 1 << (ddc + K), 0)
            mid = jnp.where(ddr == 0, markbit, 0)
            for dr in range(1, K + 1):
                mid = mid | _roll_rows(jnp.where(ddr == dr, markbit, 0),
                                       dr, jnp.int32(0))
            is_cent = jnp.zeros((R, W), jnp.bool_)
            for dc in range(-K, K + 1):
                moved = mid if dc == 0 else _roll_lanes(mid, dc, jnp.int32(0))
                is_cent = is_cent | (((moved >> (dc + K)) & 1) == 1)
            is_cent = is_cent & valid & in_chunk

        # ---- extract the in-chunk rows via a selection matmul ----
        def chunk_mask(arr01):
            # 0/1 payload: one f32 matmul is exact (bf16 holds 0/1 exactly)
            return jnp.dot(selk_ref[...], arr01.astype(jnp.float32),
                           preferred_element_type=jnp.float32).astype(jnp.int32)

        if is_l4:
            bitmap_mask = chunk_mask(is_cent.astype(jnp.int32))
        else:
            bitmap_mask = chunk_mask((mask & in_chunk).astype(jnp.int32))
        roots_chunk = chunk_mask(is_root.astype(jnp.int32))

        if SUB != W:
            bitmap_mask = bitmap_mask.reshape(S, SUB)
            roots_chunk = roots_chunk.reshape(S, SUB)

        bytes_f = jnp.dot(bitmap_mask.astype(jnp.float32), pack_ref[...],
                          preferred_element_type=jnp.float32)
        bitmap_ref[0] = bytes_f.astype(jnp.int32).astype(jnp.uint8)

        if with_stats:
            # hi/lo byte split keeps the selection matmul exact for stats
            # wider than bf16's 8-bit mantissa (the MXU casts f32 -> bf16)
            sv = jnp.where(is_root, stat, 0)
            hi = (sv >> 8).astype(jnp.float32)
            lo = (sv & 0xFF).astype(jnp.float32)
            stat_chunk = (jnp.dot(selk_ref[...], hi,
                                  preferred_element_type=jnp.float32) * 256.0
                          + jnp.dot(selk_ref[...], lo,
                                    preferred_element_type=jnp.float32)
                          ).astype(jnp.int32)
            if SUB != W:
                stat_chunk = stat_chunk.reshape(S, SUB)
            acc, chunk_cnt, ovf1 = _compact_chunk(
                roots_chunk, stat_chunk, S, SUB, C1, C2, lti=lti_ref[...])
            ovf_store = _store_window(comp_ref, tail_ref, off_sref, acc,
                                      chunk_cnt, OUT, WIN, C2)
            ovf_ref[0, 0, 0] |= jnp.int32(ovf_halo | ovf1 | ovf_store)
        else:
            off_sref[0] = off_sref[0] + jnp.sum(roots_chunk)
            ovf_ref[0, 0, 0] |= jnp.int32(ovf_halo)

        @pl.when(h == n_chunks - 1)
        def _():
            count_ref[0, 0, 0] = off_sref[0]

    # selection matrix extracting the RPC in-chunk rows from the R halo rows
    # (numpy constants: jnp inside the lru_cached builder would leak tracers)
    i = np.arange(RPC)[:, None]
    j = np.arange(R)[None, :]
    sel_chunk = (j == i + K).astype(np.float32)
    pack_mat = make_pack_matrix(SUB)
    lti_mat = make_lti_matrix(SUB)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, R, W), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB // 8), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, R), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, SUB // 8), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H * W // SUB, SUB // 8), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            # the unrolled tap loops hold many chunk-sized temporaries live
            # on the Mosaic stack; the 16MB default scoped budget OOMs at
            # 4096-wide chunks
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call, (pack_mat, sel_chunk, lti_mat)


_MODE_BY_CONFIG = {
    (2, "max"): "l2max",
    (2, "sum"): "l2sum",
    (4, "weighted_average"): "l4w",
    (4, "unweighted"): "l4u",
    (4, "max"): "l4m",
}


def supports(height: int, width: int, bit_depth: int) -> bool:
    from . import pallas_encode

    return pallas_encode.supports(height, width, bit_depth) and height % 32 == 0


def _choose_rpc(H: int, W: int) -> int:
    """Rows per grid step: big enough to amortise per-step overhead,
    bounded so the unrolled tap loops' live temporaries fit scoped VMEM."""
    if W <= 512:
        cap = 128
    elif W <= 2048:
        cap = 64
    else:
        cap = 16
    rpc = cap
    while H % rpc:
        rpc //= 2
    return rpc


@functools.partial(jax.jit, static_argnames=("out_size", "halo", "c1", "mode",
                                             "bit_depth", "interpret",
                                             "rpc_override"))
def _label_call(frames, threshold, out_size, halo, c1, mode, bit_depth,
                interpret, rpc_override=None):
    B, H, W = frames.shape
    rpc = _choose_rpc(H, W) if rpc_override is None else rpc_override
    sub = W if W <= 512 else 512
    # pre-halo the inputs: (B, n_chunks, R, W) row windows, edge rows
    # clamped (the kernel masks them out via its `valid` predicate)
    n_chunks = H // rpc
    r_full = rpc + 2 * halo
    rows = jnp.clip(jnp.arange(n_chunks)[:, None] * rpc - halo
                    + jnp.arange(r_full)[None, :], 0, H - 1)
    frames_h = frames[:, rows, :]
    thresh_h = threshold[rows, :]
    call, consts = _build_l2l4_kernel(
        B, H, W, out_size, rpc, halo, sub, c1, mode, bit_depth, interpret)
    bitmap, comp, counts, ovf = call(frames_h, thresh_h, *consts)
    return (bitmap.reshape(B, H * (W // 8)), comp[:, 0, :out_size],
            counts[:, 0, 0], ovf[:, 0, 0] != 0)


def encode_l2l4_pallas(frames, threshold, reduction_level: int, out_size: int,
                       bit_depth: int, statistic: str = "max",
                       scheme: str = "weighted_average", halo_bucket: int = 0,
                       cap_bucket: int = 0, interpret=None, rpc_override=None):
    """Run the fused L2/L4 kernel.

    Returns (bitmap (B, H*W/8) u8, stats (B, out_size) i32 or None for L4,
    counts (B,) i32, overflow (B,) bool).  On overflow escalate
    ``halo_bucket`` (bigger puddles) and/or ``cap_bucket`` (more puddles per
    sub-row), then fall back to the XLA path.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    from .pallas_encode import CAPACITY_BUCKETS

    mode = _MODE_BY_CONFIG[(reduction_level, statistic if reduction_level == 2 else scheme)]
    halo = HALO_BUCKETS[halo_bucket]
    c1 = CAPACITY_BUCKETS[cap_bucket]
    out_aligned = max(128, -(-out_size // 128) * 128)
    bitmap, stats, counts, ovf = _label_call(
        frames, threshold, out_aligned, halo, c1, mode, bit_depth,
        bool(interpret), rpc_override)
    if reduction_level == 4:
        stats = None
    elif out_aligned != out_size:
        stats = stats[:, :out_size]
    return bitmap, stats, counts, ovf
