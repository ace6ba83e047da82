"""Fused Pallas TPU kernel for L2/L4 encode (connected components + stats).

Replaces the XLA path (iterative reduce_window labeling + segment scatters,
~0.08 GB/s at 512^2 — the gathers/scatters serialize) with a chunk-local
design that exploits the physics: electron puddles are a few pixels across.

Per chunk of RPC image rows, with a K-row halo taken from the neighboring
row-blocks (three clamped input views of the same array — Pallas blocks
cannot overlap):

* labels: 8-connected min-propagation of the in-halo linear index, T = K+2
  statically-unrolled iterations.  Row shifts use ``pltpu.roll`` along the
  sublane axis with edge masking; lane shifts likewise along lanes.  A
  puddle whose geodesic radius exceeds K is detected (one extra iteration
  still changes labels, or it touches the halo boundary) and flags overflow
  -> the caller escalates K or falls back to XLA.
* roots: a pixel whose converged label equals its own index is its puddle's
  first pixel in raster order, so per-chunk root order concatenated across
  chunks reproduces scipy.ndimage.label's global label order exactly.
* stats (L2): 'max' by masked neighbor-max propagation along the converged
  labels; 'sum' by an exact int32 window reduction over the (2K+1)^2 box
  around each pixel gated on label equality (puddle diameter <= K+1
  guarantees the box covers the puddle from its root).
* centroids (L4): window sums of (v, v*row, v*col) at roots + the same
  exact round-half-even integer division as the XLA path/oracle, then the
  centroid bitmap is rasterized with one more window pass (a pixel is set
  iff some root within the box rounds to it).
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

from .pallas_encode import _compact_chunk, _store_window, make_pack_matrix

_BIG = 1 << 30  # plain int: jnp scalars would be captured as kernel constants

# halo sizes to escalate through (puddle geodesic radius bound)
HALO_BUCKETS = (4, 8)


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


def _neighbors8(x, fill):
    """The 8 shifted copies of x (edge-filled), for 8-connectivity."""
    up = _roll_rows(x, -1, fill)
    down = _roll_rows(x, 1, fill)
    out = []
    for base in (x, up, down):
        out.append(_roll_lanes(base, 1, fill))
        out.append(_roll_lanes(base, -1, fill))
    out.append(up)
    out.append(down)
    return out


@functools.lru_cache(maxsize=64)
def _build_l2l4_kernel(B, H, W, OUT, RPC, K, SUB, C1, mode, bit_depth, interpret):
    """mode: 'l2max' | 'l2sum' | 'l4w' | 'l4u' | 'l4m'."""
    assert RPC >= K
    R = RPC + 2 * K
    T = K + 2
    n_chunks = H // RPC
    S = RPC * W // SUB
    C2 = S * C1
    WIN = C2 + 128
    is_l4 = mode.startswith("l4")
    with_stats = not is_l4
    stat_limit = (1 << bit_depth) - 1

    def kernel(x_prev_ref, x_cur_ref, x_next_ref, t_prev_ref, t_cur_ref,
               t_next_ref, pack_ref, selp_ref, selc_ref, seln_ref, selk_ref,
               bitmap_ref, comp_ref, count_ref, ovf_ref,
               off_sref, tail_ref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            comp_ref[...] = jnp.zeros_like(comp_ref)
            tail_ref[...] = jnp.zeros_like(tail_ref)

        # ---- assemble the halo'd chunk via 0/1 selection matmuls ----
        # (sublane-offset slices + concat don't lower; matmuls do).  The MXU
        # casts f32 operands to bf16 (exact only up to 2^8), so 16-bit values
        # go through as separate hi/lo bytes — each <= 255, each product
        # exact, f32 accumulation exact.
        def sel_exact(sel_ref, arr):
            v = arr.astype(jnp.int32)
            hi = (v >> 8).astype(jnp.float32)
            lo = (v & 0xFF).astype(jnp.float32)
            out = jnp.dot(sel_ref[...], hi, preferred_element_type=jnp.float32) * 256.0 \
                + jnp.dot(sel_ref[...], lo, preferred_element_type=jnp.float32)
            return out.astype(jnp.int32)

        def halo(prev, cur, nxt):
            return (sel_exact(selp_ref, prev) + sel_exact(selc_ref, cur)
                    + sel_exact(seln_ref, nxt))

        xh = halo(x_prev_ref[0], x_cur_ref[0], x_next_ref[0])      # (R, W)
        th = halo(t_prev_ref[...], t_cur_ref[...], t_next_ref[...])

        r_io = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        global_row = h * RPC - K + r_io
        valid = (global_row >= 0) & (global_row < H)
        mask = (xh > th) & valid
        # stats/centroid weights use RAW values (reference recode_writer.py:446
        # and converters.py:168 pass the frame, not the residual)
        val = jnp.where(mask, xh, 0)

        # ---- label propagation: min over the 8-neighborhood, T iterations ----
        lin = r_io * W + c_io
        lbl = jnp.where(mask, lin, _BIG)
        for _ in range(T):
            m = jnp.where(mask, lbl, _BIG)
            best = m
            for nb in _neighbors8(m, _BIG):
                best = jnp.minimum(best, nb)
            lbl = jnp.where(mask, best, _BIG)

        # one extra iteration: any change means the K bound was violated
        m = jnp.where(mask, lbl, _BIG)
        best = m
        for nb in _neighbors8(m, _BIG):
            best = jnp.minimum(best, nb)
        lbl_extra = jnp.where(mask, best, _BIG)
        ovf_halo = jnp.sum((lbl_extra != lbl).astype(jnp.int32)) > 0

        in_chunk = (r_io >= K) & (r_io < K + RPC) & valid
        is_root = mask & (lbl == lin) & in_chunk

        # a foreground pixel on the halo boundary whose root lies in this
        # chunk means the puddle may extend beyond the halo: its stats would
        # be silently truncated -> flag overflow (escalate K)
        root_row = lbl // W
        at_boundary = (r_io == 0) | (r_io == R - 1)
        root_in_chunk = (root_row >= K) & (root_row < K + RPC)
        ovf_halo = ovf_halo | (jnp.sum(
            (mask & at_boundary & root_in_chunk).astype(jnp.int32)) > 0)

        # the stats/centroid windows only reach CHEBYSHEV distance K from
        # the root.  Label convergence alone does not guarantee that bound:
        # a straight-line puddle of K+2 pixels has geodesic radius K+1 <= T
        # (labels converge, the extra iteration shows no change) yet its far
        # pixel sits outside the +-K window and its sum/centroid would be
        # silently truncated.  Flag any owned pixel beyond the box.
        root_col = lbl - root_row * W
        cheby_bad = mask & root_in_chunk & (
            (r_io - root_row > K)
            | (c_io - root_col > K) | (root_col - c_io > K))
        ovf_halo = ovf_halo | (jnp.sum(cheby_bad.astype(jnp.int32)) > 0)

        # ---- per-puddle statistic ----
        if mode == "l2max":
            st = jnp.where(mask, val, 0)
            for _ in range(T):
                best = st
                for nb_s, nb_l in zip(_neighbors8(st, jnp.int32(0)),
                                      _neighbors8(lbl, _BIG)):
                    best = jnp.maximum(best, jnp.where(nb_l == lbl, nb_s, 0))
                st = jnp.where(mask, best, 0)
            stat = jnp.minimum(st, stat_limit)
        elif mode == "l2sum":
            acc_sum = jnp.where(mask, val, 0)
            for dr in range(-K, K + 1):
                row_l = _roll_rows(lbl, dr, _BIG)
                row_v = _roll_rows(jnp.where(mask, val, 0), dr, jnp.int32(0))
                for dc in range(-K, K + 1):
                    if dr == 0 and dc == 0:
                        continue
                    nb_l = _roll_lanes(row_l, dc, _BIG)
                    nb_v = _roll_lanes(row_v, dc, jnp.int32(0))
                    acc_sum = acc_sum + jnp.where(nb_l == lbl, nb_v, 0)
            stat = jnp.minimum(acc_sum, stat_limit)
        else:
            # L4: window sums of the centroid moments at every pixel; only the
            # values at roots are used.  int32 is exact (sums < 2^31).
            if mode == "l4w":
                wgt = jnp.where(mask, val, 0)
            else:  # unweighted / max use count weights for the sums
                wgt = mask.astype(jnp.int32)
            grow = jnp.where(mask, global_row, 0)
            gcol = jnp.where(mask, c_io, 0)

            if mode == "l4m":
                # first raster-order argmax: maximize value, tie -> min index
                st = jnp.where(mask, val, 0)
                am = jnp.where(mask, lin, _BIG)
                for _ in range(T):
                    best_v, best_i = st, am
                    for nb_v, nb_i, nb_l in zip(_neighbors8(st, jnp.int32(0)),
                                                _neighbors8(am, _BIG),
                                                _neighbors8(lbl, _BIG)):
                        same = nb_l == lbl
                        v = jnp.where(same, nb_v, 0)
                        i = jnp.where(same, nb_i, _BIG)
                        take = (v > best_v) | ((v == best_v) & (i < best_i))
                        best_v = jnp.where(take, v, best_v)
                        best_i = jnp.where(take, i, best_i)
                    st = jnp.where(mask, best_v, 0)
                    am = jnp.where(mask, best_i, _BIG)
                # am holds the argmax pixel's in-halo linear index
                cent_r = (am // W) + (h * RPC - K)
                cent_c = am % W
            else:
                wsum = wgt
                rsum = wgt * grow
                csum = wgt * gcol
                for dr in range(-K, K + 1):
                    row_l = _roll_rows(lbl, dr, _BIG)
                    row_w = _roll_rows(wgt, dr, jnp.int32(0))
                    row_r = _roll_rows(wgt * grow, dr, jnp.int32(0))
                    row_c = _roll_rows(wgt * gcol, dr, jnp.int32(0))
                    for dc in range(-K, K + 1):
                        if dr == 0 and dc == 0:
                            continue
                        same = _roll_lanes(row_l, dc, _BIG) == lbl
                        wsum = wsum + jnp.where(same, _roll_lanes(row_w, dc, jnp.int32(0)), 0)
                        rsum = rsum + jnp.where(same, _roll_lanes(row_r, dc, jnp.int32(0)), 0)
                        csum = csum + jnp.where(same, _roll_lanes(row_c, dc, jnp.int32(0)), 0)

                # exact round-half-to-even division (matches the oracle)
                def round_div(num, den):
                    den_safe = jnp.maximum(den, 1)
                    q = num // den_safe
                    rem = num - q * den_safe
                    down = den_safe - rem
                    up = (rem > down) | ((rem == down) & (q % 2 == 1))
                    return q + up.astype(jnp.int32)

                cent_r = round_div(rsum, wsum)
                cent_c = round_div(csum, wsum)

            # rasterize: pixel p is a centroid iff some root within the box
            # has (cent_r, cent_c) == p's global position.  Roots in the halo
            # count too: a root near the chunk boundary (owned by a
            # neighboring chunk) can have its centroid land in THIS chunk.
            # The root is always its puddle's topmost pixel, so a top-halo
            # root's puddle is fully visible here (diameter <= K) and its
            # centroid is exact; bottom-halo roots have centroid rows beyond
            # this chunk and never hit in-chunk pixels.
            is_root_any = mask & (lbl == lin) & valid
            is_cent = is_root_any & (cent_r == global_row) & (cent_c == c_io)
            root_r = jnp.where(is_root_any, cent_r, -1)
            root_c = jnp.where(is_root_any, cent_c, -1)
            for dr in range(-K, K + 1):
                rr = _roll_rows(root_r, dr, jnp.int32(-1))
                rc = _roll_rows(root_c, dr, jnp.int32(-1))
                for dc in range(-K, K + 1):
                    if dr == 0 and dc == 0:
                        continue
                    hit = (_roll_lanes(rr, dc, jnp.int32(-1)) == global_row) & \
                          (_roll_lanes(rc, dc, jnp.int32(-1)) == c_io)
                    is_cent = is_cent | hit
            # centroids may be clipped to frame bounds (degenerate); keep valid
            is_cent = is_cent & valid & in_chunk

        # ---- extract the in-chunk rows via a selection matmul ----
        def to_chunk(arr):
            return sel_exact(selk_ref, arr)

        if is_l4:
            bitmap_mask = to_chunk(is_cent.astype(jnp.int32))
        else:
            bitmap_mask = to_chunk((mask & in_chunk).astype(jnp.int32))
        roots_chunk = to_chunk(is_root.astype(jnp.int32))

        if SUB != W:
            bitmap_mask = bitmap_mask.reshape(S, SUB)
            roots_chunk = roots_chunk.reshape(S, SUB)

        bytes_f = jnp.dot(bitmap_mask.astype(jnp.float32), pack_ref[...],
                          preferred_element_type=jnp.float32)
        bitmap_ref[0] = bytes_f.astype(jnp.int32).astype(jnp.uint8)

        if with_stats:
            stat_chunk = to_chunk(jnp.where(is_root, stat, 0))
            if SUB != W:
                stat_chunk = stat_chunk.reshape(S, SUB)
            acc, chunk_cnt, ovf1 = _compact_chunk(
                roots_chunk, stat_chunk, S, SUB, C1, C2)
            ovf_store = _store_window(comp_ref, tail_ref, off_sref, acc,
                                      chunk_cnt, OUT, WIN, C2)
            ovf_ref[0, 0, 0] |= jnp.int32(ovf_halo | ovf1 | ovf_store)
        else:
            off_sref[0] = off_sref[0] + jnp.sum(roots_chunk)
            ovf_ref[0, 0, 0] |= jnp.int32(ovf_halo)

        @pl.when(h == n_chunks - 1)
        def _():
            count_ref[0, 0, 0] = off_sref[0]

    # selection matrices for halo assembly / chunk extraction
    def sel(rows_out, rows_in, fn):
        # numpy constants: jnp inside the lru_cached builder would leak tracers
        i = np.arange(rows_out)[:, None]
        j = np.arange(rows_in)[None, :]
        return fn(i, j).astype(np.float32)

    sel_prev = sel(R, RPC, lambda i, j: (i < K) & (j == i + RPC - K))
    sel_cur = sel(R, RPC, lambda i, j: (i >= K) & (i < K + RPC) & (j == i - K))
    sel_next = sel(R, RPC, lambda i, j: (i >= K + RPC) & (j == i - K - RPC))
    sel_chunk = sel(RPC, R, lambda i, j: j == i + K)
    pack_mat = make_pack_matrix(SUB)

    prev_map = lambda b, h: (b, jnp.maximum(h - 1, 0), 0)
    cur_map = lambda b, h: (b, h, 0)
    next_map = lambda b, h: (b, jnp.minimum(h + 1, n_chunks - 1), 0)
    tprev_map = lambda b, h: (jnp.maximum(h - 1, 0), 0)
    tcur_map = lambda b, h: (h, 0)
    tnext_map = lambda b, h: (jnp.minimum(h + 1, n_chunks - 1), 0)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, RPC, W), prev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RPC, W), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RPC, W), next_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, W), tprev_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, W), tcur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, W), tnext_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, SUB // 8), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, RPC), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, RPC), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, RPC), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RPC, R), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
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
            # the unrolled propagation/window loops hold many chunk-sized
            # temporaries live on the Mosaic stack; the 16MB default scoped
            # budget OOMs at 4096-wide chunks
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call, (pack_mat, sel_prev, sel_cur, sel_next, sel_chunk)


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


@functools.partial(jax.jit, static_argnames=("out_size", "halo", "c1", "mode",
                                             "bit_depth", "interpret"))
def _label_call(frames, threshold, out_size, halo, c1, mode, bit_depth, interpret):
    B, H, W = frames.shape
    # narrower chunks for wide frames keep the halo'd working set bounded
    rpc = 32 if W <= 2048 else 16
    sub = W if W <= 512 else 512
    call, consts = _build_l2l4_kernel(
        B, H, W, out_size, rpc, halo, sub, c1, mode, bit_depth, interpret)
    bitmap, comp, counts, ovf = call(
        frames, frames, frames, threshold, threshold, threshold, *consts)
    return (bitmap.reshape(B, H * (W // 8)), comp[:, 0, :out_size],
            counts[:, 0, 0], ovf[:, 0, 0] != 0)


def encode_l2l4_pallas(frames, threshold, reduction_level: int, out_size: int,
                       bit_depth: int, statistic: str = "max",
                       scheme: str = "weighted_average", halo_bucket: int = 0,
                       cap_bucket: int = 0, interpret=None):
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
        frames, threshold, out_aligned, halo, c1, mode, bit_depth, bool(interpret))
    if reduction_level == 4:
        stats = None
    elif out_aligned != out_size:
        stats = stats[:, :out_size]
    return bitmap, stats, counts, ovf
