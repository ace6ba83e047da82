"""Pallas TPU kernels for the interleaved-rANS entropy stage (scheme 12).

Device side of codecs/rans.py — the zstd-class entropy backend.  Unlike the
deflate bitstream (pallas_deflate.py), rANS is symmetric: W interleaved
states advance one symbol per lane per row, so the per-symbol math
vectorizes for BOTH encode and decode.  W = 1024 lanes (the format's
log2_nways=10), one (1, 1024) state vector.

**Encode** (grid step = ROWS_R rows = ROWS_R * 1024 tokens, walked from the
stream's END backwards, matching the format's emit order):
  * per-token (freq, cum, eb, ev) via the bilinear radix LUT lookup at
    precision=HIGHEST (the assemble kernel's construction; all values
    <= 4096 are exact f32);
  * renormalization: at most 2 bytes per symbol (x < 2^31, threshold
    f<<19); bytes scatter into a row-local window via ONE stacked one-hot
    matmul (positions = descending-lane suffix-sum of emit counts, low byte
    first per lane) and append through the shared 128-aligned window store;
  * the state update x' = (x//f << 12) + x%f + cum needs an EXACT 31-bit /
    12-bit division: three 12-bit digit steps, each a f32-reciprocal
    estimate with +-3 integer fixups (all intermediates < 2^24, exact f32).

**Decode** (same grid, walked forward): slot = x & 4095 -> (sym, freq, cum)
via a radix lookup over the 4096-slot tables; x' = f*(x>>12) + slot - cum;
renormalization consumes 0..2 bytes per lane, gathered from a backward
window of the body with ONE stacked one-hot matmul (the scatter transposed).
The decoder emits the SYMBOL stream + per-token take lengths; the
final byte reconstruction (literal scatter + run fill) happens on host
(memset-class work) or via codecs/rans._syms_to_tokens.

Token indices use the INVERTED convention of the deflate kernels
(tok = 512 - idx... see pallas_deflate.NO_TOKEN): pad slots are 0 and
assemble-compatible, so tokenize_pallas / compact_tokens feed this kernel
unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode import _cumsum_lanes, _store_window
from .pallas_deflate import NO_TOKEN

W_LANES = 1024          # interleaved rANS states (format log2_nways = 10)
ROWS_R = 8              # rows (of W_LANES tokens) per grid step
CH_R = ROWS_R * W_LANES
RANS_L = 1 << 23
PROB_BITS = 12
M_TOT = 1 << PROB_BITS
# per-row emit window: <= 2 bytes per lane + 128-lane alignment spill
EMIT_WIN = 2 * W_LANES + 128


def _exact_div(x, f, f_f32):
    """Exact (x // f, x % f) for 0 <= x < 2^31, 1 <= f <= 4096.

    Three 12-bit digit steps of schoolbook long division; the per-digit
    quotient estimate is f32 (all operands < 2^24, so the only error is the
    reciprocal's), corrected by +-3 integer fixups.
    """
    rf = 1.0 / f_f32
    d2 = x >> 24
    d1 = (x >> 12) & (M_TOT - 1)
    d0 = x & (M_TOT - 1)

    def step(rem_in, d):
        v = (rem_in << PROB_BITS) | d
        q0 = (v.astype(jnp.float32) * rf).astype(jnp.int32)
        rem = v - q0 * f
        for _ in range(3):
            over = rem >= f
            q0 = q0 + over.astype(jnp.int32)
            rem = rem - jnp.where(over, f, 0)
        for _ in range(3):
            under = rem < 0
            q0 = q0 - under.astype(jnp.int32)
            rem = rem + jnp.where(under, f, 0)
        return q0, rem

    q2, r2 = step(jnp.zeros_like(x), d2)
    q1, r1 = step(r2, d1)
    q0, r0 = step(r1, d0)
    return (q2 << 24) + (q1 << PROB_BITS) + q0, r0


@functools.lru_cache(maxsize=16)
def _build_rans_encode_kernel(B, NPAD, OUT, interpret, hi_rows=24,
                              lo_lanes=32, direct=False, lut_rows=96,
                              groups=1):
    """``hi_rows``/``lo_lanes`` set the LUT radix (hi_rows*lo_lanes indices;
    byte mode: 24x32 over the 768-slot token space).  ``direct=True`` codes
    the input as raw symbol values (symbol mode: 64x64 over a 4096-wide
    alphabet, no NO_TOKEN inversion).  ``groups`` > 1 gives each of the
    ROWS_R rows in a grid step its OWN interleave-state row (format nways =
    groups * W_LANES): the rows' per-symbol chains become independent, so
    the scheduler overlaps them — the groups=1 kernel is LATENCY-bound on
    the serial 1024-lane row chain (~2 us/row on hw); only the scalar byte
    cursor still chains rows.  Requires groups == ROWS_R."""
    assert groups in (1, ROWS_R)
    n_steps = NPAD // CH_R
    # step-level emit bound: <= 2 bytes per token over all ROWS_R rows, plus
    # the per-row scatter window's alignment slack
    STEP_EMIT = ROWS_R * 2 * W_LANES + 128
    WIN = STEP_EMIT + 128

    def kernel(tok_ref, lut_ref, m_ref, body_ref, states_ref, cnt_ref,
               x_vref, off_sref, tail_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            x_vref[...] = jnp.full((groups, W_LANES), RANS_L, jnp.int32)
            off_sref[0] = 0
            tail_vref[...] = jnp.zeros_like(tail_vref)
            body_ref[...] = jnp.zeros_like(body_ref)

        m = m_ref[0, 0, 0]
        # this step covers token rows [row0, row0 + ROWS_R) COUNTING FROM
        # THE END: grid h=0 maps to the LAST block (see index_map)
        blk = n_steps - 1 - h

        # all-padding blocks (every token >= m) are processed FIRST in the
        # end-first order; skip them whole — every lane would be inactive,
        # and _store_window with total == 0 only rewrites its own tail, so
        # skipping is exactly equivalent.  Streams much shorter than NPAD
        # (shared-pad batches) then cost O(m), not O(NPAD).
        @pl.when(blk * CH_R < m)
        def _step_body():
            # batched LUT lookup for the whole step: idx = NO_TOKEN - tok
            # (byte mode) or the raw symbol value (direct/symbol mode)
            tok = tok_ref[0, 0].astype(jnp.int32)      # (ROWS_R, W_LANES)
            idx = tok if direct else NO_TOKEN - tok
            lo_sh = lo_lanes.bit_length() - 1              # lo_lanes is pow2
            io_lo = jax.lax.broadcasted_iota(jnp.int32, (lo_lanes, CH_R), 0)
            io_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_rows, CH_R), 0)
            row = idx.reshape(1, CH_R)
            oh_lo = ((row & (lo_lanes - 1)) == io_lo).astype(jnp.bfloat16)
            oh_hi = ((row >> lo_sh) == io_hi).astype(jnp.float32)
            lut = lut_ref[0]                    # (>= 2*hi_rows, lo_lanes) f32
            # LUT values are 12-bit: byte-plane split keeps the fetch matmul at
            # full bf16 MXU rate (the one-matmul f32 form needed HIGHEST's
            # 3-pass path and made the kernel MXU-bound)
            lut_i = lut.astype(jnp.int32)
            nlr = lut.shape[0]
            lut_planes = jnp.concatenate(
                [(lut_i & 255).astype(jnp.bfloat16),
                 (lut_i >> 8).astype(jnp.bfloat16)], axis=0)
            m1 = jnp.dot(lut_planes, oh_lo,
                         preferred_element_type=jnp.float32)    # (2*nlr, CH_R)
            # keep the per-token planes as (1, CH_R) rows; per-row views below
            # are 128-aligned LANE slices (lane->sublane reshapes don't lower)

            def _fetch(row0):
                lo = jnp.sum(oh_hi * m1[row0:row0 + hi_rows], axis=0,
                             keepdims=True).astype(jnp.int32)
                hi = jnp.sum(oh_hi * m1[nlr + row0:nlr + row0 + hi_rows],
                             axis=0, keepdims=True).astype(jnp.int32)
                return lo + (hi << 8)
            f_i = _fetch(0)
            c_i = _fetch(hi_rows)

            lio = jax.lax.broadcasted_iota(jnp.int32, (1, W_LANES), 1)

            # rows inside the step, last first (token order is descending);
            # each row's emission window is collected and concatenated into
            # ONE step-level store below — per-row stores chained every row
            # on the byte cursor, serializing the (otherwise independent)
            # groups>1 row chains at ~1 us/row
            emits = []
            for r in range(ROWS_R - 1, -1, -1):
                gidx0 = (blk * ROWS_R + r) * W_LANES       # first token of row
                active = (gidx0 + lio) < m                 # (1, W_LANES)
                sl = slice(r * W_LANES, (r + 1) * W_LANES)
                f = jnp.where(active, f_i[:, sl], 1)
                ff = f.astype(jnp.float32)
                cum = jnp.where(active, c_i[:, sl], 0)
                g = r if groups > 1 else 0
                x = x_vref[g:g + 1, :]

                # ---- renormalization: emit while x >= f << 19 (max twice) ----
                xmax = f << 19
                e0 = active & (x >= xmax)
                b0 = x & 255
                x1 = jnp.where(e0, x >> 8, x)
                e1 = e0 & (x1 >= xmax)
                b1 = x1 & 255
                x2 = jnp.where(e1, x1 >> 8, x1)
                nb = e0.astype(jnp.int32) + e1.astype(jnp.int32)

                # ---- emit order: descending lane, low byte first per lane ----
                incl = _cumsum_lanes(nb, W_LANES)
                total = incl[0, W_LANES - 1]
                pos0 = total - incl                        # suffix-sum excl self
                # scatter b0 at pos0, b1 at pos0+1 into the (1, EMIT_WIN) window
                t_all = pos0
                io128 = jax.lax.broadcasted_iota(jnp.int32, (128, W_LANES), 0)
                nwrows = EMIT_WIN // 128
                io_nw = jax.lax.broadcasted_iota(jnp.int32, (nwrows, W_LANES), 0)
                oh_tl = ((t_all & 127) == io128).astype(jnp.bfloat16)
                oh_th = ((t_all >> 7) == io_nw).astype(jnp.bfloat16)
                blocks = [oh_th * jnp.where(e0, b0, 0).astype(jnp.bfloat16),
                          oh_th * jnp.where(e1, b1, 0).astype(jnp.bfloat16)]
                stacked = jnp.concatenate(blocks, axis=0)
                o2 = jax.lax.dot_general(stacked, oh_tl,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                row0 = o2[0:nwrows].astype(jnp.int32).reshape(1, nwrows * 128)
                row1 = o2[nwrows: 2 * nwrows].astype(jnp.int32) \
                    .reshape(1, nwrows * 128)
                local = row0 + pltpu.roll(row1, 1, axis=1)
                emits.append((local, total))

                # ---- state update: x' = (x2//f << 12) + x2%f + cum ----
                q, rem = _exact_div(x2, f, ff)
                xn = (q << PROB_BITS) + rem + cum
                x_vref[g:g + 1, :] = jnp.where(active, xn, x)

            # ---- ragged concat of the row windows + ONE step store ----
            # (emits is already in emission order: row ROWS_R-1 first)
            offs = []
            run = jnp.zeros((), jnp.int32)
            for _, total in emits:
                offs.append(run)
                run = run + total
            parts = []
            for (local, _), off_r in zip(emits, offs):
                p = jnp.pad(local, ((0, 0), (0, WIN - local.shape[1])))
                parts.append(pltpu.roll(p, off_r, axis=1))
            # pairwise tree sum keeps the add chain log-depth
            while len(parts) > 1:
                parts = [parts[i] + parts[i + 1] if i + 1 < len(parts)
                         else parts[i] for i in range(0, len(parts), 2)]
            _store_window(body_ref, tail_vref, off_sref,
                          parts[0][:, :STEP_EMIT], run, OUT, WIN, STEP_EMIT)

        @pl.when(h == n_steps - 1)
        def _():
            states_ref[0] = x_vref[...]
            cnt_ref[0, 0, 0] = off_sref[0]

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, ROWS_R, W_LANES),
                         lambda b, h: (b, n_steps - 1 - h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_rows, lo_lanes), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, W_LANES), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, groups, W_LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((groups, W_LANES), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


@functools.partial(jax.jit, static_argnames=("out_bound", "interpret",
                                              "hi_rows", "direct", "groups"))
def _rans_encode_call(tok, luts, m, out_bound, interpret, hi_rows=24,
                      direct=False, groups=1):
    B, NPAD = tok.shape
    call = _build_rans_encode_kernel(B, NPAD, out_bound, bool(interpret),
                                     hi_rows=hi_rows,
                                     lo_lanes=luts.shape[2], direct=direct,
                                     lut_rows=luts.shape[1], groups=groups)
    body, states, cnt = call(
        tok.reshape(B, NPAD // CH_R, ROWS_R, W_LANES), luts,
        m.reshape(B, 1, 1).astype(jnp.int32))
    return (body[:, 0, :out_bound],
            states.reshape(B, groups * W_LANES), cnt[:, 0, 0])


def rans_encode_pallas(tok, luts, m, out_bound, interpret=None):
    """Device interleaved-rANS encode of a dense token stream.

    ``tok`` (B, NPAD) u16/i32 — INVERTED token stream (pallas_deflate
    convention; pad 0), NPAD a multiple of ``CH_R``; tokens beyond ``m`` are
    ignored.  ``luts`` (B, 96, 32) f32 — radix layout [idx>>5, idx&31] of
    rows 0..23 freq[sym(idx)], 24..47 cum[sym(idx)], built by
    ``codecs.rans.encode_luts_radix``.  ``m`` (B,) i32 true token counts.
    Returns (body (B, out_bound) u8-in-i32 emit-order bytes, states (B,
    W_LANES) i32 final states, counts (B,) i32 body byte counts).

    The caller (codecs/rans.deflate-like pipeline) wraps body/states into
    the scheme-12 container; extra bits pack via assemble_pallas with an
    (ev, eb) LUT.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    out_bound = -(-out_bound // 128) * 128
    return _rans_encode_call(tok, luts, jnp.asarray(m), int(out_bound),
                             bool(interpret))


def rans_encode_symbols_pallas(values, luts, m, out_bound, interpret=None,
                               groups=1):
    """Device interleaved-rANS encode of DIRECT symbols (scheme-12 symbol
    mode, flags bit1): ``values`` (B, NPAD) i32 raw symbols < 4096 (pad 0;
    entries beyond ``m`` ignored), ``luts`` (B, 128, 64) f32 from
    :func:`encode_luts_symbols` (radix [sym>>6, sym&63]; rows 0..63 freq,
    64..127 cum) — or (B, 8, 64) from :func:`encode_luts_symbols8` for
    8-bit alphabets (the hi one-hot and the fetch intermediate shrink 16x).
    Same outputs as :func:`rans_encode_pallas`, with states
    (B, groups*W_LANES)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    out_bound = -(-out_bound // 128) * 128
    return _rans_encode_call(values, luts, jnp.asarray(m), int(out_bound),
                             bool(interpret), hi_rows=luts.shape[1] // 2,
                             direct=True,
                             groups=groups)


def encode_luts_symbols(freq: np.ndarray) -> np.ndarray:
    """(128, 64) f32 radix LUT for :func:`rans_encode_symbols_pallas`:
    rows 0..63 = freq[hi*64 + lo], rows 64..127 = cum[hi*64 + lo] for a
    4096-symbol alphabet (freq padded with zeros; unused symbols get
    freq 0 -> the kernel never sees them because they never occur)."""
    freq = np.asarray(freq, np.int64)
    full = np.zeros(4096, np.int64)
    full[: freq.size] = freq
    cum = np.zeros(4097, np.int64)
    cum[1:] = np.cumsum(full)
    out = np.zeros((128, 64), np.float32)
    out[0:64] = np.maximum(full, 1).reshape(64, 64)   # pad-safe freq >= 1
    out[64:128] = cum[:4096].reshape(64, 64)
    return out


def encode_luts_symbols8(freq: np.ndarray) -> np.ndarray:
    """(8, 64) f32 radix LUT for 8-bit alphabets: rows 0..3 freq, 4..7 cum
    for symbols hi*64 + lo (hi < 4).  The encode kernel's hi one-hot and
    bilinear-fetch intermediate shrink 16x vs the 4096-wide LUT."""
    freq = np.asarray(freq, np.int64)
    assert freq.size <= 256
    full = np.zeros(256, np.int64)
    full[: freq.size] = freq
    cum = np.zeros(257, np.int64)
    cum[1:] = np.cumsum(full)
    out = np.zeros((8, 64), np.float32)
    out[0:4] = np.maximum(full, 1).reshape(4, 64)
    out[4:8] = cum[:256].reshape(4, 64)
    return out


def encode_luts_radix(freq: np.ndarray) -> np.ndarray:
    """(96, 32) f32 radix LUT for :func:`rans_encode_pallas`: per token
    index idx (pallas_deflate convention, 0..511; 512 = pad), rows 0..23 =
    freq[sym(idx)], rows 24..47 = cum[sym(idx)], rows 48..71 = extra-bit
    count eb(idx), rows 72..95 = extra value ev(idx).

    Pad (idx 512) maps to freq 1 / cum 0 / eb 0 / ev 0 — harmless because
    the kernel masks inactive lanes anyway.
    """
    from ..codecs.dyndeflate import LEN_BASE, LEN_EXTRA

    freq = np.asarray(freq, np.int64)
    cum = np.zeros(freq.size + 1, np.int64)
    cum[1:] = np.cumsum(freq)
    nidx = 768
    f = np.ones(nidx, np.float32)
    c = np.zeros(nidx, np.float32)
    e = np.zeros(nidx, np.float32)
    v = np.zeros(nidx, np.float32)
    lit = np.arange(256)
    f[:256] = freq[lit]
    c[:256] = cum[lit]
    take = np.arange(3, 259)
    cc = (np.searchsorted(LEN_BASE, take, side="right") - 1)
    sym = 257 + cc
    f[256:512] = freq[sym]
    c[256:512] = cum[sym]
    e[256:512] = LEN_EXTRA[cc]
    v[256:512] = take - LEN_BASE[cc]
    out = np.zeros((96, 32), np.float32)
    out[0:24] = f.reshape(24, 32)
    out[24:48] = c.reshape(24, 32)
    out[48:72] = e.reshape(24, 32)
    out[72:96] = v.reshape(24, 32)
    return out


# ------------------------------------------------------------------- decode

WROWS = 16              # decode word window, (WROWS, 128) u32 word rows:
#                         8-row-aligned start <= 4095 B behind the cursor +
#                         worst-case per-row consumption 2*W + word spill
#                         <= 6148 B = 12.01 rows


def _fused_step(body_ref, tab_ref, m_ref, syms_ref, ovf_ref, x_vref,
                cur_sref, h, WR, NROWS):
    """One grid step of the fused (groups == ROWS_R) decode: 8192
    independent states advance together — see _build_rans_decode_kernel."""
    W8 = ROWS_R * W_LANES
    m = m_ref[0, 0, 0]
    tab_i = tab_ref[0].astype(jnp.int32)               # (96, 128)
    tab_planes = jnp.concatenate(
        [(tab_i & 255).astype(jnp.bfloat16),
         (tab_i >> 8).astype(jnp.bfloat16)], axis=0)   # (192, 128)

    lam = jax.lax.broadcasted_iota(jnp.int32, (1, W8), 1)
    active = (h * W8 + lam) < m

    x = x_vref[...]                                    # (1, W8)
    slot = x & (M_TOT - 1)
    io128 = jax.lax.broadcasted_iota(jnp.int32, (128, W8), 0)
    io32 = jax.lax.broadcasted_iota(jnp.int32, (32, W8), 0)
    oh_lo = ((slot & 127) == io128).astype(jnp.bfloat16)
    oh_hi = ((slot >> 7) == io32).astype(jnp.float32)
    m1 = jnp.dot(tab_planes, oh_lo,
                 preferred_element_type=jnp.float32)   # (192, W8)

    def _sel(lo_rows, hi_rows_):
        v = jnp.sum(oh_hi * m1[lo_rows:lo_rows + 32], axis=0,
                    keepdims=True).astype(jnp.int32)
        vh = jnp.sum(oh_hi * m1[hi_rows_:hi_rows_ + 32], axis=0,
                     keepdims=True).astype(jnp.int32)
        return v + (vh << 8)

    sym = _sel(0, 96)
    fs = _sel(32, 128)
    rem = _sel(64, 160)
    xp = fs * (x >> PROB_BITS) + rem

    nb = jnp.where(active,
                   (xp < RANS_L).astype(jnp.int32)
                   + (xp < (RANS_L >> 8)).astype(jnp.int32), 0)
    incl = _cumsum_lanes(nb, W8)
    pos = cur_sref[0] + incl - nb
    total = incl[0, W8 - 1]

    # narrow-window miss: clamp the gathers (results become garbage) and
    # flag — the caller re-runs the whole decode with the wide variant.
    # The window starts 8-row aligned <= 4095 B behind the cursor.
    row0 = (cur_sref[0] >> 9) & ~7
    cap = (row0 + WR) * 512 - 4                        # last safe byte + 3
    ovf_ref[0, 0, 0] |= jnp.int32(cur_sref[0] + total + 1 > cap)
    pos = jnp.minimum(pos, cap - 1)

    del NROWS  # wrapper pads every body by the WIDE window, so row0 + WR
    #            stays in bounds for both variants
    w0w = row0 * 128
    win = body_ref[0, pl.ds(pl.multiple_of(row0, 8), WR), :]
    win_i = win.astype(jnp.int32)                      # (WR, 128) words
    widx_a = (pos >> 2) - w0w
    widx_b = ((pos + 1) >> 2) - w0w
    widx2 = jnp.concatenate([widx_a, widx_b], axis=1)  # (1, 2*W8)
    bsel2 = jnp.concatenate([pos & 3, (pos + 1) & 3], axis=1)
    io128_2 = jax.lax.broadcasted_iota(jnp.int32, (128, 2 * W8), 0)
    iowr_2 = jax.lax.broadcasted_iota(jnp.int32, (WR, 2 * W8), 0)
    olo2 = ((widx2 & 127) == io128_2).astype(jnp.bfloat16)
    ohi2 = widx2 >> 7
    planes = jnp.concatenate(
        [((win_i >> (8 * k)) & 255).astype(jnp.bfloat16)
         for k in range(4)], axis=0)                   # (4*WR, 128)
    prod = jax.lax.dot_general(
        planes, olo2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (4*WR, 2*W8)
    rowsel = (iowr_2 == ohi2).astype(jnp.float32)
    sels = [jnp.sum(rowsel * prod[k * WR:(k + 1) * WR], axis=0,
                    keepdims=True).astype(jnp.int32)
            for k in range(4)]
    byte2 = jnp.where(
        bsel2 < 2,
        jnp.where(bsel2 == 0, sels[0], sels[1]),
        jnp.where(bsel2 == 2, sels[2], sels[3]))
    b1 = byte2[:, :W8]
    b2 = byte2[:, W8:]

    x1 = jnp.where(nb >= 1, (xp << 8) | b1, xp)
    x2 = jnp.where(nb == 2, (x1 << 8) | b2, x1)
    x_vref[...] = jnp.where(active, x2, x)
    cur_sref[0] = cur_sref[0] + total

    symz = jnp.where(active, sym, 0)
    for r in range(ROWS_R):
        syms_ref[0, 0, r, :] = symz[0, r * W_LANES:(r + 1) * W_LANES]


@functools.lru_cache(maxsize=16)
def _build_rans_decode_kernel(B, NPAD, BWORDS, interpret, groups=1,
                              wide=False):
    """``groups`` mirrors the encode kernel: per-row interleave-state rows
    (format nways = groups * W_LANES) break the serial row chain.

    With ``groups == ROWS_R`` the whole grid step is FUSED: all 8 rows'
    states are independent, so slot lookups, renorm counts and byte
    positions for all 8192 symbols are computed up front and the step runs
    as one flat (1, 8192) program — no serial row chain at all (r5: the
    per-row form spent ~half its time in inter-segment dependency stalls).
    The fused fetch runs at TWO window sizes: the narrow default (16 word
    rows — covers >= 4093 bytes/step past the 8-row-alignment slack,
    far above the ~1 KB a compressed step actually consumes) clamps its
    gathers and flags ``ovf`` when a step consumes more; the wrapper then
    re-runs the whole decode with ``wide=True`` (48 rows — the provable
    2-bytes-per-symbol worst case) via lax.cond, so the escalation stays
    inside one jit with no host round trip.
    """
    assert groups in (1, ROWS_R)
    n_steps = NPAD // CH_R
    NROWS = BWORDS // 128
    fused = groups == ROWS_R
    WR = (48 if wide else WROWS) if fused else WROWS

    def kernel(body_ref, tab_ref, st_ref, m_ref, syms_ref, ovf_ref,
               x_vref, cur_sref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            if fused:
                x_vref[...] = st_ref[0].astype(jnp.int32).reshape(
                    1, ROWS_R * W_LANES)
            else:
                x_vref[...] = st_ref[0].astype(jnp.int32)
            cur_sref[0] = 0          # bytes consumed (reversed-body coords)
            ovf_ref[0, 0, 0] = 0

        if fused:
            _fused_step(body_ref, tab_ref, m_ref, syms_ref, ovf_ref,
                        x_vref, cur_sref, h, WR, NROWS)
            return

        m = m_ref[0, 0, 0]
        tab = tab_ref[0]                                   # (96, 128) f32
        # table values are 12-bit: split into byte planes so the lookup
        # matmul runs bf16 (0..255 integers are exact in bf16; the f32
        # single-matmul form needed precision=HIGHEST = the 3-pass path,
        # which made this kernel MXU-bound)
        tab_i = tab.astype(jnp.int32)
        tab_planes = jnp.concatenate(
            [(tab_i & 255).astype(jnp.bfloat16),
             (tab_i >> 8).astype(jnp.bfloat16)], axis=0)   # (192, 128)
        lio = jax.lax.broadcasted_iota(jnp.int32, (1, W_LANES), 1)
        io128 = jax.lax.broadcasted_iota(jnp.int32, (128, W_LANES), 0)
        io32 = jax.lax.broadcasted_iota(jnp.int32, (32, W_LANES), 0)
        io128_2 = jax.lax.broadcasted_iota(jnp.int32, (128, 2 * W_LANES), 0)
        io16_2 = jax.lax.broadcasted_iota(jnp.int32, (WROWS, 2 * W_LANES), 0)

        for r in range(ROWS_R):
            gidx0 = (h * ROWS_R + r) * W_LANES
            active = (gidx0 + lio) < m

            g = r if groups > 1 else 0
            x = x_vref[g:g + 1, :]
            slot = x & (M_TOT - 1)
            # ---- (sym, freq, slot - cum) by slot: bilinear radix lookup ----
            oh_lo = ((slot & 127) == io128).astype(jnp.bfloat16)
            oh_hi = ((slot >> 7) == io32).astype(jnp.float32)
            m1 = jnp.dot(tab_planes, oh_lo,
                         preferred_element_type=jnp.float32)   # (192, W)
            def _sel(lo_rows, hi_rows_):
                v = jnp.sum(oh_hi * m1[lo_rows:lo_rows + 32], axis=0,
                            keepdims=True).astype(jnp.int32)
                vh = jnp.sum(oh_hi * m1[hi_rows_:hi_rows_ + 32], axis=0,
                             keepdims=True).astype(jnp.int32)
                return v + (vh << 8)
            sym = _sel(0, 96)
            fs = _sel(32, 128)
            rem = _sel(64, 160)
            xp = fs * (x >> PROB_BITS) + rem

            # ---- renormalization: nb depends on xp alone ----
            # (fs >= 1 so xp >= x>>12 >= 2^11; two bytes always reach L)
            nb = jnp.where(active,
                           (xp < RANS_L).astype(jnp.int32)
                           + (xp < (RANS_L >> 8)).astype(jnp.int32), 0)
            incl = _cumsum_lanes(nb, W_LANES)
            pos = cur_sref[0] + incl - nb       # first-byte position, bytes
            total = incl[0, W_LANES - 1]

            # ---- fetch b1@pos, b2@pos+1 with ONE stacked matmul ----
            # window = 16 sublane rows of 128 words, start 8-row aligned
            # behind the cursor; both gathers' one-hot columns concatenate
            # along lanes, the window's lo/hi 16-bit halves stack along M
            # (all <= 128 rows = one MXU pass), so the whole fetch is a
            # single (32,128)@(128,2W) product vs the 24 M-padded matmuls
            # of the per-segment loop it replaces.
            row0 = (cur_sref[0] >> 9) & ~7
            w0w = row0 * 128
            win = body_ref[0, pl.ds(pl.multiple_of(row0, 8), WROWS), :]
            win_i = win.astype(jnp.int32)            # (WROWS, 128) words
            widx_a = (pos >> 2) - w0w                # in-window word index
            widx_b = ((pos + 1) >> 2) - w0w
            widx2 = jnp.concatenate([widx_a, widx_b], axis=1)  # (1, 2W)
            bsel2 = jnp.concatenate([pos & 3, (pos + 1) & 3], axis=1)
            olo2 = ((widx2 & 127) == io128_2).astype(jnp.bfloat16)
            ohi2 = widx2 >> 7                        # window row, < WROWS
            # window words split into FOUR byte planes (exact in bf16);
            # the byte at pos is then plane_(pos&3) of word pos>>2 — a
            # 4-way select, no shift reconstruction
            planes = jnp.concatenate(
                [((win_i >> (8 * k)) & 255).astype(jnp.bfloat16)
                 for k in range(4)], axis=0)         # (4*WROWS, 128)
            prod = jax.lax.dot_general(
                planes, olo2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (4*WROWS, 2W)
            rowsel = (io16_2 == ohi2).astype(jnp.float32)
            sels = [jnp.sum(rowsel * prod[k * WROWS:(k + 1) * WROWS],
                            axis=0, keepdims=True).astype(jnp.int32)
                    for k in range(4)]
            byte2 = jnp.where(
                bsel2 < 2,
                jnp.where(bsel2 == 0, sels[0], sels[1]),
                jnp.where(bsel2 == 2, sels[2], sels[3]))
            b1 = byte2[:, :W_LANES]
            b2 = byte2[:, W_LANES:]

            x1 = jnp.where(nb >= 1, (xp << 8) | b1, xp)
            x2 = jnp.where(nb == 2, (x1 << 8) | b2, x1)
            x_vref[g:g + 1, :] = jnp.where(active, x2, x)
            cur_sref[0] = cur_sref[0] + total

            syms_ref[0, 0, r, :] = jnp.where(active, sym, 0)[0]

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, NROWS, 128), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 96, 128), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, W_LANES), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ROWS_R, W_LANES), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_steps, ROWS_R, W_LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, ROWS_R * W_LANES) if fused
                                   else (groups, W_LANES), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


def rans_decode_pallas(body_rev, states, m, npad, tab, interpret=None,
                       groups=1):
    """Device interleaved-rANS symbol decode.

    ``body_rev`` (B, BW) u8 — the rANS byte stream REVERSED (so the kernel
    reads forward), zero-padded to a multiple of 512 bytes; internally
    packed 4 bytes per i32 word.  ``states`` (B, groups*W_LANES) u32/i32
    initial states (the stream's ``state[W]`` field, W = groups*W_LANES).
    ``m`` (B,) i32 token counts.
    ``npad`` — static token capacity (multiple of CH_R) >= max(m).
    ``tab`` (B, 96, 128) f32 slot tables from :func:`decode_tables_radix`.
    Returns syms (B, npad) i32 (pad rows 0).

    The caller reconstructs bytes from symbols + the xbits stream
    (codecs/rans decode path) — host memset-class work; the per-symbol rANS
    math all runs here.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, BW = body_rev.shape
    assert BW % 512 == 0 and npad % CH_R == 0
    # the kernel always reads full word windows, and the cursor can sit at
    # the body's very end: pad every body by one full window (48 rows = the
    # fused path's worst-case window; covers the per-row path's 16 too)
    pad = 48 * 512
    body_rev = jnp.pad(body_rev, ((0, 0), (0, pad)))
    BW = BW + pad
    words = jax.vmap(lambda v: jax.lax.bitcast_convert_type(
        v.reshape(BW // 4, 4), jnp.int32).reshape(BW // 4))(body_rev)
    call = _build_rans_decode_kernel(B, npad, BW // 4, bool(interpret),
                                     groups=groups)
    args = (words.reshape(B, BW // 512, 128),
            jnp.asarray(tab),
            jnp.asarray(states).astype(jnp.int32)
            .reshape(B, groups, W_LANES),
            jnp.asarray(m).reshape(B, 1, 1).astype(jnp.int32))
    syms, ovf = call(*args)
    if groups == ROWS_R:
        # narrow-window miss (a step consumed > ~4 KB): re-run the whole
        # decode at the worst-case window, still inside the jit
        call_w = _build_rans_decode_kernel(B, npad, BW // 4,
                                           bool(interpret), groups=groups,
                                           wide=True)
        syms = jax.lax.cond(
            jnp.any(ovf != 0),
            lambda ops: call_w(*ops)[0],
            lambda ops: syms,
            args)
    return syms.reshape(B, npad)


def decode_tables_radix(freq: np.ndarray) -> np.ndarray:
    """(96, 128) f32 slot tables for :func:`rans_decode_pallas`: for slot
    0..4095 laid out [slot>>7 (32 rows), slot&127], rows 0..31 = symbol,
    32..63 = freq[symbol], 64..95 = slot - cum[symbol] (the decode
    remainder)."""
    freq = np.asarray(freq, np.int64)
    cum = np.zeros(freq.size + 1, np.int64)
    cum[1:] = np.cumsum(freq)
    slot2sym = np.repeat(np.arange(freq.size), freq)
    if slot2sym.size != M_TOT:  # corrupt table (sum != 4096)
        raise ValueError("TPU-rANS stream corrupt (frequency table)")
    fs = freq[slot2sym]
    rem = np.arange(M_TOT) - cum[slot2sym]
    out = np.zeros((96, 128), np.float32)
    out[0:32] = slot2sym.reshape(32, 128)
    out[32:64] = fs.reshape(32, 128)
    out[64:96] = rem.reshape(32, 128)
    return out


# ------------------------------------------------- symbol-mode histogram

CHH = 4096              # values per histogram grid step


@functools.lru_cache(maxsize=16)
def _build_hist_kernel(B, NPAD, interpret):
    n_steps = NPAD // CHH

    def kernel(v_ref, m_ref, hist_ref, acc_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            acc_vref[...] = jnp.zeros_like(acc_vref)

        m = m_ref[0, 0, 0]
        # (8, CHH/8) tile -> (1, CHH) row-major lane merge (512-aligned)
        v = v_ref[0, 0].astype(jnp.int32).reshape(1, CHH)
        lio = jax.lax.broadcasted_iota(jnp.int32, (1, CHH), 1)
        active = (h * CHH + lio) < m
        io64a = jax.lax.broadcasted_iota(jnp.int32, (64, CHH), 0)
        io64b = jax.lax.broadcasted_iota(jnp.int32, (64, CHH), 0)
        # one-hot planes; inactive lanes contribute to NO bin (hi plane 0)
        oh_hi = (((v >> 6) == io64a) & active).astype(jnp.float32)
        oh_lo = ((v & 63) == io64b).astype(jnp.float32)
        # hist[hi, lo] += sum_i oh_hi[hi, i] * oh_lo[lo, i]: NT matmul;
        # 0/1 operands -> DEFAULT MXU precision exact (f32 accumulation)
        acc_vref[...] = acc_vref[...] + jax.lax.dot_general(
            oh_hi, oh_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(h == n_steps - 1)
        def _():
            hist_ref[0] = acc_vref[...].astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, 8, CHH // 8), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 64, 64), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, 64, 64), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((64, 64), jnp.float32)],
        interpret=bool(interpret),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_call(values, m, interpret):
    B, NPAD = values.shape
    call = _build_hist_kernel(B, NPAD, bool(interpret))
    hist = call(values.reshape(B, NPAD // CHH, 8, CHH // 8),
                m.reshape(B, 1, 1).astype(jnp.int32))[0]
    return hist.reshape(B, 4096)


def hist_symbols_pallas(values, m, interpret=None):
    """Device histogram of 12-bit symbols: ``values`` (B, NPAD) i32 < 4096
    (NPAD % 4096 == 0; entries beyond ``m`` ignored) -> (B, 4096) i32 via a
    radix NT-matmul (one (64, n)x(64, n)^T product per grid step)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _hist_call(values, jnp.asarray(m), bool(interpret))
