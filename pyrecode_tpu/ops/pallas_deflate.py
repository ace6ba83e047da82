"""Pallas TPU kernels for the dynamic-Huffman deflate entropy stage.

This is the device side of the TPU entropy backend (the reference runs its
entire entropy stage on host CPU, recode_compressors.py:103-118).  The
encoder is the data-parallel reformulation documented in
codecs/dyndeflate.py; output streams are byte-identical to the native host
encoder ``deflate_sparse_dyn``.

Two passes with an O(alphabet)-only host step between them:

**Pass A — tokenize** (grid step = 16384 stream bytes as an (8, 2048) tile):
  * run structure from two scans: run *start* via a prefix-max over change
    positions (in-row log-shift scan + an unrolled scalar chain across
    sublanes + a cross-chunk SMEM carry), run *end* via a suffix-min over the
    current tile plus the next tile as halo (the C encoder's take-adjustment
    only perturbs the last <=520 bytes of a run, so one-tile lookahead with a
    clamp at 522 is exact);
  * per-byte token decision (literal / dist-1 match / covered) in closed
    form — see codecs/dyndeflate.py for the rules;
  * 286-symbol histogram via a radix-split NT matmul: one-hot of sym&31
    (32 x 4096) contracted with one-hot of sym>>5 (16 x 4096) on the MXU;
  * adler32 in carried (A, B) SMEM scalars with per-row mod-65521 reduction.

**Host** (between passes): canonical Huffman tables + dynamic block header
via the native library's own builders (bit-identical), and the per-token
(value, bit-count) LUTs.

**Pass B — assemble** (grid step = CH_B tokens, ONE step-level scatter):
  * LUT lookup via a bilinear one-hot: M1 = LUT(48x32) @ onehot(lo) at
    precision=HIGHEST (values <= 21 bits are exact f32) and two masked
    sublane reductions against a 24-row onehot(hi) — no gathers;
  * bit offsets via lane cumsum with a carried bit phase; each token's
    shifted value (<= 21+7 bits) contributes <= 4 bytes; the 4 byte planes
    A_k[(th, token)] = contrib_k * onehot(target>>7) are STACKED along the
    M dimension (the MXU pads M to 128 rows, so a narrow window fits all 4
    planes in ONE NT matmul) and contracted with onehot(target&127)
    (128 x CH_B) — disjoint bit ranges make f32 sums exact (<= 255); each
    plane's (NW, 128) slab merges to a (1, NW*128) byte row, plane k rolled
    right by k lanes;
  * the merged row appends at the running output offset via the 128-aligned
    window store with VMEM tail carry shared with the L1 encode kernel
    (pallas_encode._store_window) — the variable-bit-width generalization of
    that compaction machinery.  The whole step is one serial region (vs 16
    sub-chunk scatters previously: 10x fewer carried-scalar dependencies).

The end-of-block code, byte alignment, stored-block fallback and adler
trailer are host-side O(1) splices (codecs/dyndeflate.finish_stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode import _compact_chunk, _cumsum_lanes, _store_window

CH_A = 16384         # pass-A bytes per grid step ((8, 2048) tile: per-step
ROWS_A, SUB_A = 8, 2048   # fixed costs amortize; scans grow only log-width)
# r5 hw sweep (tools/probe_cha.py): a (16, 2048) tile makes the DENSE
# tokenize 34% faster (1.12 -> 0.74 ms per 8 MB batch — fixed step costs
# halve) but the FUSED tokenize+compact 5% slower (1.96 -> 2.06 ms — the
# per-step compact/store machinery doubles in width and eats the win).
# Production's hot bitmap path is the fused form, so the default stays
# (8, 2048); revisit if the dense form ever dominates a chain.
CH_B = 4096          # pass-B tokens per grid step.  r5 hw sweep: 8192 is a
#                      wash (bm assemble 2.80 -> 2.93, pk 2.49 -> 2.19
#                      ms/batch) — the scatter matmul volume scales with
#                      CH_B x NW, so bigger steps buy nothing; the serial
#                      step chain is NOT the bottleneck.
MAX_TOKEN_BITS = 21  # lit code <= 15; match = len code 15 + extra 5 + dist 1


def _rows_for_bits(total_bits: int) -> int:
    """Scatter-window sublane rows covering ``total_bits`` step bits: 7 phase
    bits + the bits themselves, plus 3 spill bytes for the k-shifted byte
    planes, rounded up to 128-lane rows and then to a multiple of 8 (the
    assemble kernel stacks byte planes along sublanes and slices the matmul
    result at NW-row offsets, which must stay 8-aligned)."""
    rows = -(-((7 + total_bits) // 8 + 4) // 128)
    return -(-rows // 8) * 8


# widest step-local byte window (21 bits per token = the worst case)
WIN_ROWS_MAX = _rows_for_bits(CH_B * MAX_TOKEN_BITS)
# narrower presets: the scatter matmuls cost O(ceil(4*win_rows/128) * CH_B)
# (planes stack along the M dimension, which the MXU pads to 128), and real
# streams average ~4-9 bits/token, far below the 21-bit worst case.  The
# kernel flags any step whose bits exceed the window (caller re-runs wide),
# so narrow windows are a speed heuristic, never a correctness bound.  The
# first two presets keep 4*NW <= 128 = ONE stacked scatter matmul.
WIN_ROWS_PRESETS = (_rows_for_bits(int(CH_B * 4.5)),    # ~4.5 bits/token
                    _rows_for_bits(int(CH_B * 6.1)),    # ~6.1 bits/token
                    _rows_for_bits(int(CH_B * 8.4)),    # ~8.4 bits/token
                    _rows_for_bits(13 * CH_B),          # ~13 bits/token
                    WIN_ROWS_MAX)
WIN_B = WIN_ROWS_MAX * 128                  # widest window, for bounds

_INF = 1 << 30
_SENT = 300   # byte sentinel (breaks runs at stream boundaries)
_ADLER_MOD = 65521

# deflate length-code bases (codecs/dyndeflate.LEN_BASE)
_LEN_BASE = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
             51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)

NO_TOKEN = 512
SYM_NONE = 287       # histogram slot for covered bytes (unused by real syms)


def _premax_lanes(x, n, fill):
    """Inclusive prefix-max along lanes via log-shift rolls."""
    io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    d = 1
    while d < n:
        rolled = pltpu.roll(acc, d, axis=1)
        acc = jnp.maximum(acc, jnp.where(io >= d, rolled, fill))
        d *= 2
    return acc


def _sufmin_lanes(x, n, fill):
    """Inclusive suffix-min along lanes via log-shift rolls."""
    io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    acc = x
    d = 1
    while d < n:
        rolled = pltpu.roll(acc, n - d, axis=1)
        acc = jnp.minimum(acc, jnp.where(io < n - d, rolled, fill))
        d *= 2
    return acc


def _row_broadcast(scalars, shape):
    """(rows, lanes) array whose row r equals the r-th scalar."""
    rio = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    out = jnp.zeros(shape, jnp.int32)
    for r, s in enumerate(scalars):
        out = out + s * (rio == r).astype(jnp.int32)
    return out


def _shift_prev(x, first):
    """prev[i] = x[i-1] in row-major (rows, lanes) order; prev[0,0]=first."""
    rows = x.shape[0]
    rl = pltpu.roll(x, 1, axis=1)                # [r, 0] <- x[r, L-1]
    lane0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0
    if rows > 1:
        wrap = pltpu.roll(rl, 1, axis=0)         # [r, 0] <- x[r-1, L-1]
        prev = jnp.where(lane0, wrap, rl)
    else:
        prev = rl
    row0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == 0
    return jnp.where(lane0 & row0, first, prev)


def _tile_stats(x_eff, gidx, n, carry_prev):
    """change flags + (change ? gidx : fill) candidates for one (8,512) tile."""
    prev = _shift_prev(x_eff, carry_prev)
    change = x_eff != prev
    cand_e = jnp.where((gidx >= n) | change, gidx, _INF)
    return change, cand_e


@functools.lru_cache(maxsize=32)
def _build_tokenize_kernel(B, NPAD, interpret, C1=0, OUT=0):
    """Pass-A kernel builder.

    ``C1 == 0``: emit the full per-byte inverted token stream (dense mode).
    ``C1 > 0``: FUSED tokenize+compact — never materialize the per-byte
    stream; each (8, 2048) tile's tokens are packed left per row (butterfly,
    capacity C1 per 2048-lane row), concatenated, and appended to a dense
    i32 output of ``OUT`` slots via the shared window store.  Saves the
    full-stream HBM round trip that the separate compaction pass paid.
    """
    n_chunks = NPAD // CH_A
    compact = C1 > 0
    C2 = ROWS_A * C1
    WIN = C2 + 128

    def kernel(x_ref, xn_ref, len_ref, *refs):
        if compact:
            (lti_ref, comp_ref, hist_ref, adA_ref, adB_ref, cnt_ref,
             covf_ref, prevb_sref, carrys_sref, adler_sref, hist_vref,
             off_sref, tail_vref) = refs
        else:
            (lut_ref, hist_ref, adA_ref, adB_ref,
             prevb_sref, carrys_sref, adler_sref, hist_vref) = refs
        h = pl.program_id(1)
        n = len_ref[0, 0, 0]

        @pl.when(h == 0)
        def _():
            prevb_sref[0] = -1          # != any byte: stream starts a run
            carrys_sref[0] = -1
            adler_sref[0] = 1           # adler A
            adler_sref[1] = 0           # adler B
            hist_vref[...] = jnp.zeros_like(hist_vref)
            if compact:
                off_sref[0] = 0
                covf_ref[0, 0, 0] = 0
                tail_vref[...] = jnp.zeros_like(tail_vref)
                comp_ref[...] = jnp.zeros_like(comp_ref)

        x = x_ref[0, 0].astype(jnp.int32)       # (ROWS_A, SUB_A)
        xn = xn_ref[0, 0].astype(jnp.int32)
        rio = jax.lax.broadcasted_iota(jnp.int32, (ROWS_A, SUB_A), 0)
        lio = jax.lax.broadcasted_iota(jnp.int32, (ROWS_A, SUB_A), 1)
        base = h * CH_A
        gidx = base + rio * SUB_A + lio
        gidx_n = gidx + CH_A

        x_eff = jnp.where(gidx < n, x, _SENT)
        xn_eff = jnp.where(gidx_n < n, xn, _SENT)

        change, cand_e = _tile_stats(x_eff, gidx, n, prevb_sref[0])
        # halo tile: its prev[0,0] is this tile's last byte
        _, cand_e_n = _tile_stats(xn_eff, gidx_n, n,
                                  x_eff[ROWS_A - 1, SUB_A - 1])

        # ---- run starts: prefix-max of change positions ----
        cand_s = jnp.where(change, gidx, -1)
        s_inrow = _premax_lanes(cand_s, SUB_A, jnp.int32(-1))
        row_max = jnp.max(cand_s, axis=1, keepdims=True)        # (ROWS_A, 1)
        run_s = carrys_sref[0]
        pre = []
        for r in range(ROWS_A):
            pre.append(run_s)
            run_s = jnp.maximum(run_s, row_max[r, 0])
        s = jnp.maximum(s_inrow, _row_broadcast(pre, (ROWS_A, SUB_A)))
        carrys_sref[0] = run_s
        prevb_sref[0] = x_eff[ROWS_A - 1, SUB_A - 1]

        # ---- run ends: exclusive suffix-min over [tile || halo tile] ----
        e_inrow_incl = _sufmin_lanes(cand_e, SUB_A, _INF)
        e_inrow = jnp.where(lio < SUB_A - 1,
                            pltpu.roll(e_inrow_incl, SUB_A - 1, axis=1), _INF)
        rmin_cur = jnp.min(cand_e, axis=1, keepdims=True)
        rmin_nxt = jnp.min(cand_e_n, axis=1, keepdims=True)
        run_e = _INF
        for r in range(ROWS_A):
            run_e = jnp.minimum(run_e, rmin_nxt[r, 0])
        suf = [None] * ROWS_A
        for r in range(ROWS_A - 1, -1, -1):
            suf[r] = run_e
            run_e = jnp.minimum(run_e, rmin_cur[r, 0])
        e = jnp.minimum(e_inrow, _row_broadcast(suf, (ROWS_A, SUB_A)))

        # ---- per-byte token decision ----
        p = gidx - s
        run = e - s
        d = jnp.minimum(e - gidx, 522)
        is_lit = (p == 0) | (run < 4)
        q = p - 1
        qm = q % 258
        take0 = jnp.where(d >= 261, 258, jnp.where(d >= 259, 255, d))
        m0 = (qm == 0) & (d >= 3)
        m255 = (qm == 255) & ((d == 4) | (d == 5))
        take = jnp.where(m255, d, take0)
        is_match = (~is_lit) & (m0 | m255)
        valid = gidx < n

        lut = jnp.where(is_lit, x, jnp.where(is_match, 256 + take - 3,
                                             NO_TOKEN))
        lut = jnp.where(valid, lut, NO_TOKEN)
        # the INVERTED token stream tok = NO_TOKEN - lut (tokens -> [1, 512],
        # covered/pad -> 0): the form both consumers want (compaction treats
        # nonzero as foreground; assembly un-inverts in-kernel)
        tok_inv = NO_TOKEN - lut
        if compact:
            m2 = (tok_inv != 0).astype(jnp.int32)
            acc, ccnt, ovf1 = _compact_chunk(m2, tok_inv, ROWS_A, SUB_A,
                                             C1, C2, lti=lti_ref[...])
            ovf_s = _store_window(comp_ref, tail_vref, off_sref, acc, ccnt,
                                  OUT, WIN, C2)
            covf_ref[0, 0, 0] |= jnp.int32(ovf1 | ovf_s)
        else:
            # u16: half the HBM traffic of an i32 stream
            lut_ref[0, 0] = tok_inv.astype(jnp.uint16)

        c = jnp.zeros_like(take)
        for b_ in _LEN_BASE[1:]:
            c = c + (take >= b_).astype(jnp.int32)
        sym = jnp.where(is_lit, x, jnp.where(is_match, 257 + c, SYM_NONE))
        sym = jnp.where(valid, sym, SYM_NONE)

        # ---- histogram via radix-split NT matmul ----
        # bf16 one-hots: 0/1 is exact in bf16 and the MXU runs bf16 inputs
        # at full rate (f32 inputs take the 3-pass path); accumulation stays
        # f32 via preferred_element_type, exact for counts <= 2^24
        sym_row = sym.reshape(1, CH_A)
        io32 = jax.lax.broadcasted_iota(jnp.int32, (32, CH_A), 0)
        oh_lo = ((sym_row & 31) == io32).astype(jnp.bfloat16)
        io16 = jax.lax.broadcasted_iota(jnp.int32, (16, CH_A), 0)
        oh_hi = ((sym_row >> 5) == io16).astype(jnp.bfloat16)
        h2d = jax.lax.dot_general(oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        hist_vref[...] = hist_vref[...] + h2d.astype(jnp.int32)

        # ---- adler32 ----
        # i32 bounds: row sums are reduced mod 65521 before the weight
        # multiply, so products stay <= CH_A * 65520 ~ 1.07e9 < 2^31; the
        # j-weighted row sum is <= SUB_A^2/4 * 255 ~ 1.07e9 as well
        xm = jnp.where(valid, x, 0)
        L_chunk = jnp.clip(n - base, 0, CH_A)
        sx_r = jnp.sum(xm, axis=1, keepdims=True)          # (ROWS_A, 1)
        sjx_r = jnp.sum(xm * lio, axis=1, keepdims=True) % _ADLER_MOD
        a0 = adler_sref[0]
        b0 = adler_sref[1]
        badd = jnp.int32(0)
        s_all = jnp.int32(0)
        for r in range(ROWS_A):
            term = (L_chunk - r * SUB_A) * (sx_r[r, 0] % _ADLER_MOD) \
                - sjx_r[r, 0]
            badd = (badd + term) % _ADLER_MOD
            s_all = s_all + sx_r[r, 0]
        b1 = (b0 + L_chunk * a0 % _ADLER_MOD + badd) % _ADLER_MOD
        a1 = (a0 + s_all) % _ADLER_MOD
        adler_sref[0] = a1
        adler_sref[1] = b1

        @pl.when(h == n_chunks - 1)
        def _():
            hist_ref[0] = hist_vref[...]
            adA_ref[0, 0, 0] = adler_sref[0]
            adB_ref[0, 0, 0] = adler_sref[1]
            if compact:
                cnt_ref[0, 0, 0] = off_sref[0]

    smem11 = pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.SMEM)
    if compact:
        out_specs = [
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 32), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem11, smem11, smem11, smem11,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 16, 32), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ]
        scratch = [pltpu.SMEM((1,), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32),
                   pltpu.SMEM((2,), jnp.int32),
                   pltpu.VMEM((16, 32), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32),
                   pltpu.VMEM((1, WIN), jnp.int32)]
    else:
        out_specs = [
            pl.BlockSpec((1, 1, ROWS_A, SUB_A), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 32), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem11, smem11,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((B, n_chunks, ROWS_A, SUB_A), jnp.uint16),
            jax.ShapeDtypeStruct((B, 16, 32), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ]
        scratch = [pltpu.SMEM((1,), jnp.int32),
                   pltpu.SMEM((1,), jnp.int32),
                   pltpu.SMEM((2,), jnp.int32),
                   pltpu.VMEM((16, 32), jnp.int32)]

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, ROWS_A, SUB_A), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ROWS_A, SUB_A),
                         lambda b, h: (b, jnp.minimum(h + 1, n_chunks - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec((512, 512), lambda b, h: (0, 0),
                           memory_space=pltpu.VMEM)] if compact else []),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tokenize_call(streams, lengths, interpret):
    B, NPAD = streams.shape
    call = _build_tokenize_kernel(B, NPAD, bool(interpret))
    s4 = streams.reshape(B, NPAD // CH_A, ROWS_A, SUB_A)
    tok, hist, adA, adB = call(s4, s4, lengths.reshape(B, 1, 1).astype(jnp.int32))
    adler = (adB[:, 0, 0].astype(jnp.uint32) << 16) | adA[:, 0, 0].astype(jnp.uint32)
    return tok.reshape(B, NPAD), hist.reshape(B, 512), adler


@functools.partial(jax.jit, static_argnames=("c1", "out_bound", "interpret"))
def _tokenize_compact_call(streams, lengths, c1, out_bound, interpret):
    B, NPAD = streams.shape
    call = _build_tokenize_kernel(B, NPAD, bool(interpret), C1=c1,
                                  OUT=out_bound)
    from .pallas_encode import make_lti_matrix

    s4 = streams.reshape(B, NPAD // CH_A, ROWS_A, SUB_A)
    comp, hist, adA, adB, cnt, covf = call(
        s4, s4, lengths.reshape(B, 1, 1).astype(jnp.int32),
        jnp.asarray(make_lti_matrix(512)))
    adler = (adB[:, 0, 0].astype(jnp.uint32) << 16) | adA[:, 0, 0].astype(jnp.uint32)
    return (comp[:, 0, :out_bound], hist.reshape(B, 512), adler,
            cnt[:, 0, 0], covf[:, 0, 0] != 0)


# capacity ladder for the fused tokenize+compact pass: max tokens per
# 2048-lane tile row; the top rung equals the row width, where overflow is
# impossible (escalation always terminates)
TOKEN_BUCKETS = (256, 512, 1024, SUB_A)


def token_bucket_for(density: float) -> int:
    """First fused-compact bucket for an expected token density (tokens per
    stream byte): mean per 2048-lane row + 5 sigma + 30% burst margin."""
    lam = SUB_A * min(max(density, 0.0), 1.0)
    need = 1.3 * (lam + 5.0 * max(lam, 1.0) ** 0.5)
    for b, c1 in enumerate(TOKEN_BUCKETS):
        if c1 >= need:
            return b
    return len(TOKEN_BUCKETS) - 1


def tokenize_compact_pallas(streams, lengths, bucket: int, out_bound: int,
                            interpret=None):
    """Fused pass A + A.5: tokenize and compact in one kernel.

    Like :func:`tokenize_pallas` followed by :func:`compact_tokens`, but the
    per-byte token stream never leaves VMEM — each tile's tokens are packed
    left per 2048-lane row (butterfly, capacity ``TOKEN_BUCKETS[bucket]``),
    concatenated and appended to a dense i32 stream of ``out_bound`` slots
    (multiple of CH_B; the assembly kernel consumes i32 directly).

    Returns (dense_tok (B, out_bound) i32 [inverted tokens, pad 0], hist
    (B, 512) i32, adler (B,) u32, counts (B,) i32, overflow (B,) bool).
    Overflow = a tile row exceeded the capacity bucket OR a stream's token
    count exceeded ``out_bound``; the caller re-runs with the exact bound
    from ``hist`` and a bigger bucket (histogram/adler stay valid either
    way).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    assert out_bound % CH_B == 0
    return _tokenize_compact_call(streams, lengths,
                                  int(TOKEN_BUCKETS[bucket]), int(out_bound),
                                  bool(interpret))


def tokenize_pallas(streams, lengths, interpret=None):
    """Pass A: per-byte inverted token stream + symbol histogram + adler32.

    ``streams`` (B, NPAD) u8 with NPAD a multiple of 4096; ``lengths`` (B,)
    valid byte counts.  Returns (tok (B, NPAD) u16 where tok = NO_TOKEN -
    lut_idx, i.e. tokens in [1, 512] and covered/pad bytes 0 — the form both
    downstream passes consume directly; hist (B, 512) i32 [row-major
    (sym>>5, sym&31), EOB not yet counted]; adler (B,) u32).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _tokenize_call(streams, lengths, bool(interpret))


# ---------------------------------------------------- token compaction (A.5)

COMPACT_W = 128   # token-compaction sub-row window (capacity C1 per window)


def compact_tokens(tok, tok_bound: int, bucket: int = 0, interpret=None):
    """Squeeze the no-token slots out of a per-byte token stream.

    In a sparse stream most bytes are covered by matches, so pass A's
    output is mostly zero (no token) — yet pass B pays per SLOT.
    Compacting first makes the assembly grid proportional to the true token
    count (a 3-5x step reduction on 1%-occupancy bitmap streams).

    ``tok`` — (B, NPAD) u16 inverted token stream straight from
    :func:`tokenize_pallas` (tokens in [1, 512], covered bytes 0), which is
    exactly the "foreground values" form the L1 encode kernel's
    hierarchical compaction consumes over 128-lane sub-rows; compacted
    padding stays 0 = no token, which assembles as 0 bits.

    Returns (dense_tok (B, tok_bound) u16, counts (B,) i32, overflow (B,)
    bool).  At the top bucket (C1 = 128 = the window size) overflow is
    impossible, so bucket escalation always terminates.
    """
    from .pallas_encode import encode_l1_pallas

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, NPAD = tok.shape
    rows = NPAD // COMPACT_W
    frames = tok.reshape(B, rows, COMPACT_W)
    thr = jnp.zeros((rows, COMPACT_W), jnp.uint16)
    _, comp, counts, ovf = encode_l1_pallas(
        frames, thr, out_size=tok_bound, bucket=bucket, interpret=interpret)
    return comp, counts, ovf


def compact_bucket_for(density: float) -> int:
    """First capacity bucket to try for a given global token density.

    C1 must cover the densest 128-byte window; windows fluctuate around
    128*density, so aim ~5 sigma above the mean (escalation on overflow
    keeps this a heuristic, not a correctness bound)."""
    from .pallas_encode import CAPACITY_BUCKETS

    lam = COMPACT_W * min(max(density, 0.0), 1.0)
    need = lam + 5.0 * max(lam, 1.0) ** 0.5
    for b, c1 in enumerate(CAPACITY_BUCKETS):
        if c1 >= need:
            return b
    return len(CAPACITY_BUCKETS) - 1


# ---------------------------------------------------------------- assembly


@functools.lru_cache(maxsize=32)
def _build_assemble_kernel(B, NPAD, OUT, NW, interpret):
    n_steps = NPAD // CH_B
    WINB = NW * 128            # scatter window bytes (t0 >> 7 < NW)
    WIN = WINB + 128
    # a step fits iff every scattered byte lands inside the window: the last
    # token ends at sub_total bits, its k=3 plane byte at (sub_total-1)//8+3
    bit_cap = (WINB - 4) * 8

    def kernel(lut_ref, lutab_ref, phase_ref, part_ref,
               comp_ref, totbits_ref, ovf_ref,
               off_sref, bit_sref, part_sref, tot_sref, tail_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            bit_sref[0] = phase_ref[0, 0, 0]
            part_sref[0] = part_ref[0, 0, 0]
            tot_sref[0] = phase_ref[0, 0, 0]
            ovf_ref[0, 0, 0] = 0
            tail_vref[...] = jnp.zeros_like(tail_vref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        # the combined (48, 32) f32 LUT: rows 0..23 full token values, rows
        # 24..47 bit counts.  Values are <= 21 bits, exact in f32, and the
        # lookup matmul runs at precision=HIGHEST (bf16x6 reconstructs full
        # f32 precision — verified exact on hw by tools/probe_f32dot.py), so
        # ONE matmul + TWO masked reductions replace the previous 3-byte-
        # plane split (4 reductions over 128 sublanes + recombination).
        lutab = lutab_ref[0]                       # (48, 32) f32
        # un-invert the u16 token stream (tok = NO_TOKEN - lut, pad 0)
        lut_row = NO_TOKEN - lut_ref[0, 0].astype(jnp.int32).reshape(1, CH_B)

        # ---- step-level LUT lookup + bit cumsum over all 2048 tokens ----
        io32w = jax.lax.broadcasted_iota(jnp.int32, (32, CH_B), 0)
        io24w = jax.lax.broadcasted_iota(jnp.int32, (24, CH_B), 0)
        lo = lut_row & 31
        hi = lut_row >> 5                          # <= 16 (NO_TOKEN = 512)
        oh_lo = (lo == io32w).astype(jnp.float32)              # (32, 2048)
        oh_hi = (hi == io24w).astype(jnp.float32)              # (24, 2048)
        m1 = jnp.dot(lutab, oh_lo, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)      # (48, 2048)
        val_all = jnp.sum(oh_hi * m1[0:24], axis=0,
                          keepdims=True).astype(jnp.int32)
        bits_all = jnp.sum(oh_hi * m1[24:48], axis=0,
                           keepdims=True).astype(jnp.int32)
        gcs = _cumsum_lanes(bits_all, CH_B)                    # inclusive
        step_bits = gcs[0, CH_B - 1]

        io_w = jax.lax.broadcasted_iota(jnp.int32, (1, WINB), 1)

        # ---- ONE scatter for the whole step ----
        @pl.when(step_bits > 0)
        def _():
            bitpos = bit_sref[0]                 # phase within current byte
            off = bitpos + gcs - bits_all        # exclusive bit offsets
            sub_total = bitpos + step_bits
            # narrow-window miss: scattered bytes beyond the window are
            # silently dropped (one-hot rows don't exist), so flag the step
            # and let the caller re-run with the widest preset
            ovf_ref[0, 0, 0] |= jnp.int32(sub_total > bit_cap)
            sv = val_all << (off & 7)
            t0 = off >> 3                        # first target byte, < WINB-3
            io128s = jax.lax.broadcasted_iota(jnp.int32, (128, CH_B), 0)
            io_nw = jax.lax.broadcasted_iota(jnp.int32, (NW, CH_B), 0)
            oh_tl = ((t0 & 127) == io128s).astype(jnp.bfloat16)  # (128, CH_B)
            oh_th = ((t0 >> 7) == io_nw).astype(jnp.bfloat16)    # (NW, CH_B)
            local = part_sref[0] * (io_w == 0).astype(jnp.int32)
            # byte plane k scatters at the k=0 target; the merged row is then
            # rolled right by k.  Disjoint bit ranges of adjacent tokens keep
            # every byte sum <= 255, so bf16 operands (bytes <= 255 are
            # exact) with f32 accumulation lose nothing.  The MXU pads the
            # M dimension to 128 rows, so planes are STACKED along M into as
            # few matmuls as fit (4 separate (NW, .) matmuls cost ~4x one
            # (4*NW <= 128, .) matmul — the scatter is the kernel's dominant
            # MXU term).
            per = max(1, min(4, 128 // NW))      # planes per stacked matmul
            rows = []
            for g in range(0, 4, per):
                blocks = []
                for k in range(g, min(g + per, 4)):
                    ck = ((sv >> (8 * k)) & 255).astype(jnp.bfloat16)
                    blocks.append(oh_th * ck)
                stacked = blocks[0] if len(blocks) == 1 else \
                    jnp.concatenate(blocks, axis=0)
                o2 = jax.lax.dot_general(stacked, oh_tl,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                for j in range(len(blocks)):
                    rows.append(o2[j * NW: (j + 1) * NW]
                                .astype(jnp.int32).reshape(1, WINB))
            for k, row in enumerate(rows):
                local = local + (row if k == 0
                                 else pltpu.roll(row, k, axis=1))

            nbytes = sub_total >> 3
            part_sref[0] = jnp.sum(jnp.where(io_w == nbytes, local, 0))
            bit_sref[0] = sub_total & 7
            _store_window(comp_ref, tail_vref, off_sref, local, nbytes,
                          OUT, WIN, WINB)

        tot_sref[0] = tot_sref[0] + step_bits
        ovf_ref[0, 0, 0] |= jnp.int32(off_sref[0] > OUT)

        @pl.when(h == n_steps - 1)
        def _():
            # flush the final partial byte (if any) as one more output byte
            flush = jnp.where(io_w == 0, part_sref[0], 0)
            _store_window(comp_ref, tail_vref, off_sref, flush,
                          jnp.int32((bit_sref[0] > 0).astype(jnp.int32)),
                          OUT, WIN, WINB)
            totbits_ref[0, 0, 0] = tot_sref[0]

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, 8, CH_B // 8), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48, 32), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


@functools.partial(jax.jit, static_argnames=("out_bound", "nw", "interpret"))
def _assemble_call(tok, lutab, phase, partial, out_bound, nw,
                   interpret):
    B, NPAD = tok.shape
    call = _build_assemble_kernel(B, NPAD, out_bound, nw, bool(interpret))
    comp, totbits, ovf = call(
        tok.reshape(B, NPAD // CH_B, 8, CH_B // 8), lutab,
        phase.reshape(B, 1, 1).astype(jnp.int32),
        partial.reshape(B, 1, 1).astype(jnp.int32))
    body = comp[:, 0, :out_bound].astype(jnp.uint8)
    return body, totbits[:, 0, 0], ovf[:, 0, 0] != 0


@functools.lru_cache(maxsize=32)
def _build_assemble_par_kernel(B, NPAD, NW, interpret):
    """Parallel half of the SPLIT assembly (r5 experiment): every
    CH_B-token step scatters its bytes at bit phase 0 into its OWN
    window — no carried offset/phase/partial, so grid steps are
    independent; the thin concat kernel below shifts each window into
    its true phase (0..7 bits) and appends it.

    MEASURED NEUTRAL on hw (1.69 vs the one-kernel form's 1.49-1.83 ms
    per 4-frame 4096^2 bitmap batch; byte-identical): at production token
    bounds the serial chain is not the one-kernel form's bottleneck — the
    scatter matmul volume is.  Kept as the verified alternative (opt in
    with PYRECODE_SPLIT_ASSEMBLE=1); the hypothesis that 6 us/step of
    serial latency dominated came from a profile run with ~50% token-
    bound slack (pad steps), not a real chain cost.
    """
    n_steps = NPAD // CH_B
    WINB = NW * 128
    # leave headroom for the concat kernel's worst-case 7-bit phase shift
    bit_cap = (WINB - 4) * 8 - 7

    def kernel(lut_ref, lutab_ref, win_ref, bits_ref, ovf_ref):
        lutab = lutab_ref[0]                       # (48, 32) f32
        inv_row = lut_ref[0, 0].astype(jnp.int32).reshape(1, CH_B)
        lut_row = NO_TOKEN - inv_row
        bits_ref[0, 0, 0, 0] = 0
        ovf_ref[0, 0, 0, 0] = 0

        # token-bound slack: steps past the true token count are all pad
        # (inverted tok 0) — skip their lookup+scatter entirely
        @pl.when(jnp.max(inv_row) > 0)
        def _():
            _par_step(lut_row, lutab, win_ref, bits_ref, ovf_ref)

    def _par_step(lut_row, lutab, win_ref, bits_ref, ovf_ref):
        io32w = jax.lax.broadcasted_iota(jnp.int32, (32, CH_B), 0)
        io24w = jax.lax.broadcasted_iota(jnp.int32, (24, CH_B), 0)
        lo = lut_row & 31
        hi = lut_row >> 5
        oh_lo = (lo == io32w).astype(jnp.float32)
        oh_hi = (hi == io24w).astype(jnp.float32)
        m1 = jnp.dot(lutab, oh_lo, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        val_all = jnp.sum(oh_hi * m1[0:24], axis=0,
                          keepdims=True).astype(jnp.int32)
        bits_all = jnp.sum(oh_hi * m1[24:48], axis=0,
                           keepdims=True).astype(jnp.int32)
        gcs = _cumsum_lanes(bits_all, CH_B)
        step_bits = gcs[0, CH_B - 1]
        bits_ref[0, 0, 0, 0] = step_bits
        ovf_ref[0, 0, 0, 0] = jnp.int32(step_bits > bit_cap)

        off = gcs - bits_all                       # phase-0 bit offsets
        sv = val_all << (off & 7)
        t0 = off >> 3
        io128s = jax.lax.broadcasted_iota(jnp.int32, (128, CH_B), 0)
        io_nw = jax.lax.broadcasted_iota(jnp.int32, (NW, CH_B), 0)
        oh_tl = ((t0 & 127) == io128s).astype(jnp.bfloat16)
        oh_th = ((t0 >> 7) == io_nw).astype(jnp.bfloat16)
        per = max(1, min(4, 128 // NW))
        rows = []
        for g in range(0, 4, per):
            blocks = []
            for k in range(g, min(g + per, 4)):
                ck = ((sv >> (8 * k)) & 255).astype(jnp.bfloat16)
                blocks.append(oh_th * ck)
            stacked = blocks[0] if len(blocks) == 1 else \
                jnp.concatenate(blocks, axis=0)
            o2 = jax.lax.dot_general(stacked, oh_tl,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            for j in range(len(blocks)):
                rows.append(o2[j * NW: (j + 1) * NW].astype(jnp.int32))

        def roll_flat(x, k):
            # right-roll a (NW, 128) row-major byte image by k < 128 flat
            # positions (the window stays 2D: a (1, WINB) flat row would
            # need a lane-split reshape Mosaic rejects)
            r = pltpu.roll(x, k, axis=1)
            up = pltpu.roll(r, 1, axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            wrapped = jnp.where(lane < k, up, r)
            return jnp.where((row == 0) & (lane < k), 0, wrapped)

        local = rows[0]
        for k, row in enumerate(rows[1:], start=1):
            local = local + roll_flat(row, k)
        win_ref[0] = local.astype(jnp.uint8)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, 1, 8, CH_B // 8), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48, 32), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NW, 128), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_steps * NW, 128), jnp.uint8),
            jax.ShapeDtypeStruct((B, n_steps, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n_steps, 1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


@functools.lru_cache(maxsize=32)
def _build_assemble_cat_kernel(B, n_steps, OUT, NW, interpret):
    """Serial half of the split assembly: shift each phase-0 window into
    its true bit phase and append — one roll, a few selects and the
    shared 128-aligned store per step."""
    WINB = NW * 128
    WIN = WINB + 128

    def kernel(win_ref, bits_ref, phase_ref, part_ref,
               comp_ref, totbits_ref, ovf_ref,
               off_sref, bit_sref, part_sref, tot_sref, tail_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            bit_sref[0] = phase_ref[0, 0, 0]
            part_sref[0] = part_ref[0, 0, 0]
            tot_sref[0] = phase_ref[0, 0, 0]
            ovf_ref[0, 0, 0] = 0
            tail_vref[...] = jnp.zeros_like(tail_vref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        step_bits = bits_ref[0, 0, 0, 0]
        io_w = jax.lax.broadcasted_iota(jnp.int32, (1, WINB), 1)

        @pl.when(step_bits > 0)
        def _():
            p = bit_sref[0]
            # (NW, 128) u8 rows -> one flat byte row (lane-merge: allowed)
            w = win_ref[0].astype(jnp.int32).reshape(1, WINB)
            wprev = jnp.where(io_w == 0, 0, pltpu.roll(w, 1, axis=1))
            # LSB-first phase shift: multiply the byte stream by 2^p with
            # inter-byte carries (p == 0 degenerates to identity: x >> 8
            # of a byte is 0)
            shifted = ((w << p) & 255) | (wprev >> (8 - p))
            local = shifted + jnp.where(io_w == 0, part_sref[0], 0)
            sub_total = p + step_bits
            nbytes = sub_total >> 3
            part_sref[0] = jnp.sum(jnp.where(io_w == nbytes, local, 0))
            bit_sref[0] = sub_total & 7
            _store_window(comp_ref, tail_vref, off_sref, local, nbytes,
                          OUT, WIN, WINB)

        tot_sref[0] = tot_sref[0] + step_bits
        ovf_ref[0, 0, 0] |= jnp.int32(off_sref[0] > OUT)

        @pl.when(h == n_steps - 1)
        def _():
            flush = jnp.where(io_w == 0, part_sref[0], 0)
            _store_window(comp_ref, tail_vref, off_sref, flush,
                          jnp.int32((bit_sref[0] > 0).astype(jnp.int32)),
                          OUT, WIN, WINB)
            totbits_ref[0, 0, 0] = tot_sref[0]

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, NW, 128), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call


@functools.partial(jax.jit, static_argnames=("out_bound", "nw", "interpret"))
def _assemble_split_call(tok, lutab, phase, partial, out_bound, nw,
                        interpret):
    B, NPAD = tok.shape
    par = _build_assemble_par_kernel(B, NPAD, nw, bool(interpret))
    win, bits, ovf_steps = par(
        tok.reshape(B, NPAD // CH_B, 8, CH_B // 8), lutab)
    cat = _build_assemble_cat_kernel(B, NPAD // CH_B, out_bound, nw,
                                     bool(interpret))
    comp, totbits, ovf = cat(
        win, bits, phase.reshape(B, 1, 1).astype(jnp.int32),
        partial.reshape(B, 1, 1).astype(jnp.int32))
    body = comp[:, 0, :out_bound].astype(jnp.uint8)
    ovf_all = (ovf[:, 0, 0] != 0) | jnp.any(ovf_steps[:, :, 0, 0] != 0, axis=1)
    return body, totbits[:, 0, 0], ovf_all


def assemble_pallas_split(tok, lutab, phase, partial, out_bound,
                          nw=None, interpret=None):
    """Split (parallel scatter + serial concat) variant of
    :func:`assemble_pallas` — identical contract and output bytes."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if nw is None:
        nw = WIN_ROWS_MAX
    out_bound = -(-out_bound // 128) * 128
    return _assemble_split_call(jnp.asarray(tok), jnp.asarray(lutab),
                                jnp.asarray(phase), jnp.asarray(partial),
                                out_bound, int(nw), bool(interpret))


def window_rows_for(step_bits_estimate: int) -> int:
    """Smallest scatter-window preset whose bit capacity covers an expected
    per-step bit count (with the caller's margin already applied).  The
    kernel flags any step that actually exceeds the window, so this is a
    speed heuristic — the caller re-runs at WIN_ROWS_MAX on overflow."""
    for nw in WIN_ROWS_PRESETS:
        if (nw * 128 - 4) * 8 >= step_bits_estimate:
            return nw
    return WIN_ROWS_MAX


def assemble_pallas(tok, lutab, phase, partial, out_bound,
                    nw=None, interpret=None):
    """Pass B: pack per-byte tokens into the deflate bitstream.

    ``tok`` (B, NPAD) u16 — INVERTED token stream (tok = NO_TOKEN - lut_idx;
    0 = no token) as produced by :func:`tokenize_pallas` /
    :func:`compact_tokens`; the kernel un-inverts in place.
    ``lutab`` (B, 48, 32) f32 — combined token LUT: rows 0..23 full values
    (<= 21 bits, exact f32), rows 24..47 bit counts, both laid out
    [idx >> 5, idx & 31] (idx 512 = no token -> (0, 0)); see
    ``codecs.dyndeflate.luts_as_radix``.  ``phase`` (B,) is
    the header's trailing bit count (0..7) and ``partial`` its trailing
    partial-byte value.  ``nw`` — scatter-window sublane rows (default
    WIN_ROWS_MAX = always-sufficient; narrower presets from
    ``window_rows_for`` run faster but may flag overflow, in which case the
    caller must re-run at WIN_ROWS_MAX).  Returns (body (B, out_bound) u8 —
    starting at the header's last partial byte — , total_bits (B,) incl.
    phase, overflow (B,) bool).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if nw is None:
        nw = WIN_ROWS_MAX
    out_bound = -(-out_bound // 128) * 128
    return _assemble_call(tok, lutab, phase, partial, out_bound,
                          int(nw), bool(interpret))
