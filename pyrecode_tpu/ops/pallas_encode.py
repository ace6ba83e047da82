"""Fused Pallas TPU kernel for L1/L3 encode.

One sequential-grid kernel performs, per chunk of ``RPC`` image rows:

  threshold -> mask -> residuals -> bitmap (MXU matmul against a constant
  packing matrix) -> hierarchical stream compaction -> aligned store into a
  VMEM-resident per-frame output buffer.

The compaction is the part XLA cannot do fast (its scatter lowers to a
serial loop — measured 520 ms vs this kernel's ~10 ms for a 4 x 4096^2
batch, tools/profile_kernels.py).  The design:

* level 1: per 512-px sub-row, compute in-row ranks with a log-shift cumsum
  and select the j-th foreground value for j < C1 by rank-match reduction
  (C1 vectorized passes over the chunk);
* level 2: concatenate the S per-sub-row runs with S dynamic lane-rotates
  (``pltpu.roll`` with traced shift), using an exclusive count cumsum
  computed as a strictly-lower-triangular f32 matmul (exact: counts < 2^24);
* store: Mosaic only supports dynamic vector stores at lane-aligned offsets
  without masks, so the kernel keeps the global write offset's misalignment
  (< 128 elements) in a VMEM tail buffer, rolls each chunk's data up to the
  misalignment, merges, zeroes beyond the data, and stores a full
  (C2 + 128)-wide window at the 128-aligned offset.  Later chunks overwrite
  the tail region; trailing zeros keep downstream bit-packing clean.

Capacity parameters C1 (max foreground per sub-row) and C2 (per chunk) are
static; the kernel reports per-frame overflow flags and the caller escalates
to the next capacity bucket (or the XLA fallback) when they fire.

Replaces the reference hot loops recode_writer.py:430-479 + 622-652 on the
encode side; bit-for-bit identical output to oracle.reduce_frame.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# capacity ladder: C1 = max foreground per sub-row (<= 512 px); the per-chunk
# capacity is C2 = S * C1, which level-2 can never overflow
CAPACITY_BUCKETS = (32, 64, 128)


def _cumsum_lanes(x, n):
    """Inclusive cumsum along the lane axis via log-step shifts (no cumsum
    primitive in Mosaic)."""
    acc = x
    d = 1
    while d < n:
        acc = acc + jnp.pad(acc, ((0, 0), (d, 0)))[:, :n]
        d *= 2
    return acc


def _select_rank_match(m2, r2, rank1, S, SUB, C1):
    """Within-sub-row selection to C1 slots, two ranks per reduction pass:
    ranks 2j and 2j+1 select disjoint lanes, so one row-sum carries both
    values in the low and high 16-bit halves (values < 2^16, no carries
    between halves).  C1/2 passes over the chunk — the hw-safe default.

    The per-pass body is ONE compare + ONE select + the row sum: the values
    are pre-shifted once by 16*(rank&1) (a dynamic lane shift), so each pass
    only matches rank1 >> 1 against the pass index (was: two compares + two
    selects + an add per pass; select was 48% of the encode batch in the hw
    phase split).  Density-adaptive early-out: passes above rank 16 run
    under a lax.cond on the chunk's max sub-row count — at the 1% occupancy
    the capacity ladder targets, P(any sub-row count > 16 per 64K-px chunk)
    is ~0.2%, so half the passes almost never execute."""
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, C1), 1)
    fg = m2 > 0
    s2 = jnp.where(fg, r2 << ((rank1 & 1) << 4), 0)
    half = rank1 >> 1

    def passes(j_lo, j_hi):
        c = jnp.zeros((S, C1), jnp.int32)
        for j in range(j_lo, j_hi, 2):
            pair = jnp.where(half == (j >> 1), s2, 0)
            colsum = jnp.sum(pair, axis=1, keepdims=True)
            c = c + (colsum & 0xFFFF) * (jrow == j) \
                + ((colsum >> 16) & 0xFFFF) * (jrow == j + 1)
        return c

    # r5: the ungated prefix dropped from 16 ranks to 12 — at 1% the
    # Poisson(5.1) sub-row tail puts P(any sub-row > 12 per 64K-px chunk)
    # at ~17%, so the 12..16 tier costs ~0.17 x 2 passes in expectation
    # instead of 2 always (byte-identity re-gated by verify_hw)
    c1 = passes(0, min(12, C1))
    maxcnt = jnp.max(rank1[:, SUB - 1:SUB]) + 1   # = max sub-row count
    j = 12
    while j < C1:
        j_hi = min(16 if j == 12 else 2 * j, C1)
        c1 = c1 + jax.lax.cond(
            maxcnt > j,
            lambda lo=j, hi=j_hi: passes(lo, hi),
            lambda: jnp.zeros((S, C1), jnp.int32))
        j = j_hi
    return c1


def _select_butterfly(m2, r2, rank1, S, SUB, C1):
    """Stable left-pack by butterfly routing: each foreground value moves
    left by dist = lane - rank (non-decreasing along the row), consumed
    LSB-first in log2(SUB) conditional-shift stages — collision-free (two
    foreground lanes i < j satisfy j - i > d_j - d_i, so at stage k a
    collision would need 1 = 0 mod 2k).  ~C1/2 / log2(SUB) times fewer
    passes than rank-match.  History: the dec5970 "summed pairs at >= 25%
    density" divergence was blamed on this routing and reverted; the real
    culprit (found 2026-08-18 via tools/probe_fused.py) was the off1 concat
    matmul in _compact_chunk running at default MXU precision, which rounds
    f32 operands to bf16 — sub-row counts > 256 (exactly the >= 25%-density
    regime) lost their low bits and adjacent runs overlapped.  The butterfly
    itself passed byte-identity in every full-kernel context across
    densities on hardware (tools/probe_butterfly_full.py).  Any change here
    must still re-run that probe + verify_hw — interpret mode and numpy
    fuzz do NOT gate the Mosaic lowering."""
    lio = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
    fg = m2 > 0
    carry = jnp.where(fg, ((lio - rank1) << 16) | (r2 & 0xFFFF), 0)
    k = 1
    while k < SUB:
        moving = ((carry >> 16) & k) > 0
        mv = jnp.where(moving, carry - (k << 16), 0)
        carry = jnp.where(moving, 0, carry) + pltpu.roll(mv, SUB - k, axis=1)
        k *= 2
    return carry[:, :C1]   # all distance bits consumed: lanes hold values


def _select_auto(m2, r2, rank1, S, SUB, C1):
    """Pick the selection by capacity: rank-match costs C1/2 passes,
    butterfly log2(SUB) heavier stages.  Hardware-measured crossover
    (tools/probe_butterfly_full.py --bench, v5e 2026-08-18): neutral at
    (SUB=512, C1=32), butterfly 18% faster at (SUB=128, C1=64) and grows
    with C1 — use butterfly from C1 >= 64.  Both variants verified
    byte-identical on hardware across densities in every full-kernel
    context (compact_tokens, L1 direct, L1 stacked); the dec5970
    divergence did not reproduce, but keep verify_hw as the gate after
    any change here."""
    if C1 >= 64:
        return _select_butterfly(m2, r2, rank1, S, SUB, C1)
    return _select_rank_match(m2, r2, rank1, S, SUB, C1)


# selection implementation used by every kernel built AFTER assignment
# (kernel builders are lru_cached — call .cache_clear() on
# _build_l1_kernel/_build_decode_kernel/etc. when switching)
_SELECT = _select_auto


def make_lti_matrix(sub: int) -> np.ndarray:
    """Constant (sub, sub) inclusive lower-triangular f32 matrix for the
    MXU rank cumsum (numpy so lru_cached builders don't leak tracers)."""
    i = np.arange(sub)[:, None]
    j = np.arange(sub)[None, :]
    return (i <= j).astype(np.float32)


def _rank_cumsum_mxu(m2, S, SUB, lti=None):
    """Inclusive lane cumsum of a 0/1 mask via ONE MXU matmul against a
    constant lower-triangular inclusive matrix.

    Replaces the log2(SUB)-pass shift-add cumsum (hw phase split,
    tools/probe_phases.py: the shift cumsum was 1.55 ms of a 7.0 ms batch;
    the matmul is ~0.3 ms of MXU time that overlaps VPU work).  DEFAULT MXU
    precision is safe here — both operands are 0/1 (exact in bf16) and the
    accumulation is f32 (exact to 2^24); see the HW exactness rule in
    CLAUDE.md.  Pass ``lti`` (a kernel input ref slice) so the constant is
    NOT rebuilt by iota+compare every grid step — inline construction cost
    ~1 ms/batch on hw, most of the matmul's win."""
    del S
    return jnp.dot(m2.astype(jnp.float32), lti,
                   preferred_element_type=jnp.float32).astype(jnp.int32)


def _compact_chunk(m2, r2, S, SUB, C1, C2, lti=None):
    """Compact foreground values of an (S, SUB) chunk into (1, C2).

    Shared by the L1 encode kernel and the L2/L4 labeling kernel
    (pallas_label.py).  Returns (acc (1, C2), chunk_cnt, overflow_bool):
    level 1 = within-sub-row rank-match selection to C1 slots; level 2 =
    ragged concat of the S runs via dynamic lane-rotates with the run
    offsets from a lower-triangular matmul.

    ``lti``: the (SUB, SUB) inclusive lower-triangular kernel INPUT for the
    MXU rank cumsum; without it (wide-row callers like the deflate fused
    kernel, where a 2048^2 constant would blow VMEM) the log-shift cumsum
    is used instead.
    """
    if lti is not None and SUB == lti.shape[0]:
        csum = _rank_cumsum_mxu(m2, S, SUB, lti)
    elif lti is not None and SUB % lti.shape[0] == 0:
        # wide rows (deflate tiles, SUB_A=2048): blockwise matmul cumsum —
        # a full (SUB, SUB) constant would blow VMEM, so L-wide blocks use
        # the (L, L) input plus an exclusive prefix of block totals (static
        # 128-aligned lane slices and concat)
        L = lti.shape[0]
        base = None
        outs = []
        for k in range(SUB // L):
            part = _rank_cumsum_mxu(m2[:, k * L:(k + 1) * L], S, L, lti)
            outs.append(part if base is None else part + base)
            tot = outs[-1][:, L - 1:L]
            base = tot
        csum = jnp.concatenate(outs, axis=1)
    else:
        csum = _cumsum_lanes(m2, SUB)
    rank1 = csum - 1
    cnt1 = csum[:, SUB - 1:SUB]               # (S, 1)
    ovf1 = jnp.max(cnt1) > C1

    c1 = _SELECT(m2, r2, rank1, S, SUB, C1)

    r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ltri = (r_io > c_io).astype(jnp.float32)
    # precision=HIGHEST is load-bearing: the MXU's default f32 path rounds
    # operands to bf16 (8-bit mantissa), so any cnt1 > 256 shifts off1 by
    # +-1 and adjacent runs overlap in the concat ("summed pairs").  That
    # was the real dec5970 divergence — density >= 25% is where sub-row
    # counts first exceed 256 — originally misattributed to the butterfly
    # left-pack.  HIGHEST is exact to 24 bits on v5e (tools/probe_f32dot).
    off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    chunk_cnt = jnp.sum(cnt1)

    acc = _concat_runs(c1, off1, S, C1, C2)
    return acc, chunk_cnt, ovf1


def _concat_runs(c1, off1, S, C1, C2):
    """Ragged concat of the S per-sub-row runs into one (1, C2) window.

    A flat loop is S rolls of the full (1, C2) window — the kernel's
    dominant cost for large S.  Hierarchical variant: concat groups of
    g = sqrt(S) sub-rows inside narrow (1, g*C1) buffers (runs can't
    overflow them: group content <= g*C1), then concat the S/g group runs
    into (1, C2) — total roll traffic drops from S*C2 lanes to
    ~2*sqrt(S)*C2.
    """
    g = 1
    while g * g < S:
        g *= 2
    acc = jnp.zeros((1, C2), jnp.int32)
    if 16 <= S and S % g == 0 and g * C1 < C2:
        GW = g * C1
        NG = S // g
        # Mosaic can only lane-pad offset-free 2-D vectors (padding a sliced
        # row fails with "offset mismatch on non-concat dimension"), so pads
        # happen on whole matrices and rows are sliced afterwards.
        c1g = jnp.pad(c1, ((0, 0), (0, GW - C1)))          # (S, GW)
        gio = jax.lax.broadcasted_iota(jnp.int32, (NG, GW), 0)
        gmat = jnp.zeros((NG, GW), jnp.int32)
        for gi in range(NG):
            base = off1[gi * g, 0]
            gacc = jnp.zeros((1, GW), jnp.int32)
            for s in range(gi * g, (gi + 1) * g):
                gacc = gacc + pltpu.roll(c1g[s:s + 1, :],
                                         off1[s, 0] - base, axis=1)
            gmat = gmat + jnp.where(gio == gi, gacc, 0)
        gpad = jnp.pad(gmat, ((0, 0), (0, C2 - GW)))       # (NG, C2)
        for gi in range(NG):
            acc = acc + pltpu.roll(gpad[gi:gi + 1, :], off1[gi * g, 0],
                                   axis=1)
    else:
        c1_pad = jnp.pad(c1, ((0, 0), (0, C2 - C1)))
        for s in range(S):
            acc = acc + pltpu.roll(c1_pad[s:s + 1, :], off1[s, 0], axis=1)
    return acc


def _select_rank_match_wide(m2, payload, rank1, S, SUB, C1):
    """Unpaired rank-match selection for payloads wider than 16 bits
    (the packed dual compaction's ``lane << vbits | value`` words).

    One pass per rank: compare + select + row sum + one slot mask-mult.
    Per rank this is the same number of (S, SUB) compare/colsum ops as the
    paired variant (which amortizes one colsum over two ranks but needs a
    second full select chain for the second payload), and HALF the (S, C1)
    slot mask-mults of running `_select_rank_match` twice.  Same >rank-16
    density gating as the paired variant."""
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, C1), 1)
    s2 = jnp.where(m2 > 0, payload, 0)

    def passes(j_lo, j_hi):
        c = jnp.zeros((S, C1), jnp.int32)
        for j in range(j_lo, j_hi):
            colsum = jnp.sum(jnp.where(rank1 == j, s2, 0), axis=1,
                             keepdims=True)
            c = c + colsum * (jrow == j)
        return c

    c1 = passes(0, min(16, C1))
    maxcnt = jnp.max(rank1[:, SUB - 1:SUB]) + 1
    j = 16
    while j < C1:
        j_hi = min(2 * j, C1)
        c1 = c1 + jax.lax.cond(
            maxcnt > j,
            lambda lo=j, hi=j_hi: passes(lo, hi),
            lambda: jnp.zeros((S, C1), jnp.int32))
        j = j_hi
    return c1


def _select_butterfly_wide(m2, payload, rank1, S, SUB, C1, pbits):
    """Butterfly left-pack for ``pbits``-bit payloads (pbits + 9 <= 30):
    the move distance (< SUB <= 512, 9 bits) rides bits pbits..pbits+8 of
    the carry word instead of the fixed bit 16.  Same routing proof as
    `_select_butterfly`; used by the packed dual compaction at C1 >= 64
    where butterfly beats rank-match (tools/probe_butterfly_full.py)."""
    assert pbits + 9 <= 30, pbits
    lio = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
    fg = m2 > 0
    pmask = (1 << pbits) - 1
    carry = jnp.where(fg, ((lio - rank1) << pbits) | (payload & pmask), 0)
    k = 1
    while k < SUB:
        moving = ((carry >> pbits) & k) > 0
        mv = jnp.where(moving, carry - (k << pbits), 0)
        carry = jnp.where(moving, 0, carry) + pltpu.roll(mv, SUB - k, axis=1)
        k *= 2
    return carry[:, :C1]


# packed-path select crossover: butterfly-wide (log2(SUB) stages) from this
# C1 up, rank-match-wide (C1 unpaired passes, >16 density-gated) below.
# Hardware-probed 2026-08-20 (tools/probe_packed_select.py, v5e, 4096^2 at
# 1%): butterfly-wide beats rank-match-wide at C1=32 too (5.07 vs 5.79
# ms/batch full fused encode, byte-identity OK) — unlike the PAIRED
# 16-bit select, where the two are neutral at C1=32, the wide select has
# no rank pairing to halve its passes, so the stage-count advantage
# kicks in earlier.  Probe again on hw before changing.
_PACKED_BUTTERFLY_MIN_C1 = 32


def _compact_chunk_dual_packed(m2, r2, S, SUB, C1, C2, vbits, lti=None):
    """Packed variant of `_compact_chunk_dual`: value and lane ride ONE
    selection as a ``(lane << vbits) | value`` word, and value + chunk-
    relative position ride ONE ragged concat as ``(pos << vbits) | value``
    (pos < RPC*W, so the word needs vbits + log2(RPC*W) <= 31 bits — the
    caller gates on that).  Versus the dual path this drops one full
    `_concat_runs` (the level-2 rolls are the kernel's dominant cost for
    large S) and half the selection slot mask-mults.

    ``r2`` is masked to its low ``vbits`` bits: identical wire bytes (the
    bit packer keeps exactly those bits, oracle.bit_pack/recode_writer.py
    :637-652) and required anyway by the scheme-12 value alphabet
    (symbols < 2^vbits) that is this path's only consumer.
    Returns (acc_vals, acc_pos, chunk_cnt, overflow)."""
    if lti is not None and SUB == lti.shape[0]:
        csum = _rank_cumsum_mxu(m2, S, SUB, lti)
    else:
        csum = _cumsum_lanes(m2, SUB)
    rank1 = csum - 1
    cnt1 = csum[:, SUB - 1:SUB]
    ovf1 = jnp.max(cnt1) > C1

    vmask = (1 << vbits) - 1
    lane_io = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
    payload = (lane_io << vbits) | (r2 & vmask)
    # butterfly routing consumes the move distance LSB-first in pow2
    # stages — non-pow2 sub-rows (width < 512 and not a power of two)
    # take the rank-match ladder instead.  Butterfly also needs the move
    # distance (9 bits) ABOVE the lane|value payload inside 30 bits, so
    # vbits 13-16 (legal per supports(): bit_depth <= 16) fall back to
    # rank-match-wide, which only carries lane|value (vbits + 9 <= 25).
    if (C1 >= _PACKED_BUTTERFLY_MIN_C1 and SUB & (SUB - 1) == 0
            and vbits + 18 <= 30):
        c1p = _select_butterfly_wide(m2, payload, rank1, S, SUB, C1,
                                     vbits + 9)
    else:
        c1p = _select_rank_match_wide(m2, payload, rank1, S, SUB, C1)

    s_io = jax.lax.broadcasted_iota(jnp.int32, (S, C1), 0)
    j_io = jax.lax.broadcasted_iota(jnp.int32, (S, C1), 1)
    # lane -> chunk-relative position, dead slots re-zeroed so the concat's
    # overlapping rolls stay additive-safe
    packed2 = jnp.where(j_io < cnt1,
                        ((s_io * SUB + (c1p >> vbits)) << vbits)
                        | (c1p & vmask), 0)

    r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ltri = (r_io > c_io).astype(jnp.float32)
    off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    chunk_cnt = jnp.sum(cnt1)

    accp = _concat_runs(packed2, off1, S, C1, C2)
    return accp & vmask, accp >> vbits, chunk_cnt, ovf1


def _compact_chunk_dual(m2, r2, S, SUB, C1, C2, lti=None):
    """_compact_chunk that ALSO emits each value's chunk-relative position.

    Mask/cumsum/offsets are shared; the extra work is one more paired
    16-bit selection whose payload is the LANE index (9 bits — a first
    draft selected the full 24-bit global position through an unpaired
    wide select, whose per-rank row sums cost as much as the standalone
    bitmap->positions kernel).  Slot (s, j) then reconstructs its
    chunk-relative position as s*SUB + lane, with dead slots re-zeroed so
    the ragged concat's overlapping rolls stay additive-safe; the caller
    adds the chunk base.  Returns (acc_vals, acc_pos, chunk_cnt, overflow).

    Superseded on the hot path by `_compact_chunk_dual_packed` when
    vbits + log2(RPC*W) <= 31; kept as the fallback for wide values.
    """
    if lti is not None and SUB == lti.shape[0]:
        csum = _rank_cumsum_mxu(m2, S, SUB, lti)
    else:
        csum = _cumsum_lanes(m2, SUB)
    rank1 = csum - 1
    cnt1 = csum[:, SUB - 1:SUB]
    ovf1 = jnp.max(cnt1) > C1

    lane_io = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
    c1_vals = _SELECT(m2, r2, rank1, S, SUB, C1)
    c1_lane = _SELECT(m2, lane_io, rank1, S, SUB, C1)
    s_io = jax.lax.broadcasted_iota(jnp.int32, (S, C1), 0)
    j_io = jax.lax.broadcasted_iota(jnp.int32, (S, C1), 1)
    c1_pos = jnp.where(j_io < cnt1, s_io * SUB + c1_lane, 0)

    r_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ltri = (r_io > c_io).astype(jnp.float32)
    off1 = jnp.dot(ltri, cnt1.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    chunk_cnt = jnp.sum(cnt1)

    acc_vals = _concat_runs(c1_vals, off1, S, C1, C2)
    acc_pos = _concat_runs(c1_pos, off1, S, C1, C2)
    return acc_vals, acc_pos, chunk_cnt, ovf1


def _store_window(comp_ref, tail_ref, off_sref, acc, chunk_cnt, OUT, WIN, C2,
                  advance=True):
    """Append ``chunk_cnt`` values from acc (1, C2) at the running offset.

    128-aligned full-window store with a VMEM tail carry (see module
    docstring); shared by the L1 and L2 kernels.  Returns the overflow bool.
    ``advance=False`` leaves ``off_sref`` untouched — used by the fused
    positions stream, which advances in lockstep with the value stream (the
    value store, called second, does the single offset update).
    """
    off = jnp.minimum(off_sref[0], OUT)
    pend = jax.lax.rem(off, 128)
    aligned = off - pend
    acc_pad = jnp.concatenate([acc, jnp.zeros((1, WIN - C2), jnp.int32)], axis=1)
    rolled = pltpu.roll(acc_pad, pend, axis=1)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    combined = jnp.where(w_iota < pend, tail_ref[...], rolled)
    combined = jnp.where(w_iota < pend + chunk_cnt, combined, 0)
    comp_ref[0, :, pl.ds(pl.multiple_of(aligned, 128), WIN)] = combined

    new_off = off + chunk_cnt
    new_pend = jax.lax.rem(new_off, 128)
    shift_back = pend + chunk_cnt - new_pend   # multiple of 128
    leftover = pltpu.roll(combined, WIN - shift_back, axis=1)
    tail_ref[...] = jnp.where(w_iota < new_pend, leftover, 0)
    if advance:
        off_sref[0] = new_off
    return new_off > OUT


def make_pack_matrix(sub: int):
    """Constant bitmap packing matrix P[i, j] = (i//8 == j) << (i%8).

    Returned as numpy: the kernel builders are lru_cached, and a jnp array
    created while tracing would leak that trace's tracer into the cache.
    """
    i = np.arange(sub)[:, None]
    j = np.arange(sub // 8)[None, :]
    return ((i // 8 == j) * (1 << (i % 8))).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _build_l1_kernel(B, H, W, OUT, RPC, SUB, C1, with_values, interpret,
                     spf_steps=0, align=128, with_positions=False,
                     pos_vbits=0, pairs_out=0):
    """Build (and cache) the pallas_call for one static configuration.

    ``spf_steps > 0`` enables *stacked subframes*: H is ``n_sub`` frames of
    ``spf_steps * RPC`` rows each, and at every subframe boundary the running
    value offset is rounded up to ``align`` (by appending zeros through the
    window store, which also flushes the tail carry) so each subframe's
    values start pack- and lane-aligned.  The host reproduces the rounding
    from per-frame counts to slice the shared output buffer.  This amortizes
    per-frame overheads for small frames: one kernel invocation encodes a
    whole batch.
    """
    S = RPC * W // SUB
    n_chunks = H // RPC
    t_steps = spf_steps if spf_steps else n_chunks
    C2 = S * C1          # sum of sub-row capacities: level 2 cannot overflow
    WIN = C2 + 128
    assert not (with_positions and spf_steps), \
        "fused positions not supported on the stacked-subframe path"
    assert not (with_positions and not with_values)
    assert not (pairs_out and (spf_steps or with_positions or SUB != 512
                               or (RPC * W // SUB) % 2)), \
        "fused bitmap pairs: plain path, SUB=512, even sub-row count"
    # pairs compaction geometry: 2 sub-rows of bitmap bytes per 128-lane
    # row so the dual-packed machinery runs at native lane width
    S2 = (RPC * W // SUB) // 2 if pairs_out else 0
    CB = S2 * C1                     # pairs window capacity
    WINB = CB + 128 if pairs_out else 0
    chunk_bytes = RPC * W // 8

    def kernel(*args):
        pack2_ref = None
        if pairs_out:
            (x_ref, t_ref, pack_ref, lti_ref, pack2_ref, bitmap_ref,
             comp_ref, count_ref, ovf_ref, pairs_ref, pcount_ref,
             off_sref, tail_ref, offp_sref, tailp_ref) = args
        elif with_positions:
            (x_ref, t_ref, pack_ref, lti_ref, bitmap_ref, comp_ref,
             count_ref, ovf_ref, pos_ref, off_sref, tail_ref,
             tail_pos_ref) = args
        else:
            (x_ref, t_ref, pack_ref, lti_ref, bitmap_ref, comp_ref,
             count_ref, ovf_ref, off_sref, tail_ref) = args
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            comp_ref[...] = jnp.zeros_like(comp_ref)
            tail_ref[...] = jnp.zeros_like(tail_ref)
            if with_positions:
                pos_ref[...] = jnp.zeros_like(pos_ref)
                tail_pos_ref[...] = jnp.zeros_like(tail_pos_ref)
            if pairs_out:
                pairs_ref[...] = jnp.zeros_like(pairs_ref)
                tailp_ref[...] = jnp.zeros_like(tailp_ref)
                offp_sref[0] = 0

        if spf_steps and with_values:
            @pl.when((h > 0) & (h % spf_steps == 0))
            def _():
                # subframe boundary: round the offset up by appending zeros
                # (flushes the tail so the pad region lands as real zeros)
                off = off_sref[0]
                pad = (align - jax.lax.rem(off, align)) % align
                zeros = jnp.zeros((1, C2), jnp.int32)
                _store_window(comp_ref, tail_ref, off_sref, zeros, pad,
                              OUT, WIN, C2)

        x = x_ref[0].astype(jnp.int32)            # (RPC, W)
        t = t_ref[...].astype(jnp.int32)
        if S != RPC:  # sub-row view; row-major order is preserved
            x = x.reshape(S, SUB)
            t = t.reshape(S, SUB)
        mask = x > t

        # bitmap via MXU at sub-row granularity: bytes = mask @ P with
        # P[i, j] = (i//8 == j) << (i%8) (0/1 x pow2 row sums <= 1020 ->
        # exact in f32); the (S, SUB/8) byte block is the chunk's bitmap in
        # row-major order, so the output array is just (B, N/SUB, SUB/8)
        bytes_f = jnp.dot(mask.astype(jnp.float32), pack_ref[...],
                          preferred_element_type=jnp.float32)
        bitmap_ref[0] = bytes_f.astype(jnp.int32).astype(jnp.uint8)

        if pairs_out:
            # ---- nonzero bitmap-byte (index, value) pairs: the positions-
            # driven scheme-0 deflate front end (codecs/dyndeflate.
            # tokens_from_pairs_np).  The chunk's bytes are recomputed at
            # (S2, 128) layout — two sub-rows per native-width lane row,
            # byte order preserved — via a second pack matmul (a direct
            # (S, 64) -> (S2, 128) reshape is a lane-split Mosaic rejects)
            # and compacted by the same dual-packed machinery as the
            # scheme-12 positions path with vbits=8 (payload
            # (byte_pos << 8) | byte_value, 21 bits chunk-local).
            # cast BEFORE the lane-merge reshape: reshaping the 1-bit mask
            # vector trips Mosaic's changeBitwidth path
            mask2 = mask.astype(jnp.float32).reshape(S2, 2 * SUB)
            bvals = jnp.dot(mask2, pack2_ref[...],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.int32)
            m2b = (bvals > 0).astype(jnp.int32)
            accb_v, accb_p, bcnt, ovfb = _compact_chunk_dual_packed(
                m2b, bvals, S2, 128, C1, CB, 8)
            wio_b = jax.lax.broadcasted_iota(jnp.int32, (1, CB), 1)
            accb = ((accb_p << 8) | accb_v) + jnp.where(
                wio_b < bcnt, (h * chunk_bytes) << 8, 0)
            ovfb_store = _store_window(pairs_ref, tailp_ref, offp_sref,
                                       accb, bcnt, pairs_out, WINB, CB)
            ovf_ref[0, 0, 0] |= jnp.int32(ovfb | ovfb_store)

            @pl.when(h == n_chunks - 1)
            def _():
                pcount_ref[0, 0, 0] = offp_sref[0]

        if not with_values:  # L3: bitmap + count only
            off_sref[0] = off_sref[0] + jnp.sum(mask.astype(jnp.int32))

            @pl.when(h == n_chunks - 1)
            def _():
                count_ref[0, 0, 0] = off_sref[0]
            return

        # ---- compact foreground residuals + append at the running offset ----
        m2 = mask.astype(jnp.int32)
        r2 = jnp.where(mask, x - t, 0)
        if with_positions:
            # chunk-relative positions from the dual compaction; the global
            # pixel index is h*RPC*W + s*SUB + l (row-major preserved by
            # the (S, SUB) view) — the base is added here, masked to the
            # live prefix so dead window lanes stay zero
            if pos_vbits and pos_vbits + (RPC * W - 1).bit_length() <= 31:
                acc, acc_pos, chunk_cnt, ovf1 = _compact_chunk_dual_packed(
                    m2, r2, S, SUB, C1, C2, pos_vbits, lti=lti_ref[...])
            else:
                acc, acc_pos, chunk_cnt, ovf1 = _compact_chunk_dual(
                    m2, r2, S, SUB, C1, C2, lti=lti_ref[...])
            wio = jax.lax.broadcasted_iota(jnp.int32, (1, C2), 1)
            acc_pos = acc_pos + jnp.where(wio < chunk_cnt, h * (RPC * W), 0)
            _store_window(pos_ref, tail_pos_ref, off_sref, acc_pos,
                          chunk_cnt, OUT, WIN, C2, advance=False)
        else:
            acc, chunk_cnt, ovf1 = _compact_chunk(m2, r2, S, SUB, C1, C2,
                                                  lti=lti_ref[...])
        ovf_store = _store_window(comp_ref, tail_ref, off_sref, acc, chunk_cnt,
                                  OUT, WIN, C2)
        ovf_ref[0, 0, 0] |= jnp.int32(ovf1 | ovf_store)

        @pl.when(h == n_chunks - 1)
        def _():
            count_ref[0, 0, 0] = off_sref[0]

    pack_mat = make_pack_matrix(SUB)
    lti_mat = make_lti_matrix(SUB)

    out_specs = [
        pl.BlockSpec((1, S, SUB // 8), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H * W // SUB, SUB // 8), jnp.uint8),
        jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
    ]
    scratch = [pltpu.SMEM((1,), jnp.int32), pltpu.VMEM((1, WIN), jnp.int32)]
    if with_positions:
        out_specs.append(pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32))
        scratch.append(pltpu.VMEM((1, WIN), jnp.int32))
    if pairs_out:
        out_specs.insert(4, pl.BlockSpec((1, 1, pairs_out + WINB),
                                         lambda b, h: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
        out_shape.insert(4, jax.ShapeDtypeStruct((B, 1, pairs_out + WINB),
                                                 jnp.int32))
        out_specs.insert(5, pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                                         memory_space=pltpu.SMEM))
        out_shape.insert(5, jax.ShapeDtypeStruct((B, 1, 1), jnp.int32))
        scratch += [pltpu.SMEM((1,), jnp.int32),
                    pltpu.VMEM((1, WINB), jnp.int32)]

    in_specs = [
        pl.BlockSpec((1, RPC, W), lambda b, h: (b, h, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((RPC, W), lambda b, h: (h % t_steps, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SUB, SUB // 8), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((SUB, SUB), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
    ]
    if pairs_out:
        in_specs.append(pl.BlockSpec((2 * SUB, SUB // 4), lambda b, h: (0, 0),
                                     memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=bool(interpret),
    )
    return call, pack_mat, lti_mat


def supports(height: int, width: int, bit_depth: int) -> bool:
    """Whether the fused kernel handles this geometry (else use the XLA path).

    bit_depth is capped at 16: the compaction packs two residuals into the
    16-bit halves of one int32 accumulator, so wider values would corrupt.
    """
    if width % 128 or bit_depth > 16:
        return False
    if height % 8:
        return False
    sub = width if width <= 512 else 512
    if width > 512 and width % 512:
        return False
    del sub
    return True


def _choose_sub(width: int) -> int:
    return width if width <= 512 else 512


def _choose_rpc(height: int, width: int, out_size: int = 0) -> int:
    """Rows per chunk: target ~64K px per grid step, bounded by what divides
    the height.  Hardware sweep (tools/probe_rpc.py, v5e 2026-08-18): 64K
    px/step beats the old 32K target by 7-12% at 4096^2 (17.8 -> 19.1 GB/s),
    2048^2 and stacked 512^2 (26.0 -> 29.0); 128K/step loses it again.  When
    the VMEM-resident value buffer is large (> 4 MiB), fall back to the 32K
    target to keep scoped-VMEM headroom for the chunk temporaries."""
    target = 32768 if out_size * 4 > (4 << 20) else 65536
    rpc = min(128, max(8, target // width))
    while rpc > 8 and height % rpc:
        rpc //= 2
    return rpc if height % rpc == 0 else 8


@functools.partial(jax.jit, static_argnames=("out_size", "c1", "with_values",
                                              "interpret", "n_sub", "align",
                                              "with_positions", "pos_vbits",
                                              "pairs_out"))
def _encode_call(frames, threshold, out_size, c1, with_values, interpret,
                 n_sub=1, align=128, with_positions=False, pos_vbits=0,
                 pairs_out=0):
    B, H, W = frames.shape
    rpc = _choose_rpc(H // n_sub, W, out_size)
    call, pack_mat, lti_mat = _build_l1_kernel(
        B, H, W, out_size, rpc, _choose_sub(W), c1, with_values, interpret,
        spf_steps=(H // n_sub) // rpc if n_sub > 1 else 0, align=align,
        with_positions=with_positions, pos_vbits=pos_vbits,
        pairs_out=pairs_out)
    if pairs_out:
        outs = call(frames, threshold, pack_mat, lti_mat,
                    make_pack_matrix(2 * _choose_sub(W)))
    else:
        outs = call(frames, threshold, pack_mat, lti_mat)
    bitmap, comp, counts, ovf = outs[:4]
    bitmap = bitmap.reshape(B, H * (W // 8))
    comp = comp[:, 0, :out_size]
    ret = (bitmap, comp, counts[:, 0, 0], ovf[:, 0, 0] != 0)
    if with_positions:
        ret = ret + (outs[4][:, 0, :out_size],)
    if pairs_out:
        ret = ret + (outs[4][:, 0, :pairs_out], outs[5][:, 0, 0])
    return ret


def encode_l1_pallas(frames, threshold, out_size: int, bucket: int = 0,
                     with_values: bool = True, interpret: Optional[bool] = None,
                     with_positions: bool = False, pos_vbits: int = 0,
                     pairs_out: int = 0):
    """Run the fused kernel at the given capacity bucket.

    Returns (bitmap (B, H*W/8) u8, compacted (B, out_size) i32 or None,
    counts (B,) i32, overflow (B,) bool).  ``interpret`` defaults to True off
    TPU so tests run on CPU.

    ``with_positions=True`` appends a 5th output: the GLOBAL pixel index of
    every compacted value, rank-aligned with the value stream (the scheme-12
    gap entropy path's input — fused here because the standalone
    bitmap->positions kernel re-expands the bitmap and re-runs the full
    selection, 3.5 ms/4-frame batch at 4096^2 on hw).

    ``pos_vbits`` (the declared value bit depth, e.g. 12) lets the fused
    positions path pack value+position into one selection/concat chain
    (`_compact_chunk_dual_packed`) when they fit 31 bits together; the
    compacted values are then masked to their low ``pos_vbits`` bits —
    identical wire bytes (bit packing keeps exactly those bits) and the
    scheme-12 value alphabet requires it anyway.  0 = unpacked dual path.

    ``pairs_out`` > 0 appends TWO outputs: a dense stream of the NONZERO
    bitmap-byte (index, value) pairs packed ``(byte_index << 8) | value``
    (``pairs_out`` i32 slots per frame) and their per-frame counts — the
    positions-driven scheme-0 deflate front end (the deflate tokenizer's
    run structure derives from these pairs without rescanning the 2 MB
    byte stream, codecs/dyndeflate.tokens_from_pairs_np).  Requires the
    plain path (no fused positions) at SUB=512 geometry.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    c1 = CAPACITY_BUCKETS[bucket]
    out_aligned = max(128, -(-out_size // 128) * 128)
    pairs_aligned = max(128, -(-pairs_out // 128) * 128) if pairs_out else 0
    outs = _encode_call(
        frames, threshold, out_aligned, c1, with_values, bool(interpret),
        with_positions=with_positions,
        pos_vbits=pos_vbits if with_positions else 0,
        pairs_out=pairs_aligned)
    bitmap, comp, counts, ovf = outs[:4]
    if not with_values:
        comp = None
    elif out_aligned != out_size:
        comp = comp[:, :out_size]
    if with_positions:
        pos = outs[4]
        if out_aligned != out_size:
            pos = pos[:, :out_size]
        return bitmap, comp, counts, ovf, pos
    if pairs_out:
        pairs = outs[4][:, :pairs_out]
        return bitmap, comp, counts, ovf, pairs, outs[5]
    return bitmap, comp, counts, ovf


STACK_ALIGN = 128  # value alignment at stacked-frame boundaries


def stacked_offsets(counts, align: int = STACK_ALIGN):
    """Start offset of each stacked frame's values in the shared buffer.

    Reproduces the kernel's boundary rounding from per-frame foreground
    counts: frame i starts at sum of round-up(count_j, align) for j < i.
    """
    counts = np.asarray(counts, dtype=np.int64)
    rounded = -(-counts // align) * align
    starts = np.zeros_like(rounded)
    starts[1:] = np.cumsum(rounded)[:-1]
    return starts


def encode_l1_stacked(frames, threshold, per_frame_bound: int,
                      bucket: int = 0, with_values: bool = True,
                      interpret: Optional[bool] = None):
    """Encode a whole (B, H, W) batch as ONE stacked superframe.

    Small frames pay a per-frame kernel overhead (buffer initialization,
    frame-switch stalls) that dominates below ~1k rows; stacking the batch
    along the row axis encodes it in a single grid pass.  Each frame's
    values start at an ``align``-rounded offset in the shared buffer
    (byte- and pack-group-aligned for any bit depth), recoverable via
    :func:`stacked_offsets` from per-frame counts.

    Returns (bitmap (B, H*W/8) u8, values (1, total_bound) i32 or None,
    total_count (1,) i32, overflow (1,) bool).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, H, W = frames.shape
    c1 = CAPACITY_BUCKETS[bucket]
    per_bound = -(-per_frame_bound // STACK_ALIGN) * STACK_ALIGN
    out_size = per_bound * B
    stacked = frames.reshape(1, B * H, W)
    bitmap, comp, counts, ovf = _encode_call(
        stacked, threshold, out_size, c1, with_values, bool(interpret),
        n_sub=B, align=STACK_ALIGN)
    bitmap = bitmap.reshape(B, H * (W // 8))
    return bitmap, comp, counts, ovf


def num_buckets() -> int:
    return len(CAPACITY_BUCKETS)
