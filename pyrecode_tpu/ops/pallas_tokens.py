"""Positions-driven deflate tokenizer: (byte index, value) pairs -> tokens.

The byte-scan tokenizer (ops/pallas_deflate.py pass A) walks every bitmap
byte — 2 MB per 4096^2 frame — to rediscover run structure the L1 encode
kernel already knows.  This kernel consumes the fused nonzero-byte PAIRS
output (pallas_encode.encode_l1_pallas(pairs_out=...)) instead: work
scales with foreground bytes (~12x fewer at 1% occupancy), and the dense
token stream plus 286-symbol histogram come out in one pass with no byte
expansion.  Output is byte-identical to compacting tokenize_pallas's
per-byte stream (numpy reference: codecs/dyndeflate.tokens_from_pairs_np;
the closed-form per-gap schedule is derived there).

Shape of the computation, per grid step of ``CH_P = R_E * 128`` pairs:

* gaps from a shifted-neighbor difference (cross-chunk SMEM carry);
* per-element token counts ``t`` from the closed-form gap schedule
  (compare ladders only — no integer division);
* a per-row exclusive lane cumsum of ``t`` gives each token's target
  rank, and an expansion NT-matmul (0/1 weights, f32 HIGHEST — exact to
  24 bits) broadcasts the per-element quantities to the ``C1T = 8``
  token slots per element;
* per-slot token values in closed form; a butterfly left-pack over each
  1024-slot row (the L1 kernel's routing proof applies verbatim: the
  target rank IS the count of live slots before, so this is a plain
  left-pack) compacts them; rows concatenate via the shared ragged-
  concat; the window appends to the dense output through the shared
  128-aligned store;
* histogram via the same radix-split NT-matmul as the byte tokenizer.

Preconditions (checked at the XLA level by ``tokens_from_pairs_device``,
falling back to the byte tokenizer — they are data properties, never
correctness bounds):

* no nonzero run of length >= 4 (isolated-ish foreground bytes: runs of
  <= 3 equal bytes are all literals under the run < 4 rule);
* every zero gap <= GAP_MAX (1549 bytes at C1T=8 — a gap needs
  1 + ceil-ish(G/258) tokens and each element owns C1T slots).

Adler32 of the byte stream is NOT computed here: it is a closed form
over the pairs (A = 1 + sum(v), B = n + sum((n - idx) * v) mod 65521)
evaluated in i64 at the XLA level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode import _cumsum_lanes, _store_window, _concat_runs
from .pallas_deflate import _shift_prev, SYM_NONE

C1T = 8                 # token slots per pair element
R_E = 32                # element rows per grid step
CH_P = R_E * 128        # pairs per grid step
SLOT_W = 128 * C1T      # slot lanes per row (1024)
# largest zero gap whose token schedule fits C1T - 1 slots (j258 <= 5)
GAP_MAX = 1549
_ADLER_MOD = 65521

# deflate length-code bases for the symbol ladder (dyndeflate.LEN_BASE)
_LEN_BASE = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
             43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)


def _gap_schedule(G, j):
    """(token count, token LUT value at slot j) for a G-byte zero run.

    Closed form of dyndeflate.gap_token_count / gap_token_value with the
    division replaced by a compare ladder (j258 <= 5 at C1T=8).
    """
    j258 = jnp.zeros_like(G)
    for k in range(C1T - 3):
        j258 = j258 + (G >= 262 + 258 * k).astype(jnp.int32)
    rem = G - 1 - 258 * j258
    tail = jnp.where(rem >= 259, 2, 1)
    gc = jnp.where(G <= 0, 0,
                   jnp.where(G <= 3, G, 1 + j258 + tail))
    if j is None:
        return gc, None
    take = jnp.where(j <= j258, 258,
                     jnp.where(rem >= 259,
                               jnp.where(j == j258 + 1, 255, rem - 255),
                               rem))
    lut_gap = jnp.where((G <= 3) | (j == 0), 0, 256 + take - 3)
    return gc, lut_gap


@functools.lru_cache(maxsize=16)
def _build_tokens_kernel(B, NP, OUT, interpret):
    """NP pairs (padded with (n << 8)), OUT dense token slots."""
    assert NP % CH_P == 0
    n_steps = NP // CH_P
    C2 = R_E * SLOT_W
    WIN = C2 + 128

    def kernel(p_ref, exp_ref, tok_ref, hist_ref, cnt_ref, ovf_ref,
               prev_sref, off_sref, hist_vref, tail_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            prev_sref[0] = -1
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            hist_vref[...] = jnp.zeros_like(hist_vref)
            tail_vref[...] = jnp.zeros_like(tail_vref)
            tok_ref[...] = jnp.zeros_like(tok_ref)

        x = p_ref[0]                               # (R_E, 128)
        idx = jax.lax.shift_right_logical(x, 8)
        val = x & 255
        prev = _shift_prev(idx, prev_sref[0])
        prev_sref[0] = idx[R_E - 1, 127]
        G = idx - prev - 1                         # -1 on dead padding

        gc, _ = _gap_schedule(G, None)
        t = gc + (val > 0).astype(jnp.int32)
        ovf_gap = jnp.max(G) > GAP_MAX

        incl = _cumsum_lanes(t, 128)               # per-row inclusive
        row_tot = incl[:, 127:128]                 # (R_E, 1)
        off_in_row = incl - t
        chunk_cnt = jnp.sum(row_tot)

        # row offsets within the chunk: strict-lower-tri matmul (counts
        # <= C2 = 32768 — exact in f32 only at HIGHEST precision)
        r_io = jax.lax.broadcasted_iota(jnp.int32, (R_E, R_E), 0)
        c_io = jax.lax.broadcasted_iota(jnp.int32, (R_E, R_E), 1)
        ltri = (r_io > c_io).astype(jnp.float32)
        off1 = jnp.dot(ltri, row_tot.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

        # ---- expand per-element quantities to the slot grid ----
        # payload (off_in_row 11b | val 8b | t 4b) <= 23 bits: f32 HIGHEST
        # expansion matmul is exact to 24 bits
        pay = (off_in_row << 12) | (val << 4) | t
        E = exp_ref[...]
        pay_s = jnp.dot(pay.astype(jnp.float32), E,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        G_s = jnp.dot(G.astype(jnp.float32), E,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R_E, SLOT_W), 1)
        j = lane & (C1T - 1)
        t_s = pay_s & 15
        val_s = jax.lax.shift_right_logical(pay_s, 4) & 255
        offr_s = jax.lax.shift_right_logical(pay_s, 12)
        gc_s, lut_gap = _gap_schedule(G_s, j)
        live = j < t_s
        lut = jnp.where(j >= gc_s, val_s, lut_gap)
        inv = jnp.where(live, 512 - lut, 0)        # inverted-token stream

        # ---- butterfly left-pack per 1024-slot row ----
        rank = offr_s + j
        carry = jnp.where(live, ((lane - rank) << 10) | inv, 0)
        k = 1
        while k < SLOT_W:
            moving = (jax.lax.shift_right_logical(carry, 10) & k) > 0
            mv = jnp.where(moving, carry - (k << 10), 0)
            carry = jnp.where(moving, 0, carry) + pltpu.roll(
                mv, SLOT_W - k, axis=1)
            k *= 2

        acc = _concat_runs(carry, off1, R_E, SLOT_W, C2)

        # ---- histogram (286-symbol radix NT-matmul, dyndeflate layout) --
        wio = jax.lax.broadcasted_iota(jnp.int32, (1, C2), 1)
        live_w = wio < chunk_cnt
        lut_w = 512 - acc                          # dead slots -> 512
        take_w = lut_w - 253
        lc = jnp.zeros_like(lut_w)
        for c in range(1, 29):
            lc = lc + (take_w >= _LEN_BASE[c]).astype(jnp.int32)
        sym = jnp.where(~live_w, SYM_NONE,
                        jnp.where(lut_w < 256, lut_w, 257 + lc))
        io32 = jax.lax.broadcasted_iota(jnp.int32, (32, C2), 0)
        oh_lo = ((sym & 31) == io32).astype(jnp.bfloat16)
        io16 = jax.lax.broadcasted_iota(jnp.int32, (16, C2), 0)
        oh_hi = ((jax.lax.shift_right_logical(sym, 5)) == io16
                 ).astype(jnp.bfloat16)
        h2d = jax.lax.dot_general(oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        hist_vref[...] = hist_vref[...] + h2d.astype(jnp.int32)

        ovf_store = _store_window(tok_ref, tail_vref, off_sref, acc,
                                  chunk_cnt, OUT, WIN, C2)
        ovf_ref[0, 0, 0] |= jnp.int32(ovf_gap | ovf_store)

        @pl.when(h == n_steps - 1)
        def _():
            cnt_ref[0, 0, 0] = off_sref[0]
            hist_ref[0] = hist_vref[...]

    # expansion matrix: slot lane λ reads element lane λ // C1T
    i = np.arange(128)[:, None]
    lam = np.arange(SLOT_W)[None, :]
    exp_mat = (lam // C1T == i).astype(np.float32)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, R_E, 128), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, SLOT_W), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, OUT + WIN), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 32), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, OUT + WIN), jnp.int32),
            jax.ShapeDtypeStruct((B, 16, 32), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((16, 32), jnp.int32),
                        pltpu.VMEM((1, WIN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )
    return call, exp_mat


@functools.partial(jax.jit, static_argnames=("n", "tok_bound", "interpret"))
def _tokens_call(pairs, counts, n, tok_bound, interpret):
    B, NP = pairs.shape
    io = jnp.arange(NP, dtype=jnp.int32)[None, :]
    cnt = counts.astype(jnp.int32)[:, None]
    # padding doubles as the tail-gap sentinel: idx = n, val = 0.  The
    # first pad element emits the tail gap's tokens; later pads see
    # G = -1 -> no tokens
    pad = jnp.int32(n << 8)
    x = jnp.where(io < cnt, pairs, pad)

    # ---- XLA-level support gates (data properties; fall back on hit) ----
    idx = jax.lax.shift_right_logical(x, 8)
    val = x & 255
    prev_i = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), idx[:, :-1]], axis=1)
    gaps = idx - prev_i - 1
    gate_gap = jnp.max(gaps, axis=1) > GAP_MAX
    run = (idx[:, 1:] == idx[:, :-1] + 1) & (val[:, 1:] == val[:, :-1]) \
        & (val[:, 1:] > 0)
    run4 = jnp.any(run[:, 2:] & run[:, 1:-1] & run[:, :-2], axis=1) \
        if NP >= 4 else jnp.zeros((B,), bool)
    gate = gate_gap | run4 | (cnt[:, 0] >= NP)

    # ---- adler32 over the implied byte stream, straight from the pairs:
    # A = 1 + sum(v), B = n + sum((n - idx) * v)  (mod 65521).  All in
    # int32 (x64 is disabled): weights are pre-reduced mod 65521 so each
    # product is <= 65520 * 255 = 1.67e7, and sums run in 128-lane
    # segments (<= 2.14e9 < 2^31) with a mod between segments.
    vv = jnp.where(io < cnt, val, 0)
    a = (1 + jnp.sum(vv, axis=1)) % _ADLER_MOD
    w = ((n - idx) % _ADLER_MOD) * vv
    seg = jnp.sum(w.reshape(B, NP // 128, 128), axis=2) % _ADLER_MOD
    bsum = (n % _ADLER_MOD + jnp.sum(seg, axis=1)) % _ADLER_MOD
    adler = (bsum.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)

    call, exp_mat = _build_tokens_kernel(B, NP, tok_bound, bool(interpret))
    tok, hist, cnt_out, ovf = call(
        x.reshape(B, NP // 128, 128), jnp.asarray(exp_mat))
    del ovf  # gap overflow duplicates `gate`; store overflow is detected
    #          by the caller from the (always exact) histogram counts
    return (tok[:, 0, :tok_bound], hist.reshape(B, 512),
            cnt_out[:, 0, 0], gate, adler)


def tokens_from_pairs_device(pairs, counts, n: int, tok_bound: int,
                             interpret=None):
    """Dense inverted deflate tokens from nonzero-byte pairs.

    ``pairs`` — (B, NP) i32 ``(byte_index << 8) | value`` streams from the
    fused encode kernel; ``counts`` — (B,) valid pair counts; ``n`` — the
    byte-stream length every frame shares (ceil(H*W/8)).  Returns
    (tokens (B, tok_bound) i32, hist (B, 512) i32, token counts (B,) i32,
    unsupported/overflow flags (B,) bool, adler32 (B,) i64).  A flagged
    frame's outputs are unusable — the caller falls back to the byte
    tokenizer (ops/pallas_deflate.tokenize_pallas).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, NP = pairs.shape
    assert NP % CH_P == 0, NP
    return _tokens_call(jnp.asarray(pairs), jnp.asarray(counts), int(n),
                        int(tok_bound), bool(interpret))
