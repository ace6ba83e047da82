"""Pallas 12-bit pack kernel: compacted values -> LSB-first bitstream.

Replaces the XLA word-stack formulation of ops/bitpack.bitpack_values for
the hot 12-bit case.  The XLA path needs a (n/8, 8)-group relayout of the
value buffer; measured IN the encode->pack chain (the values come out of
the L1 Pallas kernel with a fixed layout) that relayout costs ~2.9 ms per
4-frame 4096^2 batch against a ~0.4 ms memory-bound floor — every XLA
reformulation tried (optimization_barrier, explicit copy, u16 input) pays
it (tools/probe_bitpack_chain.py).  A Pallas kernel reads the natural tiled
layout and regroups in VMEM instead:

* the value buffer is viewed as (B, nseg, V) — segment s owns values
  [s*V, (s+1)*V) and, because 12 bits divide evenly into the segment,
  bytes [s*3V/2, ...) of the output: grid steps process SEG segments;
* in-kernel: transpose (SEG, V) -> (V, SEG) so consecutive values are
  sublane-adjacent, slice sublanes k::8 (v_k = value 8q+k of each group),
  combine into the 3 output words per 8 values with shifts/ors, interleave
  word planes along sublanes ((Q, 3, SEG) -> (3Q, SEG), lane width intact),
  transpose back -> (SEG, 3V/8) words in natural layout;
* output is u32 words; the byte view (LSB-first bitstream, little-endian
  words) is a bitcast at the XLA level.

Wire format identical to bitpack_values(values, 12) — enforced by
tests/test_bitpack.py and the hardware gate (tools/verify_hw.py).
Reference semantics: recode_writer.py:637-652 (_bit_pack),
c_extensions/reader.h:74-140.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V_SEG = 2048            # values per segment (3V/8 = 768 words out)
SEG_STEP = 128          # segments per grid step (one full lane dim)
VALS_STEP = V_SEG * SEG_STEP


def _kernel(x_ref, w_ref):
    x = x_ref[0].astype(jnp.int32)            # (SEG, V) values < 4096
    t = x.T                                   # (V, SEG): value 8q+k of
    #                                           segment seg at (8q+k, seg)
    # lane-merge 8 sublanes -> (V/8, 8*SEG): member k of every group lands
    # in the contiguous lane span [k*SEG, (k+1)*SEG) — Mosaic refuses
    # strided vector slices (stride must be 1), so the k::8 split is done
    # with a 128-aligned reshape + stride-1 slices instead
    g = t.reshape(V_SEG // 8, 8 * SEG_STEP)
    v = [g[:, k * SEG_STEP:(k + 1) * SEG_STEP] for k in range(8)]

    def b0(u):
        return u & 0xFF

    def b1(u, w):
        return (u >> 8) | ((w & 0xF) << 4)

    def b2(w):
        return w >> 4

    # 8 values (4 pairs) -> 12 bytes -> 3 little-endian u32 words
    w0 = (b0(v[0]) | (b1(v[0], v[1]) << 8) | (b2(v[1]) << 16)
          | (b0(v[2]) << 24))
    w1 = (b1(v[2], v[3]) | (b2(v[3]) << 8) | (b0(v[4]) << 16)
          | (b1(v[4], v[5]) << 24))
    w2 = (b2(v[5]) | (b0(v[6]) << 8) | (b1(v[6], v[7]) << 16)
          | (b2(v[7]) << 24))
    q = V_SEG // 8
    # (Q, 3*SEG) -> (3Q, SEG): word 3q+c of each segment at sublane 3q+c
    words = jnp.concatenate([w0, w1, w2], axis=1).reshape(3 * q, SEG_STEP)
    w_ref[0] = words.T                        # (SEG, 3V/8), natural layout


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitpack12_words_pallas(values: jax.Array, interpret: bool = False
                           ) -> jax.Array:
    """(B, n) u16/i32 values (< 4096) -> (B, 3n/8) u32 LE words.

    ``n`` must be a multiple of VALS_STEP (= 262144).  Byte j of the
    bitstream is ``(words[j // 4] >> (8 * (j % 4))) & 0xFF``.
    """
    B, n = values.shape
    if n % VALS_STEP:
        raise ValueError(f"n={n} must be a multiple of {VALS_STEP}")
    nseg = n // V_SEG
    x = values.reshape(B, nseg, V_SEG)
    grid = (B, nseg // SEG_STEP)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, SEG_STEP, V_SEG), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SEG_STEP, 3 * V_SEG // 8),
                               lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nseg, 3 * V_SEG // 8), jnp.int32),
        interpret=interpret,
    )(x)
    return out.reshape(B, 3 * n // 8)


def supports(n: int, bit_depth: int) -> bool:
    return bit_depth == 12 and n % VALS_STEP == 0


def _kernel_bytes(x_ref, o_ref):
    """Same regrouping as _kernel but emits the u8 byte stream directly
    (an XLA-level u32 -> u8 bitcast view of the word output costs ~1.3 ms
    per 4-frame 4096^2 batch — a third of the whole chain win)."""
    x = x_ref[0].astype(jnp.int32)
    t = x.T
    g = t.reshape(V_SEG // 8, 8 * SEG_STEP)
    v = [g[:, k * SEG_STEP:(k + 1) * SEG_STEP] for k in range(8)]
    by = []
    for p in range(4):                        # pair p: values 2p, 2p+1
        u, w = v[2 * p], v[2 * p + 1]
        by.append(u & 0xFF)
        by.append((u >> 8) | ((w & 0xF) << 4))
        by.append(w >> 4)
    # (Q, 12*SEG) -> (12Q, SEG): byte 12q+k of each segment at sublane 12q+k
    a = jnp.concatenate(by, axis=1).reshape(12 * (V_SEG // 8), SEG_STEP)
    o_ref[0] = a.T.astype(jnp.uint8)          # (SEG, 3V/2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitpack12_pallas(values: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, n) values -> (B, 3n/2) u8 LSB-first 12-bit stream."""
    B, n = values.shape
    if n % VALS_STEP:
        raise ValueError(f"n={n} must be a multiple of {VALS_STEP}")
    nseg = n // V_SEG
    x = values.reshape(B, nseg, V_SEG)
    grid = (B, nseg // SEG_STEP)
    out = pl.pallas_call(
        _kernel_bytes,
        grid=grid,
        in_specs=[pl.BlockSpec((1, SEG_STEP, V_SEG), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SEG_STEP, 3 * V_SEG // 2),
                               lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nseg, 3 * V_SEG // 2), jnp.uint8),
        interpret=interpret,
    )(x)
    return out.reshape(B, 3 * n // 2)


# ----------------------------------------------------------------- unpack


def _kernel_unpack(x_ref, o_ref):
    """Inverse of _kernel_bytes: (SEG, 3V/2) u8 bytes -> (SEG, V) values.

    The XLA bitunpack (ops/bitpack.bitunpack_values) needs an (m/3, 3)-group
    relayout that costs ~2.9 ms per 4-frame 4096^2 batch in the decode
    chain (tools/probe_decode_rpc.py: full decode 7.0 ms vs kernel 4.1 ms);
    this kernel regroups in VMEM with the same transpose + lane-merge
    reshape + stride-1 slice tricks as the pack direction."""
    a = x_ref[0].astype(jnp.int32)            # (SEG, 3V/2) bytes
    t = a.T                                   # (3V/2, SEG)
    # byte 12q+k of each segment -> contiguous lane span k (12 bytes per
    # 8-value group)
    g = t.reshape(V_SEG // 8, 12 * SEG_STEP)
    by = [g[:, k * SEG_STEP:(k + 1) * SEG_STEP] for k in range(12)]
    v = []
    for p in range(4):                        # byte triple p -> values 2p, 2p+1
        b0, b1, b2 = by[3 * p], by[3 * p + 1], by[3 * p + 2]
        v.append(b0 | ((b1 & 0xF) << 8))
        v.append((b1 >> 4) | (b2 << 4))
    vals = jnp.concatenate(v, axis=1).reshape(V_SEG, SEG_STEP)
    o_ref[0] = vals.T                         # (SEG, V), natural layout


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitunpack12_pallas(packed: jax.Array, interpret: bool = False
                       ) -> jax.Array:
    """(B, m) u8 LSB-first 12-bit stream -> (B, 2m/3) i32 values.

    ``m`` must be a multiple of 3*VALS_STEP/2 (= 393216 bytes).  Inverse of
    bitpack12_pallas; wire format of bitunpack_values(packed, 12).
    """
    B, m = packed.shape
    step_bytes = 3 * VALS_STEP // 2
    if m % step_bytes:
        raise ValueError(f"m={m} must be a multiple of {step_bytes}")
    nseg = 2 * m // 3 // V_SEG
    x = packed.reshape(B, nseg, 3 * V_SEG // 2)
    grid = (B, nseg // SEG_STEP)
    out = pl.pallas_call(
        _kernel_unpack,
        grid=grid,
        in_specs=[pl.BlockSpec((1, SEG_STEP, 3 * V_SEG // 2),
                               lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SEG_STEP, V_SEG), lambda b, h: (b, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nseg, V_SEG), jnp.int32),
        interpret=interpret,
    )(x)
    return out.reshape(B, 2 * m // 3)


def supports_unpack(m: int, bit_depth: int) -> bool:
    return bit_depth == 12 and m % (3 * VALS_STEP // 2) == 0
