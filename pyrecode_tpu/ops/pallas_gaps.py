"""Pallas TPU kernel: bitmap -> sorted set-bit positions (gap-mode encode).

Device front half of the scheme-12 GAP transform (codecs/rans.compress_gaps,
flags 2|4): the bitmap's set-bit positions become first-order gaps, coded as
12-bit rANS symbols — ~1/occupancy fewer symbols through the serial rANS
chain than byte-mode coding of the same bitmap.  The reference performs the
equivalent walk bit-serially on the host inside its decode hot loop
(c_extensions/reader.h:10-68); here one kernel extracts every position of a
frame batch in raster order:

* per chunk of S=128 sub-rows x 512 bits (8 KB of bitmap), bytes are
  lane-spread with the decode kernel's MXU expansion matmul and shifted by
  ``lane % 8`` to a 0/1 mask;
* chunk-RELATIVE positions (s*512 + lane < 2^16 — the shared selection
  machinery packs two values per i32, so values must stay 16-bit) are
  compacted with the shared _compact_chunk (MXU rank cumsum + rank-match /
  butterfly selection + hierarchical ragged concat);
* the chunk base (h * 65536) is added to the valid slots and the run is
  appended through the shared 128-aligned window store.

Output: (positions (B, OUT) i32 ascending, counts (B,), overflow (B,)).
Overflow (per-sub-row capacity C1 or OUT exhausted) escalates through the
same CAPACITY_BUCKETS ladder as the L1 encode.  The gap/escape expansion on
the compacted stream is m-scale XLA work in codecs/rans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode import (CAPACITY_BUCKETS, _compact_chunk, _store_window,
                            make_lti_matrix)

SUB_G = 512             # bits per sub-row (one selection row)
S_G = 128               # sub-rows per chunk: S_G * SUB_G = 2^16 rel positions
CHUNK_BITS = S_G * SUB_G
CHUNK_BYTES = CHUNK_BITS // 8


@functools.lru_cache(maxsize=32)
def _build_positions_kernel(B, NB, OUT, C1, interpret):
    n_chunks = NB // CHUNK_BYTES
    C2 = S_G * C1
    WIN = C2 + 128

    def kernel(bm_ref, expand_ref, lti_ref, pos_ref, cnt_ref, ovf_ref,
               off_sref, tail_vref):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _():
            off_sref[0] = 0
            ovf_ref[0, 0, 0] = 0
            tail_vref[...] = jnp.zeros_like(tail_vref)
            pos_ref[...] = jnp.zeros_like(pos_ref)

        bytes_ = bm_ref[0].astype(jnp.int32).astype(jnp.float32)  # (S, SUB/8)
        spread = jnp.dot(bytes_, expand_ref[...],
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S_G, SUB_G), 1)
        m2 = (spread >> (lane % 8)) & 1
        row = jax.lax.broadcasted_iota(jnp.int32, (S_G, SUB_G), 0)
        rel = row * SUB_G + lane                       # < 2^16

        acc, chunk_cnt, ovf1 = _compact_chunk(m2, rel, S_G, SUB_G, C1, C2,
                                              lti_ref[...])
        wio = jax.lax.broadcasted_iota(jnp.int32, (1, C2), 1)
        acc = acc + jnp.where(wio < chunk_cnt, h * CHUNK_BITS, 0)

        ovf2 = _store_window(pos_ref, tail_vref, off_sref, acc, chunk_cnt,
                             OUT, WIN, C2)
        ovf_ref[0, 0, 0] |= jnp.int32(ovf1 | ovf2)
        cnt_ref[0, 0, 0] = jnp.minimum(off_sref[0], OUT)

    i = np.arange(SUB_G // 8)[:, None]
    j = np.arange(SUB_G)[None, :]
    expand = (j // 8 == i).astype(np.float32)
    lti = make_lti_matrix(SUB_G)

    call = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, S_G, SUB_G // 8), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_G // 8, SUB_G), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB_G, SUB_G), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
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
                        pltpu.VMEM((1, WIN), jnp.int32)],
        interpret=bool(interpret),
    )
    return lambda bm: call(bm, expand, lti)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "bucket", "interpret"))
def bitmap_positions_pallas(bitmaps: jax.Array, out_size: int,
                            bucket: int = 0, interpret: bool = False):
    """(B, NB) u8 LSB-first bitmaps -> sorted set-bit positions.

    ``NB`` must be a multiple of CHUNK_BYTES (= 8192; zero-pad — padding
    bytes produce no positions).  Returns (positions (B, out_size) i32
    ascending with zeros beyond the count, counts (B,) i32, overflow (B,)
    bool).  On overflow escalate ``bucket`` (per-sub-row capacity) exactly
    like the L1 encode ladder.
    """
    B, NB = bitmaps.shape
    if NB % CHUNK_BYTES:
        raise ValueError(f"NB={NB} must be a multiple of {CHUNK_BYTES}")
    c1 = CAPACITY_BUCKETS[bucket]
    call = _build_positions_kernel(B, NB, out_size, c1, interpret)
    pos, cnt, ovf = call(bitmaps.reshape(B, NB // (SUB_G // 8), SUB_G // 8))
    return pos[:, 0, :out_size], cnt[:, 0, 0], ovf[:, 0, 0] != 0
