"""Stream compaction: gather masked elements to a dense prefix.

This is the crux of variable-length encoding inside fixed-shape XLA (see
SURVEY.md §7 "hard parts"): the L1 residual stream is the row-major sequence
of foreground pixel values, whose length is data-dependent.  The compaction
keeps shapes static by writing into a max-bound buffer and returning the true
count separately.

Two interchangeable strategies are provided; both are jittable and batched:

* ``scatter``: positions via exclusive cumsum of the mask, then a single
  1-D scatter with out-of-bounds drop.  O(N), the default.
* ``sort``: a stable key sort that moves foreground values to the front.
  O(N log N) but sorts are heavily optimized on TPU; useful to compare.

Elements beyond the true count are zero, which downstream bit-packing relies
on (the reference zero-initializes its pack buffers, reader.h:117-120).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size", "method"))
def stream_compact(values: jax.Array, mask: jax.Array, out_size: int,
                   method: str = "scatter"):
    """Compact ``values[mask]`` (row-major order) into a zero-padded buffer.

    Parameters
    ----------
    values : (..., n) array
    mask : (..., n) boolean
    out_size : static output length (true count may not exceed it; overflowing
        elements are dropped and the returned count still reports the real
        total so callers can detect overflow)

    Returns
    -------
    compacted : (..., out_size) array, zero beyond the count
    count : (...,) int32 — number of True elements in the mask
    """
    mask = mask.astype(jnp.bool_)
    count = jnp.sum(mask, axis=-1).astype(jnp.int32)

    if method == "scatter":
        pos = jnp.cumsum(mask, axis=-1, dtype=jnp.int32) - 1
        # out-of-range index drops the element (background and overflow alike)
        idx = jnp.where(mask, pos, out_size)

        def _scatter_1d(vals, indices):
            out = jnp.zeros((out_size,), dtype=vals.dtype)
            return out.at[indices].set(vals, mode="drop", unique_indices=True)

        flat_vals = values.reshape(-1, values.shape[-1])
        flat_idx = idx.reshape(-1, idx.shape[-1])
        out = jax.vmap(_scatter_1d)(flat_vals, flat_idx)
        return out.reshape(*values.shape[:-1], out_size), count

    if method == "sort":
        n = values.shape[-1]
        # stable: foreground keeps row-major order at the front
        key = jnp.where(mask, jnp.int32(0), jnp.int32(1))
        zeroed = jnp.where(mask, values, jnp.zeros_like(values))
        _, sorted_vals = jax.lax.sort_key_val(key, zeroed, dimension=-1, is_stable=True)
        return sorted_vals[..., :out_size], count

    raise ValueError(f"Unknown compaction method: {method}")
