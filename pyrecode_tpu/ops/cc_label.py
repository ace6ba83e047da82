"""Connected-component labeling on TPU (8-connectivity).

TPU-native replacement for the reference's ``scipy.ndimage.label`` calls in
the L2/L4 encode paths (recode_writer.py:443 with the full 3x3 structure from
recode_writer.py:166).  The algorithm is iterative label propagation —
compiler-friendly: each step is a 3x3 min-pool (``lax.reduce_window``) over
the whole batch, iterated to a fixed point with ``lax.while_loop``.  The
number of steps equals the longest geodesic diameter of any component;
electron puddles are a few pixels across, so convergence is fast.

Labels are compacted to consecutive ids 1..n ordered by each component's
first pixel in raster-scan order — identical to scipy.ndimage.label's label
order, so downstream per-puddle streams match the CPU oracle element for
element.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 0):
    """Label 8-connected components of a boolean batch (B, H, W).

    Parameters
    ----------
    mask : (B, H, W) boolean
    max_iters : static iteration cap; 0 means run to the fixed point
        (data-dependent trip count via ``lax.while_loop``).

    Returns
    -------
    labels : (B, H, W) int32 — 0 background, 1..n per frame in raster order
    counts : (B,) int32 — number of components per frame
    """
    B, H, W = mask.shape
    N = H * W
    mask = mask.astype(jnp.bool_)

    lin = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1) * W + \
        jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    background = jnp.int32(N)
    lbl0 = jnp.where(mask, lin, background)

    def propagate(lbl):
        pooled = jax.lax.reduce_window(
            lbl, background, jax.lax.min,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding="SAME",
        )
        return jnp.where(mask, pooled, background)

    if max_iters > 0:
        def body(_, lbl):
            return propagate(lbl)

        lbl = jax.lax.fori_loop(0, max_iters, body, lbl0)
    else:
        def cond(state):
            _, changed = state
            return changed

        def body(state):
            lbl, _ = state
            nxt = propagate(lbl)
            return nxt, jnp.any(nxt != lbl)

        lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.bool_(True)))

    # each component's label is the linear index of its first (min) pixel;
    # compact to 1..n in raster order of those root pixels
    flat_lbl = lbl.reshape(B, N)
    flat_lin = lin.reshape(B, N)
    flat_mask = mask.reshape(B, N)
    is_root = flat_mask & (flat_lbl == flat_lin)
    rank = jnp.cumsum(is_root.astype(jnp.int32), axis=-1)  # root k -> k (1-based)
    safe_lbl = jnp.clip(flat_lbl, 0, N - 1)
    compact = jnp.take_along_axis(rank, safe_lbl, axis=-1)
    labels = jnp.where(flat_mask, compact, 0).reshape(B, H, W)
    counts = jnp.sum(is_root, axis=-1).astype(jnp.int32)
    return labels, counts
