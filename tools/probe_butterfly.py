"""Probe: which butterfly left-pack formulations are CORRECT on real TPU?

Background: a log-shift stable compaction (monotone distances, LSB-first
power-of-two conditional moves — provably collision-free, 2000-trial numpy
fuzz clean, interpret-mode exact) diverged on real v5e at >=25% foreground
density: pairs of values summed into one lane (git dec5970, reverted).  The
root cause is an open question — this probe runs several formulations of
the same routing against the stable-compaction oracle across densities so
the hardware itself can localize the miscompile.

Run on the real TPU: `python tools/probe_butterfly.py`.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def make_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from pyrecode_tpu.ops.pallas_encode import _cumsum_lanes

    def prelude(m2, r2, S, SUB):
        csum = _cumsum_lanes(m2, SUB)
        rank1 = csum - 1
        lio = jax.lax.broadcasted_iota(jnp.int32, (S, SUB), 1)
        fg = m2 > 0
        dist = jnp.where(fg, lio - rank1, 0)
        return fg, dist

    def v_packed_add(m2, r2, S, SUB):
        """The reverted formulation: (dist<<16)|val carries, add-merge."""
        fg, dist = prelude(m2, r2, S, SUB)
        carry = jnp.where(fg, (dist << 16) | (r2 & 0xFFFF), 0)
        k = 1
        while k < SUB:
            moving = ((carry >> 16) & k) > 0
            mv = jnp.where(moving, carry - (k << 16), 0)
            carry = jnp.where(moving, 0, carry) + pltpu.roll(mv, SUB - k,
                                                             axis=1)
            k *= 2
        return carry

    def v_packed_or(m2, r2, S, SUB):
        """Same but merge with bitwise-or (collision-free => or == add)."""
        fg, dist = prelude(m2, r2, S, SUB)
        carry = jnp.where(fg, (dist << 16) | (r2 & 0xFFFF), 0)
        k = 1
        while k < SUB:
            moving = ((carry >> 16) & k) > 0
            mv = jnp.where(moving, carry - (k << 16), 0)
            carry = jnp.where(moving, 0, carry) | pltpu.roll(mv, SUB - k,
                                                             axis=1)
            k *= 2
        return carry

    def v_two_array(m2, r2, S, SUB):
        """Value and distance routed as separate arrays."""
        fg, dist = prelude(m2, r2, S, SUB)
        val = jnp.where(fg, r2, 0)
        k = 1
        while k < SUB:
            moving = (dist & k) > 0
            vmv = jnp.where(moving, val, 0)
            dmv = jnp.where(moving, dist - k, 0)
            val = jnp.where(moving, 0, val) + pltpu.roll(vmv, SUB - k, axis=1)
            dist = jnp.where(moving, 0, dist) + pltpu.roll(dmv, SUB - k,
                                                           axis=1)
            k *= 2
        return val

    def v_select_merge(m2, r2, S, SUB):
        """Merge via where(incoming != 0, incoming, stay) — no arithmetic."""
        fg, dist = prelude(m2, r2, S, SUB)
        carry = jnp.where(fg, (dist << 16) | (r2 & 0xFFFF), 0)
        k = 1
        while k < SUB:
            moving = ((carry >> 16) & k) > 0
            mv = jnp.where(moving, carry - (k << 16), 0)
            inc = pltpu.roll(mv, SUB - k, axis=1)
            stay = jnp.where(moving, 0, carry)
            carry = jnp.where(inc != 0, inc, stay)
            k *= 2
        return carry

    # NOTE an MSB-first stage order is NOT collision-free even in numpy
    # (300/300 fuzz failures) — LSB-first is essential to the routing.

    return {
        "packed_add (reverted)": v_packed_add,
        "packed_or": v_packed_or,
        "two_array": v_two_array,
        "select_merge": v_select_merge,
    }


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pyrecode_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    print("platform:", jax.devices()[0].platform)

    S = 8
    variants = make_variants()
    rng = np.random.default_rng(1)
    for SUB in (512, 2048):
        cases = []
        for dens in (0.1, 0.25, 0.6, 0.95):
            m = (rng.random((S, SUB)) < dens).astype(np.int32)
            v = rng.integers(1, 513, (S, SUB)).astype(np.int32) * m
            cases.append((dens, m, v))
        for name, fn in variants.items():
            def kernel(m_ref, v_ref, o_ref, fn=fn):
                o_ref[...] = fn(m_ref[...], v_ref[...], S, SUB) & 0xFFFF

            call = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((S, SUB), jnp.int32))
            jfn = jax.jit(call)
            bad = []
            for dens, m, v in cases:
                got = np.asarray(jfn(jnp.asarray(m), jnp.asarray(v)))
                want = np.zeros_like(got)
                for r in range(S):
                    fgv = v[r][m[r].astype(bool)]
                    want[r, : fgv.size] = fgv
                if not np.array_equal(got, want):
                    ncell = int((got != want).sum())
                    bad.append(f"dens={dens}({ncell})")
            status = "OK" if not bad else "FAIL " + ", ".join(bad)
            print(f"SUB={SUB} {name}: {status}")


if __name__ == "__main__":
    main()
