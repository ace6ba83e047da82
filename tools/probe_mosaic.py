"""Probe Mosaic lowering capabilities needed by the deflate kernels.

Run on the real TPU: `python tools/probe_mosaic.py`.  Each probe compiles a
tiny kernel exercising one feature and reports OK / FAIL(reason).
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *inputs):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        got = jax.jit(fn)(*inputs)
        got = [np.asarray(g) for g in (got if isinstance(got, (tuple, list)) else [got])]
        print(f"{name}: OK", [g.shape for g in got])
        return got
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def main():
    print("platform:", jax.devices()[0].platform)

    # (a) dot_general NT: contract lanes of (1,128) with lanes of (32,128)
    def k_nt(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.ones((8, 128), jnp.float32)
    b = jnp.ones((32, 128), jnp.float32)
    got = run("NT dot (8,128)x(32,128)->(8,32)", k_nt,
              jax.ShapeDtypeStruct((8, 32), jnp.float32), a, b)
    if got is not None:
        assert np.allclose(got[0], 128), got[0][0, :4]

    # (b) in-kernel 2D transpose
    def k_tr(a_ref, o_ref):
        o_ref[...] = a_ref[...].T

    a = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    got = run("transpose (32,128)->(128,32)", k_tr,
              jax.ShapeDtypeStruct((128, 32), jnp.float32), a)
    if got is not None:
        assert np.array_equal(got[0], np.asarray(a).T)

    # (c) integer mod / floordiv by constant on i32 vectors
    def k_mod(a_ref, o_ref, o2_ref):
        o_ref[...] = a_ref[...] % 258
        o2_ref[...] = a_ref[...] // 258

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 37
    got = run("i32 % and // by 258", k_mod,
              [jax.ShapeDtypeStruct((8, 128), jnp.int32)] * 2, a)
    if got is not None:
        assert np.array_equal(got[0], np.asarray(a) % 258)
        assert np.array_equal(got[1], np.asarray(a) // 258)

    # (d) lane->sublane reshape merge (4,512)->(1,2048) and split back
    def k_merge(a_ref, o_ref):
        o_ref[...] = a_ref[...].reshape(1, 2048)

    a = jnp.arange(4 * 512, dtype=jnp.int32).reshape(4, 512)
    got = run("reshape (4,512)->(1,2048)", k_merge,
              jax.ShapeDtypeStruct((1, 2048), jnp.int32), a)
    if got is not None:
        assert np.array_equal(got[0].ravel(), np.arange(2048))

    # (e) sublane strided slice x[0::2]
    def k_stride(a_ref, o_ref):
        o_ref[...] = a_ref[0::2, :]

    a = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)
    got = run("sublane stride-2 slice", k_stride,
              jax.ShapeDtypeStruct((8, 128), jnp.int32), a)
    if got is not None:
        assert np.array_equal(got[0], np.asarray(a)[0::2])

    # (f) pltpu.roll along sublanes (axis=0), traced shift
    def k_roll0(a_ref, s_ref, o_ref):
        o_ref[...] = pltpu.roll(a_ref[...], s_ref[0], axis=0)

    a = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128)
    try:
        fn = pl.pallas_call(
            k_roll0,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32))
        got = np.asarray(jax.jit(fn)(a, jnp.array([3], jnp.int32)))
        assert np.array_equal(got, np.roll(np.asarray(a), 3, axis=0))
        print("pltpu.roll axis=0 traced: OK")
    except Exception as e:
        print(f"pltpu.roll axis=0 traced: FAIL {type(e).__name__}: "
              + str(e).split(chr(10))[0][:200])

    # (g) scalar SMEM carry arithmetic with %
    def k_smod(a_ref, o_ref):
        s = jnp.sum(a_ref[...].astype(jnp.int32))
        o_ref[0, 0] = s % 65521

    a = jnp.full((8, 128), 1234, jnp.int32)
    try:
        fn = pl.pallas_call(
            k_smod,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))
        got = int(np.asarray(jax.jit(fn)(a))[0, 0])
        assert got == (1234 * 8 * 128) % 65521, got
        print("SMEM scalar %: OK")
    except Exception as e:
        print(f"SMEM scalar %: FAIL {type(e).__name__}: "
              + str(e).split(chr(10))[0][:200])

    # (h) i32 left/right shifts by vector amounts
    def k_shift(a_ref, s_ref, o_ref):
        o_ref[...] = (a_ref[...] << (s_ref[...] & 7)) | \
            (a_ref[...] >> (8 - (s_ref[...] & 7)))

    a = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    got = run("vector-amount shifts", k_shift,
              jax.ShapeDtypeStruct((8, 128), jnp.int32), a, a)
    del got


if __name__ == "__main__":
    sys.exit(main())
