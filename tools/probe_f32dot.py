"""Probe: is an f32 dot_general inside a Pallas TPU kernel EXACT for
21-bit integer values when precision=HIGH / HIGHEST?

The assemble kernel wants to replace its 3 bf16 byte-plane LUT matmuls with
one full-value f32 matmul; that is only sound if Mosaic honours a >=3-pass
f32 matmul (bf16x3 reconstructs 24 mantissa bits, enough for values < 2^21).

Run on the real TPU: `python tools/probe_f32dot.py`.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def build(precision):
    def kernel(lut_ref, oh_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            lut_ref[...], oh_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((48, 2048), jnp.float32))


def main():
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    lut = rng.integers(0, 1 << 21, size=(48, 32)).astype(np.float32)
    idx = rng.integers(0, 32, size=2048).astype(np.int32)
    oh = (idx[None, :] == np.arange(32)[:, None]).astype(np.float32)
    # NT layout: contract dim 1 of lut with dim 1 of oh^T -> oh as (2048,32)?
    # kernel contracts lut dim1 (32) with oh dim1 -> oh must be (2048, 32)
    want = lut[:, idx]

    for prec in ("default", "high", "highest"):
        try:
            fn = build(prec)
            got = np.asarray(jax.jit(fn)(jnp.asarray(lut),
                                         jnp.asarray(oh.T.copy())))
            exact = np.array_equal(got, want)
            maxerr = np.abs(got - want).max()
            print(f"precision={prec}: compiled, exact={exact}, "
                  f"maxerr={maxerr}")
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"precision={prec}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
