"""Probe Mosaic lowering strategies for an axis-0 cumsum inside a Pallas
TPU kernel (jnp.cumsum is not lowered)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, L = 64, 128


def cumsum_pad(x):
    n = x.shape[0]
    s = 1
    while s < n:
        x = x + jnp.pad(x, ((s, 0), (0, 0)))[:n]
        s *= 2
    return x


def cumsum_roll(x):
    n = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        r = pltpu.roll(x, s, 0)
        x = x + jnp.where(idx >= s, r, jnp.zeros_like(x))
        s *= 2
    return x


def cumsum_slice(x):
    n = x.shape[0]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.zeros((s, x.shape[1]), x.dtype), x[: n - s]], axis=0)
        x = x + shifted
        s *= 2
    return x


STRATS = dict(pad=cumsum_pad, roll=cumsum_roll, slice=cumsum_slice)


def main():
    which = sys.argv[1]
    f = STRATS[which]

    def kernel(x_ref, y_ref):
        y_ref[:] = f(x_ref[:])

    x = np.random.default_rng(0).standard_normal((N, L)).astype(np.float32)
    y = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((N, L), jnp.float32))(x)
    ref = np.cumsum(x, axis=0)
    err = np.max(np.abs(np.asarray(y) - ref))
    print(f"[{which}] max_err={err:.2e}", flush=True)
    assert err < 1e-3
    print(f"[{which}] PASS", flush=True)


if __name__ == "__main__":
    main()
