"""Probe Mosaic lowering of the primitives the redesigned G5 pass-B needs.

Run one stage per invocation so a remote-compile crash identifies it:

  python scripts/tpu_probe_prims.py transpose    # (128,128) f32 swapaxes
  python scripts/tpu_probe_prims.py lanegather   # axis=1 take_along_axis, 128 & 256 rows
  python scripts/tpu_probe_prims.py laneroll     # pltpu.roll along axis=1
  python scripts/tpu_probe_prims.py lanecumsum   # roll-based scan along lanes
  python scripts/tpu_probe_prims.py int8idx      # int8 plane -> int32 -> gather idx
  python scripts/tpu_probe_prims.py vreg0        # axis=0 gather, (8,128)x(8,128)
  python scripts/tpu_probe_prims.py all
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def run(name, kernel, inputs, out_shape, ref):
    y = pl.pallas_call(kernel, out_shape=out_shape)(*inputs)
    err = np.max(np.abs(np.asarray(y) - ref))
    print(f"[{name}] max_err={err:.2e} {'PASS' if err < 1e-3 else 'FAIL'}",
          flush=True)


def stage_transpose():
    x = rng.standard_normal((128, 128)).astype(np.float32)

    def k(x_ref, y_ref):
        y_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    run("transpose128", k, [x],
        jax.ShapeDtypeStruct((128, 128), jnp.float32), x.T)


def stage_lanegather():
    for rows in (128, 256):
        x = rng.standard_normal((rows, 128)).astype(np.float32)
        idx = rng.integers(0, 128, (rows, 128)).astype(np.int32)

        def k(x_ref, i_ref, y_ref):
            y_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

        run(f"lanegather{rows}", k, [x, idx],
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            np.take_along_axis(x, idx, axis=1))


def stage_laneroll():
    x = rng.standard_normal((128, 128)).astype(np.float32)

    def k(x_ref, y_ref):
        y_ref[:] = pltpu.roll(x_ref[:], 3, 1)

    run("laneroll", k, [x],
        jax.ShapeDtypeStruct((128, 128), jnp.float32), np.roll(x, 3, 1))


def stage_lanecumsum():
    x = rng.standard_normal((128, 128)).astype(np.float32)

    def k(x_ref, y_ref):
        v = x_ref[:]
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        s = 1
        while s < 128:
            r = pltpu.roll(v, s, 1)
            v = v + jnp.where(idx >= s, r, jnp.zeros_like(v))
            s *= 2
        y_ref[:] = v

    run("lanecumsum", k, [x],
        jax.ShapeDtypeStruct((128, 128), jnp.float32), np.cumsum(x, 1))


def stage_int8idx():
    x = rng.standard_normal((128, 128)).astype(np.float32)
    idx8 = rng.integers(0, 128, (128, 128)).astype(np.int8)

    def k(x_ref, i_ref, y_ref):
        y_ref[:] = jnp.take_along_axis(
            x_ref[:], i_ref[:].astype(jnp.int32), axis=1)

    run("int8idx", k, [x, idx8],
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
        np.take_along_axis(x, idx8.astype(np.int64), axis=1))


def stage_vreg0():
    x = rng.standard_normal((8, 128)).astype(np.float32)
    idx = rng.integers(0, 8, (8, 128)).astype(np.int32)

    def k(x_ref, i_ref, y_ref):
        y_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    run("vreg0", k, [x, idx],
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        np.take_along_axis(x, idx.astype(np.int64), axis=0))


STAGES = dict(transpose=stage_transpose, lanegather=stage_lanegather,
              laneroll=stage_laneroll, lanecumsum=stage_lanecumsum,
              int8idx=stage_int8idx, vreg0=stage_vreg0)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    for name, fn in STAGES.items():
        if which in (name, "all"):
            fn()


if __name__ == "__main__":
    main()
