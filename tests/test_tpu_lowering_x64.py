"""Host-side TPU (Mosaic) lowering of every Pallas kernel under x64.

jax_enable_x64 is the mode the C API and all fp64-class flows run in,
and it changes trace-time dtypes: jnp.take_along_axis promotes indices
to int64 and bare python ints in BlockSpec index maps trace as i64 —
both of which Mosaic cannot lower (round-4 regression class; the
classical bench died on the chip with "64-bit types are not supported").
`Lowered.as_text` via cross-platform lowering runs the Mosaic kernel
lowering on the CPU host, so this guards the class without TPU access.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(
        lowering_platforms=("tpu",)).as_text()


@pytest.fixture(autouse=True)
def _x64():
    assert jax.config.read("jax_enable_x64"), "suite must run with x64"


def test_gather_kernel_lowers_for_tpu_under_x64(rng):
    from amgx_tpu.ops.gather_spmv import csr_to_gather
    a = amgx.gallery.poisson7pt(8, 8, 8, dtype=np.float32)
    p = rng.permutation(a.n_rows)
    sp = a.to_scipy().tocsr()[p][:, p].tocsr()
    m = CSRMatrix(a.n_rows, a.n_cols, sp.indptr, sp.indices,
                  sp.data.astype(np.float32))
    gm = csr_to_gather(m, dtype=np.float32, allow_empty=True)
    assert gm is not None
    x = jnp.zeros(a.n_rows, jnp.float32)
    txt = _lower_tpu(lambda o, v: o._apply_pallas(o._pad_x(v)), gm, x)
    # the Mosaic kernel body is serialized opaquely inside the custom
    # call, so there is no text to scan for i64 — but .lower() runs the
    # Mosaic MLIR verifier, which rejects any 64-bit type reaching the
    # kernel (VerificationError: "must be ... 32-bit ... but got 'i64'").
    # Lowering completing IS the i64 guard.
    assert "tpu_custom_call" in txt or "custom_call" in txt


def test_dia_kernel_lowers_for_tpu_under_x64():
    from amgx_tpu.ops.spmv import csr_to_dia, dia_spmv_pallas2d
    # big enough that the 2-D tiled kernel engages (needs R % 8 == 0
    # chunks; tiny grids take the XLA shift-FMA form)
    a = amgx.gallery.poisson7pt(16, 16, 16, dtype=np.float32)
    dia = csr_to_dia(a, dtype=np.float32)
    assert dia is not None
    x = jnp.zeros(dia.n_pad, jnp.float32)
    txt = _lower_tpu(
        lambda o, v: dia_spmv_pallas2d(o, v, chunk_rows=128), dia, x)
    assert "custom_call" in txt


def test_band_kernel_lowers_for_tpu_under_x64(rng):
    from amgx_tpu.ops.band import csr_to_band, band_spmv_pallas
    # banded structure wide enough for MXU-sized strips (the kernel's
    # half-window must be a multiple of 8*128 rows)
    n = 8192
    rows, cols, vals = [], [], []
    for off in (-513, -1, 0, 1, 513):
        i = np.arange(max(0, -off), min(n, n - off))
        rows.append(i)
        cols.append(i + off)
        vals.append(np.full(i.shape, 1.0 if off else 4.0, np.float32))
    m = CSRMatrix.from_coo(n, n, np.concatenate(rows),
                           np.concatenate(cols), np.concatenate(vals))
    bm = csr_to_band(m, dtype=np.float32)
    if bm is None:
        pytest.skip("band layout declined this structure")
    x = jnp.zeros(bm.x_pad, jnp.float32)
    txt = _lower_tpu(lambda o, v: band_spmv_pallas(o, v), bm, x)
    assert "custom_call" in txt


def test_full_classical_fused_solve_lowers_for_tpu():
    """The exact program class that died on the chip in round 4: a fused
    classical V-cycle solve (MULTICOLOR_GS color loops, G5/DIA kernels,
    dense coarse LU) traced under x64 and lowered for the TPU platform
    host-side. Catches any 64-bit leak into any kernel in the stack."""
    a = amgx.gallery.poisson7pt(16, 16, 16, dtype=np.float32)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": 10, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": "dFFI", "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 32,
        "max_levels": 12, "cycle": "V", "dense_threshold_rows": 256}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode="dFFI"))
    b = jnp.ones(a.n_rows, jnp.float32)
    fn = s._fused_solve_fn(True)

    def run(dev, b_, x_):
        saved = s._apply_device_state(dev)
        try:
            return fn(b_, x_)
        finally:
            s._apply_device_state(saved)

    txt = jax.jit(run).trace(
        s._device_state(), b, jnp.zeros_like(b)).lower(
        lowering_platforms=("tpu",)).as_text()
    assert len(txt) > 1000
