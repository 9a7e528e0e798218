"""Coupled block (BSR) system tests — BASELINE.md config #4: 4x4-block
mixed-precision BiCGSTAB + aggregation AMG."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix


def _block_poisson(nx: int, ny: int, bs: int, rng) -> CSRMatrix:
    """5-pt Poisson graph with SPD-coupled bs x bs blocks."""
    base = amgx.gallery.poisson5pt(nx, ny)
    rows = np.repeat(np.arange(base.n_rows), base.row_nnz())
    coupling = rng.standard_normal((bs, bs)) * 0.2
    coupling = coupling @ coupling.T + np.eye(bs)
    data = np.empty((base.nnz, bs, bs))
    for k, (i, j, v) in enumerate(zip(rows, base.indices, base.data)):
        data[k] = v * coupling
    return CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                     data, block_dim=(bs, bs))


@pytest.mark.parametrize("mode", ["dDDI", "dDFI"])
def test_block4_bicgstab_aggregation_amg(mode, rng):
    a = _block_poisson(12, 12, 4, rng)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PBICGSTAB", "max_iters": 200, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "mode": mode, "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode=mode))
    b = rng.standard_normal(a.n_rows * 4)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert status == amgx.SolveStatus.SUCCESS
    tol = 1e-6 if mode == "dDDI" else 1e-4    # f32 matrix limits precision
    assert rel < tol


def test_block_dilu_smoother(rng):
    a = _block_poisson(8, 8, 2, rng)
    cfg = amgx.AMGConfig("solver=MULTICOLOR_DILU, max_iters=80, "
                         "relaxation_factor=0.9, monitor_residual=1, "
                         "convergence=RELATIVE_INI, tolerance=1e-30")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = rng.standard_normal(a.n_rows * 2)
    x, _ = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert rel < 0.2


def test_block_norms_and_history(rng):
    a = _block_poisson(6, 6, 2, rng)
    cfg = amgx.AMGConfig("solver=PCG, max_iters=300, tolerance=1e-8, "
                         "convergence=RELATIVE_INI, monitor_residual=1, "
                         "use_scalar_norm=0")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = rng.standard_normal(a.n_rows * 2)
    x, status = s.solve(b)
    assert status == amgx.SolveStatus.SUCCESS


def test_block_mm_io_roundtrip(tmp_path, rng):
    a = _block_poisson(4, 4, 2, rng)
    p = str(tmp_path / "block.mtx")
    amgx.io.write_system(p, a)
    a2, _, _ = amgx.io.read_system(p)
    assert a2.block_dim == (2, 2)
    assert np.allclose(a2.to_dense(), a.to_dense())


@pytest.mark.parametrize("name", ["KACZMARZ", "MULTICOLOR_ILU"])
def test_block_scalar_expansion_smoothers(name, rng):
    """Block systems run through the scalar-expanded KACZMARZ/ILU paths."""
    a = _block_poisson(6, 6, 2, rng)
    cfg = amgx.AMGConfig(f"solver={name}, max_iters=40, "
                         "relaxation_factor=0.9, monitor_residual=1, "
                         "convergence=RELATIVE_INI, tolerance=1e-30")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = rng.standard_normal(a.n_rows * 2)
    x, _ = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert np.isfinite(rel) and rel < 0.999


def test_block_kpz_polynomial(rng):
    a = _block_poisson(6, 6, 2, rng)
    cfg = amgx.AMGConfig("solver=KPZ_POLYNOMIAL, max_iters=30, "
                         "relaxation_factor=0.9, monitor_residual=1, "
                         "convergence=RELATIVE_INI, tolerance=1e-30")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = rng.standard_normal(a.n_rows * 2)
    x, _ = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert np.isfinite(rel) and rel < 0.999
