"""Smoother tests (mirrors core/tests/scalar_smoother_poisson.cu,
smoother_block_poisson.cu, ilu_dilu_equivalence.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx

A = amgx.gallery.poisson5pt(12, 12)
B = np.ones(A.n_rows)

SMOOTHERS = ["BLOCK_JACOBI", "JACOBI_L1", "GS", "MULTICOLOR_GS",
             "FIXCOLOR_GS", "MULTICOLOR_DILU", "MULTICOLOR_ILU",
             "KACZMARZ", "CHEBYSHEV_POLY", "POLYNOMIAL", "KPZ_POLYNOMIAL",
             "CF_JACOBI"]


def _smoother_error_reduction(name, sweeps=30, extra=""):
    cfg = amgx.AMGConfig(
        f"solver={name}, max_iters={sweeps}, relaxation_factor=0.8, "
        f"monitor_residual=1, convergence=RELATIVE_INI, tolerance=1e-30"
        + (", " + extra if extra else ""))
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(A))
    x, _ = s.solve(B)
    r = np.linalg.norm(B - A.to_scipy() @ s.extract_vector(x))
    return r / np.linalg.norm(B)


@pytest.mark.parametrize("name", SMOOTHERS)
def test_smoother_reduces_residual(name):
    rel = _smoother_error_reduction(name)
    assert np.isfinite(rel)
    # Kaczmarz iterates on the normal equations -> cond^2-limited rate;
    # everyone else must make clear progress in 30 sweeps
    bound = 0.999 if name in ("KACZMARZ", "KPZ_POLYNOMIAL") else 0.9
    assert rel < bound


@pytest.mark.parametrize("name", ["MULTICOLOR_DILU", "MULTICOLOR_ILU",
                                  "MULTICOLOR_GS"])
def test_multicolor_strong_smoothers(name):
    # the workhorse smoothers converge standalone at the GS-like rate
    # (~0.93/sweep on this 144-dof Poisson)
    rel = _smoother_error_reduction(name, sweeps=100)
    assert rel < 5e-2


def test_ilu_dilu_similar_strength():
    """ilu_dilu_equivalence analog: ILU(0) and DILU give comparable
    convergence on Poisson (identical on tridiagonal structure)."""
    r_ilu = _smoother_error_reduction("MULTICOLOR_ILU", sweeps=20)
    r_dilu = _smoother_error_reduction("MULTICOLOR_DILU", sweeps=20)
    assert abs(np.log10(r_ilu) - np.log10(r_dilu)) < 3


def test_block_jacobi_on_block_matrix(rng):
    n = 16
    data = rng.standard_normal((3 * n - 2, 2, 2))
    rows = np.concatenate([np.arange(n), np.arange(n - 1),
                           np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n),
                           np.arange(n - 1)])
    from amgx_tpu.matrix import CSRMatrix
    for k in range(n):      # make block-diagonally dominant
        data[k] = data[k] + 8 * np.eye(2)
    m = CSRMatrix.from_coo(n, n, rows, cols, data, block_dim=(2, 2))
    cfg = amgx.AMGConfig("solver=BLOCK_JACOBI, max_iters=200, "
                         "relaxation_factor=0.9, monitor_residual=1, "
                         "convergence=RELATIVE_INI, tolerance=1e-8")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(m))
    b = rng.standard_normal(2 * n)
    x, status = s.solve(b)
    r = np.linalg.norm(b - m.to_dense() @ s.extract_vector(x))
    assert r / np.linalg.norm(b) < 1e-6


def test_zero_initial_guess_optimization():
    cfg = amgx.AMGConfig("solver=BLOCK_JACOBI, max_iters=1, "
                         "smooth_with_0_initial_guess=1, "
                         "relaxation_factor=1.0")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(A))
    x, _ = s.solve(B, zero_initial_guess=True)
    # one damped-Jacobi sweep from zero: x = D^{-1} b
    d = A.diagonal()
    assert np.allclose(s.extract_vector(x), B / d)


def test_cf_jacobi_uses_cf_map():
    csr = amgx.gallery.poisson5pt(8, 8)
    cf = np.full(csr.n_rows, -1)
    c = np.arange(0, csr.n_rows, 2)
    cf[c] = np.arange(c.size)
    csr.aux["cf_map"] = cf
    cfg = amgx.AMGConfig("solver=CF_JACOBI, max_iters=40, "
                         "cf_smoothing_mode=2, relaxation_factor=0.9, "
                         "monitor_residual=1, convergence=RELATIVE_INI, "
                         "tolerance=1e-30")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(csr))
    b = np.ones(csr.n_rows)
    x, _ = s.solve(b)
    rel = np.linalg.norm(b - csr.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert rel < 0.5


def test_gs_symmetric_variant():
    rel_f = _smoother_error_reduction("MULTICOLOR_GS", sweeps=10)
    rel_s = _smoother_error_reduction("MULTICOLOR_GS", sweeps=10,
                                      extra="symmetric_GS=1")
    assert rel_s <= rel_f * 1.5    # symmetric sweeps at least comparable


def test_scalers():
    for scaling in ("DIAGONAL_SYMMETRIC", "BINORMALIZATION",
                    "NBINORMALIZATION"):
        a = amgx.gallery.poisson5pt(8, 8)
        # unbalance the system
        d = np.repeat(np.logspace(0, 3, a.n_rows), a.row_nnz())
        a.data = a.data * d
        # row scaling breaks symmetry -> BiCGStab, not CG
        cfg = amgx.AMGConfig(
            f"solver=BICGSTAB, scaling={scaling}, max_iters=500, "
            "tolerance=1e-9, convergence=RELATIVE_INI, monitor_residual=1")
        s = amgx.SolverFactory.allocate(cfg)
        m = amgx.Matrix(a)
        import copy
        orig = a.to_scipy().copy()
        b = np.ones(a.n_rows)
        s.setup(m)
        x, status = s.solve(b)
        r = np.linalg.norm(b - orig @ s.extract_vector(x))
        assert status == amgx.SolveStatus.SUCCESS
        assert r / np.linalg.norm(b) < 1e-5, scaling


def test_scalers_block_and_complex():
    """Scalers on BSR (block rows scale uniformly by their block-row
    factor, vector transforms expand to scalar rows) and on complex
    systems (abs-based real scale vectors)."""
    from amgx_tpu.matrix import CSRMatrix
    rng = np.random.default_rng(5)
    # block system with unbalanced block rows
    base = amgx.gallery.poisson5pt(8, 8)
    coupling = rng.standard_normal((2, 2)) * 0.2
    coupling = coupling @ coupling.T + np.eye(2)
    scale = np.logspace(0, 3, base.n_rows)
    rows = np.repeat(np.arange(base.n_rows), base.row_nnz())
    data = np.einsum("k,ij->kij", base.data * scale[rows], coupling)
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(2, 2))
    orig = a.to_scipy().copy()
    b = np.ones(a.n_rows * 2)
    cfg = amgx.AMGConfig(
        "solver=BICGSTAB, scaling=BINORMALIZATION, max_iters=600, "
        "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    x, status = s.solve(b)
    r = np.linalg.norm(b - orig @ s.extract_vector(x)) / np.linalg.norm(b)
    assert status == amgx.SolveStatus.SUCCESS and r < 1e-5
    # complex system, unbalanced rows
    c = amgx.gallery.poisson5pt(8, 8)
    crows = np.repeat(np.logspace(0, 3, c.n_rows), c.row_nnz())
    cdata = c.data * crows * np.exp(0.3j * rng.standard_normal(c.nnz))
    ac = CSRMatrix(c.n_rows, c.n_cols, c.indptr, c.indices, cdata)
    origc = ac.to_scipy().copy()
    bc = np.ones(ac.n_rows, np.complex128)
    cfg = amgx.AMGConfig(
        "solver=GMRES, scaling=DIAGONAL_SYMMETRIC, max_iters=300, "
        "gmres_n_restart=50, mode=dZZI, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(ac))
    x, status = s.solve(bc)
    r = np.linalg.norm(bc - origc @ s.extract_vector(x)) / \
        np.linalg.norm(bc)
    assert status == amgx.SolveStatus.SUCCESS and r < 1e-5


def test_chebyshev_amg_smoother_converges():
    """CHEBYSHEV as the AMG in-cycle smoother: the mode-0 lambda bounds are
    taken on D^-1 A, so the unpreconditioned iteration must run
    Jacobi-preconditioned to match (reference: cheb_solver.cu estimates the
    iterated operator). Regression: this diverged when the iteration ran on
    plain A with D^-1 A bounds."""
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(12, 12, 12)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 60, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_8",
                           "smoother": "CHEBYSHEV", "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 64, "max_levels": 12,
                           "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(a.n_rows)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert st == 0 and rel < 1e-6 and s.last_iters <= 40


def test_two_stage_gs_standalone_relaxation():
    """TWO_STAGE_GS (TPU extension, arXiv:2104.01196): GS approximated by
    inner Jacobi sweeps on the triangular solve — pure SpMV shape, no
    coloring. Standalone relaxation must converge at a GS-like rate."""
    a = amgx.gallery.poisson5pt(8, 8)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig(
        "solver=TWO_STAGE_GS, max_iters=300, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1, "
        "relaxation_factor=1.0")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    x, st = s.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x))
    assert st == 0 and r < 1e-7


def test_two_stage_gs_symmetric_amg_smoother_beats_jacobi():
    """Symmetric two-stage GS is an SPD preconditioner: PCG + classical
    AMG with it must need no more iterations than damped Jacobi."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = np.ones(a.n_rows)

    def run(smoother):
        cfg = amgx.AMGConfig({"config_version": 2, "solver": {
            "solver": "PCG", "max_iters": 200, "tolerance": 1e-10,
            "convergence": "RELATIVE_INI", "monitor_residual": 1,
            "scope": "main",
            "preconditioner": {"solver": "AMG", "scope": "amg",
                               "algorithm": "CLASSICAL",
                               "selector": "PMIS", "interpolator": "D2",
                               "smoother": smoother,
                               "presweeps": 1, "postsweeps": 1,
                               "max_iters": 1, "min_coarse_rows": 32,
                               "max_levels": 12, "cycle": "V"}}})
        s = amgx.SolverFactory.allocate(cfg)
        s.setup(amgx.Matrix(a))
        x, st = s.solve(b)
        rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
            np.linalg.norm(b)
        assert st == 0 and rel < 1e-8, (smoother, st, rel)
        return s.last_iters

    it_gs2 = run({"solver": "TWO_STAGE_GS", "scope": "gs",
                  "symmetric_GS": 1, "gs_inner_sweeps": 2,
                  "relaxation_factor": 1.0})
    it_jac = run({"solver": "BLOCK_JACOBI", "scope": "jac",
                  "relaxation_factor": 0.7})
    assert it_gs2 <= it_jac
