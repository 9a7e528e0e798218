"""Krylov convergence tests on generated Poisson (mirrors
core/tests/fgmres_convergence_poisson.cu, IDR_Convergence_Poisson.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx


def _solve(cfg_str, a, b, **json_cfg):
    cfg = amgx.AMGConfig(cfg_str or json_cfg)
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    x, status = s.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x))
    return s, status, r / np.linalg.norm(b)


A2D = amgx.gallery.poisson5pt(16, 16)
B2D = np.ones(A2D.n_rows)


@pytest.mark.parametrize("solver", ["CG", "PCG", "PCGF", "BICGSTAB",
                                    "PBICGSTAB", "GMRES", "FGMRES", "IDR",
                                    "IDRMSYNC"])
def test_krylov_converges(solver):
    s, status, rel = _solve(
        f"solver={solver}, max_iters=300, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.SUCCESS
    assert rel < 1e-6


def test_cg_iteration_count_scales():
    # CG iteration count ~ O(n) for 1D-ish conditioning; sanity bound
    s, status, rel = _solve(
        "solver=CG, max_iters=200, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.SUCCESS
    assert 10 <= s.last_iters <= 120


def test_preconditioned_faster_than_plain():
    s0, _, _ = _solve("solver=CG, max_iters=500, tolerance=1e-8, "
                      "convergence=RELATIVE_INI, monitor_residual=1",
                      A2D, B2D)
    cfg = amgx.AMGConfig({
        "config_version": 2,
        "solver": {"solver": "PCG", "max_iters": 500, "tolerance": 1e-8,
                   "convergence": "RELATIVE_INI", "monitor_residual": 1,
                   "scope": "main",
                   "preconditioner": {"solver": "AMG", "scope": "amg",
                                      "algorithm": "AGGREGATION",
                                      "selector": "SIZE_2",
                                      "smoother": "JACOBI_L1",
                                      "max_iters": 1, "cycle": "V",
                                      "presweeps": 1, "postsweeps": 1,
                                      "min_coarse_rows": 16}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(A2D))
    x, status = s.solve(B2D)
    assert status == amgx.SolveStatus.SUCCESS
    assert s.last_iters < s0.last_iters


def test_gmres_restart():
    s, status, rel = _solve(
        "solver=GMRES, max_iters=300, gmres_n_restart=30, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6
    # short restarts stagnate on unpreconditioned Poisson (expected GMRES(m)
    # behavior) but must still decrease monotonically
    s5, st5, _ = _solve(
        "solver=GMRES, max_iters=50, gmres_n_restart=5, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    h = [float(np.atleast_1d(v)[0]) for v in s5.res_history]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(h, h[1:]))


def test_chebyshev_solver():
    s, status, rel = _solve(
        "solver=CHEBYSHEV, chebyshev_lambda_estimate_mode=1, "
        "chebyshev_eigenvalue_maxits=20, max_iters=600, tolerance=1e-6, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.SUCCESS


def test_convergence_criteria_absolute():
    s, status, _ = _solve(
        "solver=CG, max_iters=300, tolerance=1e-6, convergence=ABSOLUTE, "
        "monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.SUCCESS
    assert np.atleast_1d(s.res_history[-1])[0] <= 1e-6


def test_residual_history_monotone_cg():
    s, status, _ = _solve(
        "solver=CG, max_iters=300, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1, "
        "store_res_history=1", A2D, B2D)
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    assert h[-1] < h[0] * 1e-6


def test_min_iters_respected():
    s, status, _ = _solve(
        "solver=CG, max_iters=50, min_iters=10, tolerance=1e-1, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert s.last_iters >= 10


def test_not_converged_status():
    s, status, _ = _solve(
        "solver=CG, max_iters=2, tolerance=1e-14, "
        "convergence=RELATIVE_INI, monitor_residual=1", A2D, B2D)
    assert status == amgx.SolveStatus.NOT_CONVERGED


def test_iterative_refinement_mixed_precision():
    """f32 inner solve + f64 refinement reaches f64 accuracy
    (SURVEY.md §7.3 mixed-precision pattern)."""
    from amgx_tpu.refinement import solve_refined
    a = amgx.gallery.poisson5pt(12, 12)
    b = np.linspace(1.0, 2.0, a.n_rows)
    cfg = amgx.AMGConfig("solver=PCG, preconditioner=BLOCK_JACOBI, "
                         "max_iters=60, tolerance=1e-5, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    x, status, hist = solve_refined(cfg, a, b, tolerance=1e-12,
                                    inner_mode="dFFI")
    assert status == amgx.SolveStatus.SUCCESS
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert rel < 1e-11            # beyond f32-only accuracy
    assert len(hist) >= 2 and hist[-1] < hist[0]


def test_fine_level_reordering(rng):
    """fine_level_reordering=AUTO: a scrambled stencil matrix is RCM'd back
    to a narrow band layout; vectors map through the API boundary; NONE and
    RCM agree with AUTO."""
    import amgx_tpu as amgx
    from amgx_tpu.ops.band import permute_square
    a = amgx.gallery.poisson5pt(40, 40)
    ash = permute_square(a, rng.permutation(a.n_rows))
    b = rng.standard_normal(a.n_rows)
    sols = {}
    for mode in ("NONE", "AUTO", "RCM"):
        cfg = amgx.AMGConfig(
            "solver=CG, max_iters=400, tolerance=1e-10, "
            "convergence=RELATIVE_INI, monitor_residual=1, "
            f"fine_level_reordering={mode}")
        s = amgx.SolverFactory.allocate(cfg)
        s.setup(amgx.Matrix(ash))
        x, st = s.solve(b)
        xv = s.extract_vector(x)
        rel = np.linalg.norm(b - ash.to_scipy() @ xv) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-8
        sols[mode] = xv
        if mode == "AUTO":
            assert s._perm is not None          # heuristic fired
            assert s.op.strips.shape[2] <= 512  # narrow band recovered
    assert np.allclose(sols["AUTO"], sols["NONE"], atol=1e-8)
    # natural ordering: AUTO must NOT permute (DIA already optimal)
    cfg = amgx.AMGConfig("solver=CG, max_iters=5, tolerance=1e-10, "
                         "monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    assert s._perm is None


def test_fine_level_reordering_resetup(rng):
    """replace_coefficients + resetup re-derives the RCM permutation from
    the user's handle — vectors stay consistent across the boundary."""
    import amgx_tpu as amgx
    from amgx_tpu.ops.band import permute_square
    a = amgx.gallery.poisson5pt(40, 40)
    ash = permute_square(a, rng.permutation(a.n_rows))
    b = rng.standard_normal(a.n_rows)
    A0 = ash.to_scipy().copy()       # Matrix(ash) aliases ash — snapshot
    m = amgx.Matrix(ash)
    cfg = amgx.AMGConfig(
        "solver=CG, max_iters=400, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(m)
    assert s._perm is not None
    m.replace_coefficients(np.asarray(ash.data) * 2.0)
    s.resetup()
    x, st = s.solve(b)
    rel = np.linalg.norm(b - 2 * A0 @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert st == 0 and rel < 1e-8


def test_nested_solver_inherits_parent_mode():
    """A preconditioner without an explicit mode in its own scope must
    inherit the parent's resolved mode via the matrix handle (reference:
    the mode template parameter is threaded through allocation) — not
    fall back to the registry default and silently promote precision."""
    from amgx_tpu.matrix import CSRMatrix
    rng = np.random.default_rng(5)
    p = amgx.gallery.poisson5pt(12, 12)
    data = p.data.astype(np.complex128) * \
        np.exp(0.1j * rng.standard_normal(p.nnz))
    a = CSRMatrix(p.n_rows, p.n_cols, p.indptr, p.indices, data)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "FGMRES", "max_iters": 300, "tolerance": 1e-7,
        "mode": "dCCI", "gmres_n_restart": 40,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "BLOCK_JACOBI", "scope": "p",
                           "max_iters": 1}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode="dCCI"))
    assert s.preconditioner.mode == "dCCI"
    z = s.precond()(s.prepare_vector(np.ones(a.n_rows, np.complex128)))
    assert z.dtype == np.complex64
    x, st = s.solve(np.ones(a.n_rows, np.complex128))
    assert st == 0


def test_refined_solver_resetup(rng):
    """RefinedSolver.resetup (round 5): values-only time step through the
    structure-reuse + device value-update path, refreshing the f64
    residual operator."""
    from amgx_tpu.refinement import RefinedSolver
    a = amgx.gallery.poisson7pt(10, 10, 10)
    A0 = a.to_scipy().copy()
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": 20, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": "dFFI", "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        "interp_max_elements": 4, "structure_reuse_levels": -1,
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 16,
        "max_levels": 10, "cycle": "V", "dense_threshold_rows": 512}})
    rs = RefinedSolver(cfg, inner_mode="dFFI")
    rs.setup(a)
    x, st, _ = rs.solve(b, max_refinements=12, tolerance=1e-10)
    assert st == amgx.SolveStatus.SUCCESS
    a0 = np.array(a.data)
    for scale in (1.5, 0.7):
        rs.resetup(a0 * scale)
        x, st, _ = rs.solve(b, max_refinements=12, tolerance=1e-10)
        rel = np.linalg.norm(b - scale * A0 @ x) / np.linalg.norm(b)
        assert st == amgx.SolveStatus.SUCCESS and rel < 1e-9, (scale, rel)
