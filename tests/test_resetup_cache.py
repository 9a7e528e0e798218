"""Compiled-program reuse across value-only re-setups.

The reference's time-stepping path (AMGX_matrix_replace_coefficients +
AMGX_solver_resetup, amgx_c.h:304-309) assumes setup/solve per step is
cheap. Under JAX a retrace costs ~0.5 s on CPU and a full remote compile
through a TPU tunnel, so the solve programs take the whole device-state
pytree as a jit operand (Solver._device_state): same structure -> same
compiled program, fresh buffers. These tests pin that behavior.
"""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix


@pytest.fixture(scope="module", autouse=True)
def _init():
    amgx.initialize()


def _scaled(a: CSRMatrix, f: float) -> CSRMatrix:
    return CSRMatrix(a.n_rows, a.n_cols, a.indptr, a.indices, a.data * f)


def test_fused_pcg_amg_no_retrace():
    a = amgx.gallery.poisson5pt(24, 24)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 200, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "CHEBYSHEV",
                           "chebyshev_polynomial_order": 3,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 6,
                           "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    x, st = s.solve(b)
    assert st == 0
    # time step: same structure, new values (includes new Chebyshev bounds)
    a2 = _scaled(a, 2.5)
    s.setup(amgx.Matrix(a2))
    x2, st2 = s.solve(b)
    r2 = np.linalg.norm(b - a2.to_scipy() @ s.extract_vector(x2))
    assert st2 == 0 and r2 < 1e-7
    for _sig, fn in (s._jit_fused or {}).values():
        assert fn._cache_size() == 1, "value-only re-setup retraced"
    # matches a from-scratch solver bit-for-bit
    sf = amgx.SolverFactory.allocate(cfg)
    sf.setup(amgx.Matrix(a2))
    xf, _ = sf.solve(b)
    assert np.abs(s.extract_vector(x2) - sf.extract_vector(xf)).max() == 0.0


def test_monitored_gmres_no_retrace():
    """The non-fused (host-monitored) path reuses its per-iteration
    programs too."""
    a = amgx.gallery.poisson5pt(16, 16)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig(
        "config_version=2, solver=FGMRES, preconditioner=BLOCK_JACOBI, "
        "max_iters=150, gmres_n_restart=30, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1, fused_solve=0")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    s.solve(b)
    it_fn = s._jit_iteration
    assert it_fn is not None
    s.setup(amgx.Matrix(_scaled(a, 0.3)))
    x2, st2 = s.solve(b)
    assert st2 == 0
    assert s._jit_iteration is it_fn and it_fn._cache_size() == 1
    r = np.linalg.norm(b - 0.3 * a.to_scipy() @ s.extract_vector(x2))
    assert r < 1e-7


def test_structure_reuse_reaches_nested_amg():
    """Solver.resetup routes to the preconditioner's resetup, so
    structure_reuse_levels=-1 on the AMG child skips re-coarsening
    (reference: AMG_Solver::setup structure_reuse gate,
    amg_solver.cu:201-207) — pinned by intercepting the selector."""
    import amgx_tpu.amg.aggregation as agg_mod
    a = amgx.gallery.poisson5pt(24, 24)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 200, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "structure_reuse_levels": -1,
                           "relaxation_factor": 0.7,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 6,
                           "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    s.solve(b)
    calls = {"n": 0}
    orig = agg_mod.select_aggregates

    def spy(*args, **kw):
        calls["n"] += 1
        return orig(*args, **kw)

    agg_mod.select_aggregates = spy
    try:
        s.resetup(amgx.Matrix(_scaled(a, 1.5)))
    finally:
        agg_mod.select_aggregates = orig
    assert calls["n"] == 0, "structure reuse re-ran the selector"
    x, st = s.solve(b)
    a2 = _scaled(a, 1.5)
    r = np.linalg.norm(b - a2.to_scipy() @ s.extract_vector(x))
    assert st == 0 and r < 1e-6


def test_partial_structure_reuse_rebuilds_lower_levels():
    """0 < structure_reuse_levels < depth: the reused prefix keeps P/R,
    the rebuilt sub-hierarchy below it must be spliced in (not discarded)
    so no level solves with stale coefficients."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 200, "tolerance": 1e-9,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "structure_reuse_levels": 1,
                           "relaxation_factor": 0.7,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 8,
                           "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    assert len(s.preconditioner.amg.levels) >= 3
    s.solve(b)
    a2 = _scaled(a, 10.0)      # large scale: stale coarse ops would show
    s.resetup(amgx.Matrix(a2))
    for lvl in s.preconditioner.amg.levels[1:]:
        # every coarse operator must reflect the new values
        assert abs(lvl.m.csr.data).max() > 5.0, "stale coarse operator"
    x, st = s.solve(b)
    r = np.linalg.norm(b - a2.to_scipy() @ s.extract_vector(x))
    assert st == 0 and r < 1e-6


def test_distributed_resetup_reuses_program():
    """DistributedSolver._build_step memoizes the SPMD programs on their
    static signature: a values-only resetup must not rebuild/retrace."""
    import jax
    from amgx_tpu.distributed.solve import DistributedSolver, make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 12,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, make_mesh(8))
    s.setup(a)
    s.solve(b)
    fused = s._jit_solve_fused
    a2 = _scaled(a, 3.0)
    s.resetup(a2)
    assert s._jit_solve_fused is fused, "resetup rebuilt the SPMD program"
    x2, st2 = s.solve(b)
    assert fused._cache_size() == 1, "values-only resetup retraced"
    r2 = np.linalg.norm(b - a2.to_scipy() @ np.asarray(x2))
    assert st2 == 0 and r2 < 1e-7


def test_static_metadata_change_invalidates_cache():
    """jax's cache key sees operand shapes, not Python statics baked into
    the trace (e.g. the color count driving GS's unrolled sweep). The
    static-signature guard must invalidate the compiled programs when
    such statics change even though operand shapes match."""
    import scipy.sparse as sp
    a1 = amgx.gallery.poisson5pt(16, 16)
    n = a1.n_rows
    m = sp.random(n, n, density=5.0 / n, random_state=2, format="csr")
    m = m + m.T + sp.eye(n) * 10
    a2 = CSRMatrix.from_scipy(m.tocsr())
    cfg = amgx.AMGConfig(
        "solver=GS, max_iters=60, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1, fused_solve=1")
    s = amgx.SolverFactory.allocate(cfg)
    b = np.ones(n)
    s.setup(amgx.Matrix(a1))
    s.solve(b)
    nc1 = s.m.coloring.num_colors
    s.setup(amgx.Matrix(a2))
    assert s.m.coloring.num_colors != nc1, "fixture lost its point"
    x2, _ = s.solve(b)
    sf = amgx.SolverFactory.allocate(cfg)
    sf.setup(amgx.Matrix(a2))
    xf, _ = sf.solve(b)
    assert np.abs(s.extract_vector(x2) - sf.extract_vector(xf)).max() \
        == 0.0, "stale compiled program survived a static-metadata change"


def test_structure_change_recompiles_correctly():
    """A different sparsity/shape must produce correct answers (fresh
    compile keyed by the operand treedef), not stale-shape errors."""
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
        "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    for nx in (16, 20):
        a = amgx.gallery.poisson5pt(nx, nx)
        b = np.ones(a.n_rows)
        s.setup(amgx.Matrix(a))
        x, st = s.solve(b)
        r = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x))
        assert st == 0 and r < 1e-7, (nx, st, r)


def test_value_update_plans_bitwise(rng):
    """Round 5: value-only device updates (ops/value_update) produce the
    same device arrays as a full rebuild, for every layout that attaches
    a plan (DIA, band, ELL, dense)."""
    import jax.numpy as jnp
    from amgx_tpu.matrix import csr_to_ell, csr_to_dense_op
    from amgx_tpu.ops.spmv import csr_to_dia
    from amgx_tpu.ops.band import csr_to_band, permute_square
    from amgx_tpu.ops.value_update import try_value_update
    import amgx_tpu as amgx

    a = amgx.gallery.poisson5pt(24, 24)

    def new_vals(csr):
        c = csr.__class__(csr.n_rows, csr.n_cols, csr.indptr, csr.indices,
                          csr.data * 1.7 + 0.01, block_dim=csr.block_dim)
        c.diag_data = None if csr.diag_data is None else \
            csr.diag_data * 1.7 + 0.01
        return c

    cases = []
    cases.append(("dia", csr_to_dia, a, "bands"))
    ash = permute_square(a, rng.permutation(a.n_rows))
    from amgx_tpu.ops.band import rcm_permutation
    ab = permute_square(ash, rcm_permutation(ash))
    cases.append(("band", csr_to_band, ab, "strips"))
    cases.append(("ell", csr_to_ell, a, "vals"))
    cases.append(("dense", csr_to_dense_op, a, "a"))
    for name, builder, csr, field in cases:
        donor = builder(csr, dtype=np.float64)
        assert donor is not None and getattr(donor, "_vu", None), name
        c2 = new_vals(csr)
        upd = try_value_update(donor, c2, np.float64)
        assert upd is not None, name
        ref = builder(c2, dtype=np.float64)
        got = np.asarray(getattr(upd, field))
        want = np.asarray(getattr(ref, field))
        assert np.array_equal(got, want), name
        # structure change must refuse the plan
        import scipy.sparse as sp
        s = csr.to_scipy().tolil()
        s[0, min(5, csr.n_cols - 1)] = 3.3
        s = s.tocsr()
        c3 = csr.__class__(csr.n_rows, csr.n_cols, s.indptr, s.indices,
                           s.data)
        assert try_value_update(donor, c3, np.float64) is None, name


def test_resetup_uses_value_update(rng):
    """A values-only resetup routes level operators through the donor
    path (no full host repack) and solves identically to a fresh setup."""
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(12, 12, 12)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": 25, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        "interp_max_elements": 4, "presweeps": 1, "postsweeps": 1,
        "min_coarse_rows": 16, "max_levels": 10, "cycle": "V",
        "structure_reuse_levels": -1}})
    s = amgx.SolverFactory.allocate(cfg)
    m = amgx.Matrix(a)
    A0 = a.to_scipy().copy()          # Matrix(a) aliases a — snapshot
    s.setup(m)
    b = rng.standard_normal(a.n_rows)
    s.solve(b)
    m.replace_coefficients(np.asarray(a.data) * 2.0)
    s.resetup()
    # the reused levels' ops must carry the donor plan forward
    for lvl in s.amg.levels[:-1]:
        op = lvl.m._device_op
        if op is not None and hasattr(op, "_vu"):
            break
    else:
        raise AssertionError("no level op carries a value-update plan")
    x, st = s.solve(b)
    xv = s.extract_vector(x)
    rel = np.linalg.norm(b - 2 * A0 @ xv) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-7
    # fresh-setup equivalence
    a2 = amgx.gallery.poisson7pt(12, 12, 12)
    a2.data = np.asarray(a2.data) * 2.0
    sf = amgx.SolverFactory.allocate(cfg)
    sf.setup(amgx.Matrix(a2))
    xf, _ = sf.solve(b)
    assert np.allclose(xv, sf.extract_vector(xf), atol=1e-10)


def test_g5_value_update_bitwise(rng):
    """G5 (gather) value-update plan: structure-validated pair-sort
    permutation + device scatter reproduces a full repack bitwise."""
    from amgx_tpu.ops.gather_spmv import csr_to_gather
    from amgx_tpu.ops.value_update import try_value_update
    import amgx_tpu as amgx
    import jax.numpy as jnp
    a = amgx.gallery.poisson7pt(12, 12, 12)
    p = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[p][:, p].tocsr()
    csr = CSRMatrix(a.n_rows, a.n_cols, s.indptr, s.indices,
                    s.data.astype(np.float32))
    donor = csr_to_gather(csr, dtype=np.float32)
    assert donor is not None and getattr(donor, "_vu", None) is not None
    c2 = CSRMatrix(csr.n_rows, csr.n_cols, csr.indptr, csr.indices,
                   csr.data * 1.7 + 0.01)
    upd = try_value_update(donor, c2, np.float32)
    assert upd is not None
    ref = csr_to_gather(c2, dtype=np.float32)
    assert np.array_equal(np.asarray(upd.vals), np.asarray(ref.vals))
    x = rng.standard_normal(csr.n_rows).astype(np.float32)
    assert np.array_equal(np.asarray(upd.apply(jnp.asarray(x))),
                          np.asarray(ref.apply(jnp.asarray(x))))
