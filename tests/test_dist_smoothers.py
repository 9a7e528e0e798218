"""Distributed MULTICOLOR_GS / FIXCOLOR_GS / MULTICOLOR_ILU smoothers and
preconditioners on the 8-device mesh (VERDICT r3 item 5 — the remaining
color-sequential catalog; reference: multicolor_gauss_seidel_solver.cu,
fixcolor_gauss_seidel_solver.cu, multicolor_ilu_solver.cu,
core.cu:372-377 boundary_coloring policies).

boundary_coloring=SYNC_COLORS (default): per-color halo exchange, exact
single-chip convergence parity. boundary_coloring=FIRST/LAST: the color
solves use shard-local by-color triangles — one halo exchange per sweep
instead of per color (asserted structurally below)."""

import numpy as np
import pytest

import jax

import amgx_tpu as amgx
from amgx_tpu.distributed.solve import DistributedSolver, make_mesh
from amgx_tpu.matrix import CSRMatrix

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


def _permuted_poisson(side=10, seed=0):
    a = amgx.gallery.poisson7pt(side, side, side)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    return CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices, s.data)


def _amg_cfg(smoother, **extra):
    sm_scope = {"solver": "AMG", "scope": "amg",
                "algorithm": "CLASSICAL", "selector": "PMIS",
                "interpolator": "D1", "smoother": smoother,
                "relaxation_factor": 1.0, "presweeps": 1,
                "postsweeps": 1, "max_iters": 1,
                "min_coarse_rows": 32, "max_levels": 12, "cycle": "V"}
    sm_scope.update(extra)
    return {"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main", "preconditioner": sm_scope}}


def _run_pair(cfg_dict, a, mesh, tol=1e-8):
    b = np.ones(a.n_rows)
    sv = DistributedSolver(amgx.AMGConfig(cfg_dict), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < tol, (st, r)
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg_dict))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    return sv, s1


def test_amg_mcgs_matches_single_chip(mesh):
    a = amgx.gallery.poisson7pt(12, 12, 12)
    sv, s1 = _run_pair(_amg_cfg("MULTICOLOR_GS"), a, mesh)
    assert sv._mcgs and sv.levels[0].mcolor is not None
    # SYNC_COLORS semantics: per-color halos, single-chip convergence
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_amg_mcgs_local_triangles_converge(mesh):
    """boundary_coloring=FIRST: shard-local triangles (hybrid). Iteration
    count may drift a little from SYNC; convergence must hold."""
    a = _permuted_poisson(10)
    cfg = _amg_cfg("MULTICOLOR_GS", boundary_coloring="FIRST")
    sv, s1 = _run_pair(cfg, a, mesh)
    assert sv._color_local and sv.levels[0].mcgs_tri is not None
    assert sv.last_iters <= s1.last_iters + 5, \
        (sv.last_iters, s1.last_iters)


def test_amg_fixcolor_gs(mesh):
    # FIXCOLOR's round-robin 4-coloring is valid only when no coupling
    # stride is a multiple of 4 (fixcolor_gauss_seidel_solver.cu targets
    # structured grids); a 25-wide 5-pt mesh has strides 1 and 25
    a = amgx.gallery.poisson5pt(25, 25)
    sv, s1 = _run_pair(_amg_cfg("FIXCOLOR_GS"), a, mesh, tol=1e-6)
    assert sv._mcgs_fix4 and sv._mc_nc[0] == 4
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_amg_milu_smoother(mesh):
    """Distributed MULTICOLOR_ILU: hybrid block-Jacobi ILU(0) per shard in
    color order. Convergence within a few iterations of the single-chip
    (global-factorization) smoother."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    sv, s1 = _run_pair(_amg_cfg("MULTICOLOR_ILU"), a, mesh)
    assert sv._milu and sv.levels[0].milu is not None
    assert sv.last_iters <= s1.last_iters + 5, \
        (sv.last_iters, s1.last_iters)


def test_mcgs_preconditioner(mesh):
    a = _permuted_poisson(10)
    b = np.ones(a.n_rows)
    cfg = ("solver=PCG, preconditioner=MULTICOLOR_GS, max_iters=200, "
           "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(amgx.AMGConfig(cfg), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-8, (st, r)
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_milu_preconditioner(mesh):
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = np.ones(a.n_rows)
    cfg = ("solver=PCG, preconditioner=MULTICOLOR_ILU, max_iters=200, "
           "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(amgx.AMGConfig(cfg), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-8, (st, r)
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    # hybrid (per-shard) factorization: a few extra Krylov iterations
    assert sv.last_iters <= s1.last_iters + 6, \
        (sv.last_iters, s1.last_iters)


def test_sweep_cost_collectives(mesh):
    """Sweep-cost gate (VERDICT r3 item 5 done-criterion): with
    boundary_coloring=FIRST the fused program's collective-permute count
    must be independent of the color count — the SYNC_COLORS program pays
    one halo exchange per color per sweep, the local-triangle program one
    per sweep."""
    a = amgx.gallery.poisson7pt(12, 12, 12)

    def cp_count(cfg_dict):
        sv = DistributedSolver(amgx.AMGConfig(cfg_dict), mesh)
        sv.setup(a)
        b_d = sv.levels[0].a.scatter_vector(
            np.ones(a.n_rows, sv._vec_dt), "rows", mesh, sv.axis)
        x_d = sv.levels[0].a.scatter_vector(
            np.zeros(a.n_rows, sv._vec_dt), "rows", mesh, sv.axis)
        txt = sv._jit_solve_fused.lower(
            sv._mat_args, sv._flat_args, b_d, x_d).compile().as_text()
        return (txt.count("collective-permute(")
                + txt.count("collective-permute-start("), sv)

    n_sync, sv_sync = cp_count(_amg_cfg("MULTICOLOR_GS"))
    n_local, sv_local = cp_count(
        _amg_cfg("MULTICOLOR_GS", boundary_coloring="FIRST"))
    nc0 = sv_sync._mc_nc[0]
    assert nc0 and nc0 >= 3
    assert sv_local._color_local and sv_local.levels[0].mcgs_tri
    # the color fori_loop body appears ONCE in HLO text regardless of its
    # nc-trip count, so textual counts understate the runtime difference;
    # the load-bearing structural claims are (a) the local program carries
    # strictly fewer collectives and (b) the per-color work itself — the
    # shard-local triangle apply — lowers with NO collectives at all,
    # which is what makes a local-mode sweep cost one exchange instead of
    # nc (runtime cost: SYNC = nc exchanges/sweep, FIRST/LAST = 1).
    assert n_local < n_sync, (n_local, n_sync)
    from jax.sharding import PartitionSpec as P
    tri = sv_local.levels[0].mcgs_tri[0]
    offs = sv_local._mcgs_tri_static[0][0]

    def tri_apply(t, z):
        t = jax.tree.map(lambda v: v[0], t)
        return DistributedSolver._gs_tri_apply(t, offs, z[0])[None]

    z = sv_local.levels[0].a.scatter_vector(
        np.ones(a.n_rows, sv_local._vec_dt), "rows", mesh, sv_local.axis)
    f = jax.jit(jax.shard_map(
        tri_apply, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("x"), tri), P("x")),
        out_specs=P("x"), check_vma=False))
    txt = f.lower(tri, z).compile().as_text()
    for coll in ("collective-permute", "all-gather", "all-reduce",
                 "all-to-all"):
        assert coll not in txt, f"triangle apply emits {coll}"


def test_amg_kaczmarz_smoother(mesh):
    """Distributed multicolor KACZMARZ smoother (kaczmarz_solver.cu):
    per-shard distance-2 coloring, projections through the sharded A^T
    operand. Hybrid coloring -> convergence within several iterations of
    the single-chip smoother. (Kaczmarz effectively smooths A^T A, so it
    is a weak AMG smoother everywhere — 2 sweeps and a 2-D problem keep
    the V-cycle contractive, matching single-chip behavior.)"""
    a = amgx.gallery.poisson5pt(24, 24)
    cfg = _amg_cfg("KACZMARZ", presweeps=2, postsweeps=2)
    cfg["solver"]["tolerance"] = 1e-8
    cfg["solver"]["max_iters"] = 200
    sv, s1 = _run_pair(cfg, a, mesh)
    assert sv._kacz and sv.levels[0].kacz is not None
    assert sv.levels[0].kacz_at_dm is not None
    assert sv.last_iters <= s1.last_iters + 10, \
        (sv.last_iters, s1.last_iters)


def test_kaczmarz_preconditioner_cimmino(mesh):
    """Cimmino mode (kaczmarz_coloring_needed=0) is coloring-free: the
    damped simultaneous projection is exactly the single-chip iteration,
    so iteration counts must match."""
    a = _permuted_poisson(10)
    b = np.ones(a.n_rows)
    cfg = ("solver=PCG, preconditioner=KACZMARZ, max_iters=400, "
           "kaczmarz_coloring_needed=0, tolerance=1e-8, "
           "convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(amgx.AMGConfig(cfg), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-6, (st, r)
    assert sv.levels[0].kacz[1] is None      # no coloring attached
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_kaczmarz_preconditioner_colored(mesh):
    a = amgx.gallery.poisson5pt(20, 20)
    b = np.ones(a.n_rows)
    cfg = ("solver=PCG, preconditioner=KACZMARZ, max_iters=300, "
           "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(amgx.AMGConfig(cfg), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-6, (st, r)
    assert sv._kacz_nc[0] >= 2


def test_amg_plain_gs_matches_single_chip(mesh):
    """Round-5 (VERDICT r4 item 8c): plain GS runs distributed — it is
    color-sequential on TPU (no sequential-row chain exists to preserve),
    so it rides the multicolor machinery (reference:
    gauss_seidel_solver.cu runs distributed)."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    sv, s1 = _run_pair(_amg_cfg("GS"), a, mesh)
    assert sv._mcgs and not sv._mcgs_fix4
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_plain_gs_preconditioner_distributed(mesh):
    a = _permuted_poisson(8)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=GS, max_iters=200, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(cfg, mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    assert st == 0 and r < 1e-7, (st, r)


def test_bsr_multicolor_gs_distributed(mesh):
    """Round 5: BSR systems smooth with distributed MULTICOLOR_GS
    natively (block-row colors expand to scalar slots, block inverse
    diagonal) instead of raising to the single-chip solver."""
    rng = np.random.default_rng(0)
    base = amgx.gallery.poisson5pt(14, 14)
    sb = base.to_scipy().tocsr()
    coup = rng.standard_normal((4, 4)) * 0.15 + np.eye(4)
    data4 = np.einsum("k,ij->kij", sb.data, coup)
    a4 = CSRMatrix(base.n_rows, base.n_cols, sb.indptr, sb.indices,
                   data4, block_dim=(4, 4))
    b = np.ones(a4.n_rows * 4)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 200, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "MULTICOLOR_GS",
                           "relaxation_factor": 0.9,
                           "presweeps": 1, "postsweeps": 1,
                           "max_iters": 1, "min_coarse_rows": 16,
                           "max_levels": 8, "cycle": "V"}}})
    sv = DistributedSolver(cfg, mesh)
    sv.setup(a4)
    assert sv._mcgs
    x, st = sv.solve(b)
    import scipy.sparse as sp
    A = sp.bsr_matrix((a4.data, a4.indices, a4.indptr),
                      shape=(a4.n_rows * 4, a4.n_cols * 4)).tocsr()
    rel = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-7, (st, rel)
    # local-triangle mode stays an honest guard for BSR
    cfg2 = amgx.AMGConfig(_amg_cfg("MULTICOLOR_GS",
                                   boundary_coloring="FIRST"))
    sv2 = DistributedSolver(cfg2, mesh)
    with pytest.raises(NotImplementedError):
        sv2.setup(a4)
