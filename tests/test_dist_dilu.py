"""Distributed MULTICOLOR_DILU (the reference's workhorse AMG smoother,
core/src/solvers/multicolor_dilu_solver.cu) on the 8-device mesh.

Shard-parallel pieces with exact single-chip parity:
  * dist_color — Jones-Plassmann with global-id hash weights (only ghost
    STATUS crosses shards per round, the weights are recomputable from
    ids; boundary_coloring=SYNC_COLORS semantics, core.cu:372-377);
  * dist_dilu_factor — color-sequential E diagonal with one halo-row
    fetch for a_ji and one boundary invE exchange per color;
  * _dilu_smooth — each color step's SpMV carries its own halo exchange
    inside the SPMD program, so convergence matches single-chip exactly.
"""

import numpy as np
import pytest

import jax

import amgx_tpu as amgx
from amgx_tpu.coloring import color_matrix
from amgx_tpu.distributed.setup import (ShardedCSR, dist_color,
                                        dist_dilu_factor)
from amgx_tpu.distributed.partition import RowPartition
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


@pytest.mark.parametrize("case", ["poisson", "permuted"])
def test_dist_coloring_bitwise_parity(case):
    a = amgx.gallery.poisson7pt(10, 10, 10) if case == "poisson" \
        else _permuted_poisson()
    sm = ShardedCSR.from_global(a, RowPartition.equal(a.n_rows, N_DEV))
    colors, nc = dist_color(sm)
    ref = color_matrix(a, "PARALLEL_GREEDY", amgx.AMGConfig(""), "default")
    assert nc == ref.num_colors
    assert np.array_equal(np.concatenate(colors), ref.colors)


def test_dist_dilu_factor_parity():
    a = _permuted_poisson()
    sm = ShardedCSR.from_global(a, RowPartition.equal(a.n_rows, N_DEV))
    colors, nc = dist_color(sm)
    cd = np.concatenate(colors)
    # single-chip factorization (multicolor.MulticolorDILUSolver setup)
    A = a.to_scipy().tocsr()
    H = A.multiply(A.T).tocsr()
    diag = A.diagonal().astype(np.float64)
    E = diag.copy()
    done = np.zeros(a.n_rows)
    for c in range(nc):
        rows = cd == c
        if c > 0:
            E[rows] = diag[rows] - H[rows] @ done
        done[rows] = 1.0 / np.where(E[rows] == 0, 1.0, E[rows])
    e_d, _ = dist_dilu_factor(sm, colors, nc)
    assert np.allclose(np.concatenate(e_d), E, rtol=1e-14, atol=0)


def test_pcg_amg_dilu_matches_single_chip(mesh):
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = np.ones(a.n_rows)
    cfgd = {"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "CLASSICAL", "selector": "PMIS",
                           "interpolator": "D1",
                           "smoother": "MULTICOLOR_DILU",
                           "relaxation_factor": 1.0, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 12,
                           "cycle": "V"}}}
    sv = DistributedSolver(amgx.AMGConfig(cfgd), mesh)
    sv.setup(a)
    assert sv._dilu and sv.levels[0].dilu is not None
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-8, (st, r)

    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfgd))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    # VERDICT r2 item 4 done-criterion: within +-1 iteration of single-chip
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_dilu_preconditioner_matches_single_chip(mesh):
    a = _permuted_poisson(12)
    b = np.ones(a.n_rows)
    cfg_s = ("solver=PCG, preconditioner=MULTICOLOR_DILU, max_iters=200, "
             "tolerance=1e-10, convergence=RELATIVE_INI, "
             "monitor_residual=1")
    sv = DistributedSolver(amgx.AMGConfig(cfg_s), mesh)
    sv.setup(a)
    x, st = sv.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-8, (st, r)
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg_s))
    s1.setup(amgx.Matrix(a))
    _, st1 = s1.solve(b)
    assert st1 == 0
    assert abs(sv.last_iters - s1.last_iters) <= 1, \
        (sv.last_iters, s1.last_iters)


def test_capi_routes_dilu_to_distributed(mesh):
    """The capi path must keep MULTICOLOR_DILU on the distributed solver
    (the old fallback to the single-chip solver is gone)."""
    from amgx_tpu import capi
    a = amgx.gallery.poisson5pt(24, 24)
    sp = a.to_scipy().tocsr()
    _, cfg = capi.AMGX_config_create(
        "config_version=2, solver=PCG, preconditioner=MULTICOLOR_DILU, "
        "max_iters=200, tolerance=1e-10, convergence=RELATIVE_INI, "
        "monitor_residual=1")
    _, rsrc = capi.AMGX_resources_create_simple(cfg)
    _, mh = capi.AMGX_matrix_create(rsrc, "dDDI")
    _, bh = capi.AMGX_vector_create(rsrc, "dDDI")
    _, xh = capi.AMGX_vector_create(rsrc, "dDDI")
    _, dist = capi.AMGX_distribution_create()
    dist.partition_offsets = RowPartition.equal(a.n_rows, N_DEV).offsets
    capi.AMGX_matrix_upload_distributed(
        mh, a.n_rows, a.n_rows, a.nnz, 1, 1, a.indptr, a.indices, a.data,
        dist=dist)
    b = np.ones(a.n_rows)
    capi.AMGX_vector_upload(bh, a.n_rows, 1, b)
    capi.AMGX_vector_set_zero(xh, a.n_rows, 1)
    _, sh = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(sh, mh)
    assert sh.dist_solver is not None, \
        "MULTICOLOR_DILU fell back to the single-chip solver"
    capi.AMGX_solver_solve_with_0_initial_guess(sh, bh, xh)
    _, xs = capi.AMGX_vector_download(xh)
    r = np.linalg.norm(b - sp @ xs) / np.linalg.norm(b)
    assert sh.status == 0 and r < 1e-8, (sh.status, r)


def test_bsr_dilu_distributed(mesh):
    """Round 5: BSR systems run distributed MULTICOLOR_DILU natively —
    blocked E factorization per shard (block triple-product corrections,
    ghost invE blocks on the boundary exchange) and block color sweeps
    (reference: multicolor_dilu_solver.cu is natively blocked)."""
    rng = np.random.default_rng(0)
    base = amgx.gallery.poisson5pt(14, 14)
    sb = base.to_scipy().tocsr()
    coup = rng.standard_normal((4, 4)) * 0.15 + np.eye(4)
    data4 = np.einsum("k,ij->kij", sb.data, coup)
    a4 = CSRMatrix(base.n_rows, base.n_cols, sb.indptr, sb.indices,
                   data4, block_dim=(4, 4))
    b = np.ones(a4.n_rows * 4)
    import scipy.sparse as sp
    A = sp.bsr_matrix((a4.data, a4.indices, a4.indptr),
                      shape=(a4.n_rows * 4, a4.n_cols * 4)).tocsr()
    for cfg in (
        amgx.AMGConfig({"config_version": 2, "solver": {
            "solver": "PCG", "max_iters": 200, "tolerance": 1e-8,
            "convergence": "RELATIVE_INI", "monitor_residual": 1,
            "scope": "main",
            "preconditioner": {"solver": "AMG", "scope": "amg",
                               "algorithm": "AGGREGATION",
                               "selector": "SIZE_2",
                               "smoother": "MULTICOLOR_DILU",
                               "relaxation_factor": 1.0,
                               "presweeps": 1, "postsweeps": 1,
                               "max_iters": 1, "min_coarse_rows": 16,
                               "max_levels": 8, "cycle": "V"}}}),
        amgx.AMGConfig(
            "solver=PCG, preconditioner=MULTICOLOR_DILU, max_iters=300, "
            "tolerance=1e-8, convergence=RELATIVE_INI, "
            "monitor_residual=1"),
    ):
        sv = DistributedSolver(cfg, mesh)
        sv.setup(a4)
        x, st = sv.solve(b)
        rel = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-7, (st, rel)
        # single-chip comparison: same config class converges comparably
        s1 = amgx.SolverFactory.allocate(cfg)
        s1.setup(amgx.Matrix(a4))
        _, st1 = s1.solve(b)
        assert st1 == 0
        assert sv.last_iters <= s1.last_iters + 10
