"""Distributed tests on the 8-device virtual CPU mesh (improves on the
reference, whose multi-GPU coverage is example-only — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import amgx_tpu as amgx
from amgx_tpu.distributed import DistEllMatrix, DistributedSolver, \
    RowPartition
from amgx_tpu.distributed import comms
from amgx_tpu.distributed.solve import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


def _dist_spmv(mesh, dm, x):
    def spmv(cols, vals, pack, halo, xv):
        return comms.dist_spmv(cols[0], vals[0], pack[0], halo[0],
                               xv[0], "x")[None]
    f = jax.jit(jax.shard_map(spmv, mesh=mesh, in_specs=(P("x"),) * 5,
                              out_specs=P("x")))
    # the input vector lives in the operator's COLUMN space
    xd = dm.scatter_vector(x, "cols", mesh)
    y = f(dm.cols, dm.vals, dm.pack_idx, dm.halo_from, xd)
    return dm.gather_vector(y, "rows")


def test_dist_spmv_square(mesh, rng):
    a = amgx.gallery.poisson7pt(10, 10, 10)
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh)
    x = rng.standard_normal(a.n_rows)
    y = _dist_spmv(mesh, dm, x)
    assert np.allclose(y, a.to_scipy() @ x)


def test_dist_spmv_no_reorder(mesh, rng):
    a = amgx.gallery.poisson5pt(17, 13)     # awkward sizes
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh,
                                   sort_interior_first=False)
    x = rng.standard_normal(a.n_rows)
    y = _dist_spmv(mesh, dm, x)
    assert np.allclose(y, a.to_scipy() @ x)


def test_dist_rectangular_transfer(mesh, rng):
    """P/R operators are rectangular with independent row/col partitions."""
    from amgx_tpu.amg.aggregation import select_aggregates, build_p_r
    a = amgx.gallery.poisson5pt(12, 12)
    cfg = amgx.AMGConfig()
    agg, nc = select_aggregates(a, "SIZE_2", cfg, "default")
    p_csr, r_csr = build_p_r(agg, nc)
    fine = RowPartition.equal(a.n_rows, N_DEV)
    coarse = RowPartition.equal(nc, N_DEV)
    dr = DistEllMatrix.from_global(r_csr, N_DEV, coarse, fine, mesh=mesh,
                                   sort_interior_first=False)
    x = rng.standard_normal(a.n_rows)
    y = _dist_spmv(mesh, dr, x)
    assert np.allclose(y, r_csr.to_scipy() @ x)


def test_partition_vector_path():
    pv = np.array([1, 0, 0, 1, 2, 2, 1, 0])
    part, order = RowPartition.from_partition_vector(pv, 3)
    assert part.offsets.tolist() == [0, 3, 6, 8]
    assert np.array_equal(np.sort(order[:3]), [1, 2, 7])


def test_interior_first_renumbering(mesh):
    # 24x6x6 -> 108 rows/shard = three 6x6 x-slabs; the middle slab of
    # every shard is interior (no remote x+-1 neighbour)
    a = amgx.gallery.poisson7pt(24, 6, 6)
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh)
    interior = np.asarray(dm.interior_rows)
    assert (interior > 0).all()
    # and a single-plane partition correctly reports zero interior rows
    a1 = amgx.gallery.poisson7pt(8, 8, 8)
    dm1 = DistEllMatrix.from_global(a1, N_DEV, mesh=mesh)
    assert (np.asarray(dm1.interior_rows) == 0).all()


def test_dist_dot(mesh, rng):
    x = rng.standard_normal(N_DEV * 16)
    y = rng.standard_normal(N_DEV * 16)
    xd = jnp.asarray(x.reshape(N_DEV, 16))
    yd = jnp.asarray(y.reshape(N_DEV, 16))

    def dot(a, b):
        return comms.dist_dot(a[0], b[0], "x")
    f = jax.jit(jax.shard_map(dot, mesh=mesh,
                              in_specs=(P("x"), P("x")), out_specs=P()))
    assert np.isclose(float(f(xd, yd)), x @ y)


def test_distributed_pcg(mesh, rng):
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig("solver=PCG, preconditioner=BLOCK_JACOBI, "
                         "max_iters=300, tolerance=1e-8, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    assert status == 0
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert rel < 1e-6


def test_distributed_jacobi_l1(mesh, rng):
    """JACOBI_L1 preconditioning on the mesh matches the single-chip
    solver's iteration count exactly (jacobi_l1_solver.cu)."""
    a = amgx.gallery.poisson5pt(24, 24)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 300, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "JACOBI_L1", "scope": "jac",
                           "max_iters": 1}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    assert st == 0 and rel < 1e-8
    s1 = amgx.SolverFactory.allocate(cfg)
    s1.setup(amgx.Matrix(a))
    s1.solve(b)
    assert abs(s.last_iters - s1.last_iters) <= 2


def test_distributed_unsupported_preconditioner_raises(mesh):
    """Color-sequential preconditioners must raise (the capi route then
    falls back to the single-chip solver) instead of silently swapping
    the preconditioner for identity."""
    a = amgx.gallery.poisson5pt(16, 16)
    # MULTICOLOR_GS/ILU/DILU, FIXCOLOR_GS, KACZMARZ and plain GS are all
    # distributed now (test_dist_smoothers.py); POLYNOMIAL remains
    # single-chip-only
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=POLYNOMIAL, max_iters=50, "
        "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    with pytest.raises(NotImplementedError):
        s.setup(a)


def test_distributed_pcg_amg(mesh, rng):
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 12,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6
    # AMG must beat unpreconditioned iteration counts decisively
    assert s.last_iters <= 30
    assert len(s.levels) >= 3


def test_distributed_matches_single_chip(mesh, rng):
    """Same solver single-chip vs 8-way partitioned: same iterate path
    within fp tolerance (SPMD determinism)."""
    a = amgx.gallery.poisson5pt(16, 16)
    b = rng.standard_normal(a.n_rows)
    cfg_s = "solver=CG, max_iters=40, tolerance=1e-10, " \
        "convergence=RELATIVE_INI, monitor_residual=1"
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cfg_s))
    s1.setup(amgx.Matrix(a))
    x1, _ = s1.solve(b)
    cfg = amgx.AMGConfig("solver=PCG, max_iters=40, tolerance=1e-10, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    s8 = DistributedSolver(cfg, mesh)
    s8.setup(a)
    x8, _ = s8.solve(b)
    assert np.allclose(s1.extract_vector(x1), x8, atol=1e-6)


def test_distributed_power_iteration(mesh):
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(16, 16)
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    es = DistributedEigenSolver("SINGLE_ITERATION", mesh, max_iters=500,
                                tolerance=1e-7)
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref) / ref < 1e-3


def test_distributed_lanczos(mesh):
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(16, 16)
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    es = DistributedEigenSolver("LANCZOS", mesh, krylov_dim=30)
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref) / ref < 1e-6
    # near-degenerate top eigenvalues limit Ritz-vector accuracy
    v = evecs[0]
    r = a.to_scipy() @ v - evals[0] * v
    assert np.linalg.norm(r) / abs(evals[0]) < 1e-2


def test_distributed_pagerank(mesh):
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    from amgx_tpu.matrix import CSRMatrix
    rows = [0, 0, 1, 2, 3, 3]
    cols = [1, 2, 2, 0, 2, 0]
    adj = CSRMatrix.from_coo(4, 4, rows, cols, np.ones(6))
    es = DistributedEigenSolver("SINGLE_ITERATION", mesh, max_iters=300,
                                tolerance=1e-10, which="pagerank")
    es.pagerank_setup(adj)
    evals, evecs = es.solve()
    pr = np.abs(evecs[0][:4])
    pr = pr / pr.sum()
    assert pr[2] == pr.max()


def test_distributed_subspace_iteration(mesh):
    """Distributed block power iteration matches dense eigenvalues
    (reference: subspace_iteration_eigensolver.cu at MPI scale)."""
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(16, 16)
    ref = np.sort(np.linalg.eigvalsh(a.to_dense()))[::-1]
    es = DistributedEigenSolver("SUBSPACE_ITERATION", mesh, max_iters=400,
                                tolerance=1e-9, wanted=2)
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref[0]) / ref[0] < 1e-5
    v = evecs[0]
    r = a.to_scipy() @ v - evals[0] * v
    assert np.linalg.norm(r) / (abs(evals[0]) * np.linalg.norm(v)) < 1e-3


def test_distributed_lobpcg(mesh):
    """Distributed LOBPCG finds the smallest eigenpair with Jacobi
    preconditioning (reference: lobpcg_eigensolver.cu at MPI scale)."""
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(12, 12)
    ref = np.linalg.eigvalsh(a.to_dense())
    es = DistributedEigenSolver("LOBPCG", mesh, max_iters=600,
                                tolerance=1e-8, which="smallest",
                                precond="JACOBI")
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref[0]) / abs(ref[0]) < 1e-4
    v = evecs[0]
    r = a.to_scipy() @ v - evals[0] * v
    assert np.linalg.norm(r) / np.linalg.norm(v) < 1e-4 * abs(ref[-1])


def test_distributed_lobpcg_matches_single_chip(mesh):
    """Distributed and single-chip LOBPCG agree on the largest eigenvalue."""
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(12, 12)
    es = DistributedEigenSolver("LOBPCG", mesh, max_iters=500,
                                tolerance=1e-9, which="largest")
    es.setup(a)
    evals, _ = es.solve()
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    assert abs(evals[0] - ref) / ref < 1e-6


def test_dist_spmv_overlap_split(mesh, rng):
    """The interior/boundary-split SpMV (comm/compute overlap path) matches
    the unsplit product (reference: multiply.cu:113-197)."""
    a = amgx.gallery.poisson7pt(24, 6, 6)
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh)
    split = int(np.asarray(dm.interior_rows).min())
    assert split > 0
    x = rng.standard_normal(a.n_rows)

    def spmv(cols, vals, pack, halo, xv):
        return comms.dist_spmv(cols[0], vals[0], pack[0], halo[0],
                               xv[0], "x", interior_split=split)[None]
    f = jax.jit(jax.shard_map(spmv, mesh=mesh, in_specs=(P("x"),) * 5,
                              out_specs=P("x")))
    xd = dm.scatter_vector(x, "cols", mesh)
    y = dm.gather_vector(f(dm.cols, dm.vals, dm.pack_idx, dm.halo_from,
                           xd), "rows")
    assert np.allclose(y, a.to_scipy() @ x)


def test_distributed_block_bicgstab(mesh, rng):
    """BASELINE config 4: coupled 4x4-block BSR BiCGStab, mesh-partitioned,
    mixed precision."""
    from amgx_tpu.matrix import CSRMatrix
    base = amgx.gallery.poisson5pt(10, 10)
    rows = np.repeat(np.arange(base.n_rows), base.row_nnz())
    coupling = rng.standard_normal((4, 4)) * 0.2
    coupling = coupling @ coupling.T + np.eye(4)
    data = np.einsum("k,ij->kij", base.data, coupling)
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(4, 4))
    b = rng.standard_normal(a.n_rows * 4)
    cfg = amgx.AMGConfig("solver=PBICGSTAB, preconditioner=BLOCK_JACOBI, "
                         "max_iters=300, tolerance=1e-8, mode=dDFI, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0
    assert rel < 1e-5


def test_distributed_block_spmv(mesh, rng):
    from amgx_tpu.matrix import CSRMatrix
    base = amgx.gallery.poisson5pt(8, 8)
    rows = np.repeat(np.arange(base.n_rows), base.row_nnz())
    data = rng.standard_normal((base.nnz, 2, 2))
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(2, 2))
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh,
                                   sort_interior_first=False)
    x = rng.standard_normal(a.n_rows * 2)

    def spmv(cols, vals, pack, halo, xv):
        return comms.dist_spmv_block(cols[0], vals[0], pack[0], halo[0],
                                     xv[0], 2, "x")[None]
    f = jax.jit(jax.shard_map(spmv, mesh=mesh, in_specs=(P("x"),) * 5,
                              out_specs=P("x")))
    xd = dm.scatter_vector(x, "cols", mesh)
    y = dm.gather_vector(f(dm.cols, dm.vals, dm.pack_idx, dm.halo_from,
                           xd), "rows")
    assert np.allclose(y, a.to_scipy() @ x)


def test_structured_dia_path_active_and_correct(mesh, rng):
    """Stencil partitions get the no-gather shard-local DIA layout; the
    margin-limited halo gather matches the plain path exactly."""
    a = amgx.gallery.poisson7pt(12, 8, 8)
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh,
                                   sort_interior_first=False)
    assert dm.dia_bands is not None        # structured layout detected
    assert len(dm.dia_offsets) <= 7
    cfg = amgx.AMGConfig("solver=PCG, max_iters=200, tolerance=1e-9, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    assert getattr(s.levels[0].a, "dia_bands", None) is not None
    b = rng.standard_normal(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-7


def test_distributed_classical_amg(mesh, rng):
    a = amgx.gallery.poisson5pt(24, 24)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "CLASSICAL", "selector": "PMIS",
                           "strength": "AHAT", "strength_threshold": 0.25,
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 24, "max_levels": 10,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6
    assert len(s.levels) >= 2


def test_distributed_w_cycle(mesh, rng):
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_4",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "cycle": "W"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6


def test_coarse_level_consolidation(mesh, rng):
    """Mid-hierarchy consolidation (reference: glue.h, amg.cu:328-391):
    coarse levels below the threshold reshard onto a prefix sub-mesh;
    trailing shards own zero rows. Convergence must match the
    unconsolidated run."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = rng.standard_normal(a.n_rows)

    def make_cfg(lower):
        return amgx.AMGConfig({"config_version": 2, "solver": {
            "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
            "convergence": "RELATIVE_INI", "monitor_residual": 1,
            "scope": "main",
            "preconditioner": {
                "solver": "AMG", "scope": "amg",
                "algorithm": "AGGREGATION", "selector": "SIZE_2",
                "smoother": "BLOCK_JACOBI", "relaxation_factor": 0.7,
                "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                "min_coarse_rows": 16, "max_levels": 12, "cycle": "V",
                "matrix_consolidation_lower_threshold": lower,
                "matrix_consolidation_upper_threshold": 64}}})

    s = DistributedSolver(make_cfg(48), mesh)
    s.setup(a)
    # some level must actually have consolidated onto a sub-mesh
    actives = [int(np.sum(np.diff(l.a.row_part.offsets) > 0))
               for l in s.levels]
    assert actives[0] == N_DEV and min(actives) < N_DEV
    # active sets only shrink with depth
    assert all(a1 <= a0 for a0, a1 in zip(actives, actives[1:]))
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6

    s0 = DistributedSolver(make_cfg(0), mesh)
    s0.setup(a)
    x0, status0 = s0.solve(b)
    assert status0 == 0
    # consolidation changes the data layout, not the algorithm: the
    # iterate path agrees to fp tolerance while hierarchies match
    if len(s0.levels) == len(s.levels):
        assert abs(s.last_iters - s0.last_iters) <= 2


def test_shard_local_aggregation(mesh, rng):
    """distributed_aggregation=SHARD_LOCAL (the default, mirroring the
    reference's per-rank setAggregates): aggregates never span shards, so
    coarse rows stay on their fine shard and P/R are block-diagonal."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 12,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    # transfer operators carry no real halo entries: every P/R nonzero
    # references an owned column of the same shard
    import numpy as _np
    for lvl in s.levels[:-1]:
        for t in (lvl.p, lvl.r):
            cols = _np.asarray(t.cols)
            vals = _np.asarray(t.vals)
            assert not ((vals != 0) & (cols >= t.lc)).any()
    b = rng.standard_normal(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6 and s.last_iters <= 30


def test_distributed_fgmres_amg(mesh, rng):
    """The flagship FGMRES+aggregation-AMG composition, distributed
    (reference: FGMRES_AGGREGATION.json over MPI ranks)."""
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "FGMRES", "max_iters": 60, "gmres_n_restart": 10,
        "tolerance": 1e-8, "convergence": "RELATIVE_INI",
        "monitor_residual": 1, "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 10,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6
    assert s.last_iters <= 30        # AMG-preconditioned Krylov
    # plain distributed GMRES (no preconditioner) also converges
    cfg2 = amgx.AMGConfig("solver=GMRES, max_iters=300, gmres_n_restart=30, "
                          "tolerance=1e-8, convergence=RELATIVE_INI, "
                          "monitor_residual=1")
    s2 = DistributedSolver(cfg2, mesh)
    s2.setup(a)
    x2, st2 = s2.solve(b)
    rel2 = np.linalg.norm(b - a.to_scipy() @ x2) / np.linalg.norm(b)
    assert st2 == 0 and rel2 < 1e-6


def test_distributed_standalone_amg(mesh, rng):
    """solver=AMG used directly (not as a preconditioner): iterated
    V-cycles, reference AlgebraicMultigrid_Solver semantics."""
    a = amgx.gallery.poisson5pt(24, 24)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": 60, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main", "algorithm": "AGGREGATION", "selector": "SIZE_2",
        "smoother": "BLOCK_JACOBI", "relaxation_factor": 0.7,
        "presweeps": 2, "postsweeps": 2, "min_coarse_rows": 16,
        "max_levels": 10, "cycle": "V"}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    assert len(s.levels) >= 2
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6


def _random_band_spd(n, bw, rng):
    import scipy.sparse as sp
    from amgx_tpu.matrix import CSRMatrix
    rows, cols, vals = [], [], []
    for off in range(1, bw + 1):
        mask = rng.random(n - off) < 0.3
        idx = np.nonzero(mask)[0]
        v = rng.standard_normal(idx.size) * 0.1
        rows += [idx, idx + off]
        cols += [idx + off, idx]
        vals += [v, v]
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    A = (A + sp.diags(np.abs(A).sum(axis=1).A1 + 1.0)).tocsr()
    return CSRMatrix(n, n, A.indptr, A.indices, A.data), A


def test_distributed_band_strips(mesh, rng):
    """Banded-but-not-stencil shard-local parts (too many distinct offsets
    for DIA) use the tile-aligned band-strip MXU layout; the solve is
    exact and the layout is active."""
    a, A = _random_band_spd(4096, 40, rng)
    dm = DistEllMatrix.from_global(a, N_DEV, mesh=mesh,
                                   sort_interior_first=False)
    assert dm.dia_bands is None and dm.band_strips is not None
    cfg = amgx.AMGConfig("solver=PCG, preconditioner=BLOCK_JACOBI, "
                         "max_iters=300, tolerance=1e-8, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    assert s.levels[0].a.band_strips is not None
    b = rng.standard_normal(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6


def test_distributed_resetup(mesh, rng):
    """AMGX_solver_resetup analog for the distributed solver: coefficients
    change, structure (partitions/aggregates/P/R) is reused."""
    from amgx_tpu.matrix import CSRMatrix
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 10,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    structure = [tuple(np.asarray(l.a.row_part.offsets)) for l in s.levels]
    a2 = CSRMatrix(a.n_rows, a.n_cols, a.indptr, a.indices, a.data * 1.5)
    s.resetup(a2)
    assert [tuple(np.asarray(l.a.row_part.offsets))
            for l in s.levels] == structure      # hierarchy reused
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a2.to_scipy() @ x) / np.linalg.norm(b)
    assert status == 0 and rel < 1e-6


def test_gmres_matches_single_chip(mesh, rng):
    """Distributed GMRES reproduces the single-chip iterate path to fp
    round-off (identical Arnoldi/Givens numerics, psum projections)."""
    a = amgx.gallery.poisson5pt(16, 16)
    b = rng.standard_normal(a.n_rows)
    cs = ("solver=GMRES, max_iters=60, gmres_n_restart=12, "
          "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cs))
    s1.setup(amgx.Matrix(a))
    x1, _ = s1.solve(b)
    s8 = DistributedSolver(amgx.AMGConfig(cs), mesh)
    s8.setup(a)
    x8, _ = s8.solve(b)
    assert np.abs(s1.extract_vector(x1) - x8).max() < 1e-8


def test_distributed_block_amg(mesh, rng):
    """Block (BSR) distributed AMG: aggregation coarsens the block graph,
    transfers move block vectors per component (identity-scaled blocks),
    smoothing applies batched block-diagonal inverses (reference:
    aggregation AMG handles arbitrary block sizes,
    aggregation_amg_level.cu)."""
    from amgx_tpu.matrix import CSRMatrix
    base = amgx.gallery.poisson5pt(16, 16)
    coupling = rng.standard_normal((3, 3)) * 0.3
    coupling = coupling @ coupling.T + np.eye(3)
    data = np.einsum("k,ij->kij", base.data, coupling)
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(3, 3))
    b = rng.standard_normal(a.n_rows * 3)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.8, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 24, "max_levels": 6,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    assert len(s.levels) >= 2           # actually coarsened
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6
    # converges in a similar iteration count to the single-chip AMG
    s1 = amgx.SolverFactory.allocate(cfg)
    s1.setup(amgx.Matrix(a))
    s1.solve(b)
    assert s.last_iters <= 2 * max(1, s1.last_iters)
    # resetup with fresh coefficients reuses the hierarchy
    a2 = CSRMatrix(a.n_rows, a.n_cols, a.indptr, a.indices, a.data * 1.7,
                   block_dim=(3, 3))
    s.resetup(a2)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a2.to_scipy() @ x) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6


def test_distributed_scaling_block_complex(mesh, rng):
    """Distributed scalers beyond real scalar systems: BSR block rows
    scale uniformly; complex systems scale by abs-based real vectors."""
    from amgx_tpu.matrix import CSRMatrix
    base = amgx.gallery.poisson5pt(10, 10)
    coupling = rng.standard_normal((2, 2)) * 0.2
    coupling = coupling @ coupling.T + np.eye(2)
    scale = np.logspace(0, 3, base.n_rows)
    rows = np.repeat(np.arange(base.n_rows), base.row_nnz())
    data = np.einsum("k,ij->kij", base.data * scale[rows], coupling)
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(2, 2))
    A = a.to_scipy().copy()
    b = np.ones(a.n_rows * 2)
    cfg = amgx.AMGConfig(
        "solver=BICGSTAB, scaling=BINORMALIZATION, max_iters=600, "
        "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-5
    # complex: unbalanced rows with complex phases
    c = amgx.gallery.poisson5pt(10, 10)
    crows = np.repeat(np.logspace(0, 3, c.n_rows), c.row_nnz())
    cdata = c.data * crows * np.exp(0.3j * rng.standard_normal(c.nnz))
    ac = CSRMatrix(c.n_rows, c.n_cols, c.indptr, c.indices, cdata)
    Ac = ac.to_scipy().copy()
    bc = np.ones(ac.n_rows, np.complex128)
    cfg = amgx.AMGConfig(
        "solver=GMRES, scaling=DIAGONAL_SYMMETRIC, max_iters=300, "
        "gmres_n_restart=50, mode=dZZI, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1")
    s = DistributedSolver(cfg, mesh)
    s.setup(ac)
    x, st = s.solve(bc)
    rel = np.linalg.norm(bc - Ac @ x) / np.linalg.norm(bc)
    assert st == 0 and rel < 1e-5
    assert np.array_equal(ac.data, Ac.data)        # user matrix untouched


def test_complex_gmres_matches_single_chip(mesh, rng):
    """Complex-mode (dZZI) distributed GMRES: the unitary Givens form
    conjugates (reference templates GMRES over complex modes,
    gmres_solver.cu) and reproduces the single-chip iterate path."""
    from amgx_tpu.matrix import CSRMatrix
    p = amgx.gallery.poisson5pt(16, 16)
    data = p.data.astype(np.complex128) + \
        0.2j * rng.standard_normal(p.data.shape[0])
    a = CSRMatrix(p.n_rows, p.n_cols, p.indptr, p.indices, data)
    b = rng.standard_normal(a.n_rows) + \
        1j * rng.standard_normal(a.n_rows)
    cs = ("solver=GMRES, max_iters=150, gmres_n_restart=40, mode=dZZI, "
          "preconditioner=BLOCK_JACOBI, tolerance=1e-10, "
          "convergence=RELATIVE_INI, monitor_residual=1")
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cs))
    s1.setup(amgx.Matrix(a))
    x1, st1 = s1.solve(b)
    s8 = DistributedSolver(amgx.AMGConfig(cs), mesh)
    s8.setup(a)
    x8, st8 = s8.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x8) / np.linalg.norm(b)
    assert st8 == 0 and rel < 1e-8
    assert np.abs(s1.extract_vector(x1) - x8).max() < 1e-7


def test_complex_distributed_amg(mesh, rng):
    """Complex-mode (dZZI) distributed AMG: aggregation coarsening on
    complex operators, complex inverse-diagonal smoothing, complex coarse
    LU (reference: AMG templates over complex modes)."""
    from amgx_tpu.matrix import CSRMatrix
    p = amgx.gallery.poisson5pt(16, 16)
    data = p.data.astype(np.complex128) * \
        np.exp(0.2j * rng.standard_normal(p.nnz))
    a = CSRMatrix(p.n_rows, p.n_cols, p.indptr, p.indices, data)
    b = np.ones(a.n_rows, np.complex128)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "FGMRES", "max_iters": 100, "gmres_n_restart": 30,
        "tolerance": 1e-9, "convergence": "RELATIVE_INI",
        "monitor_residual": 1, "mode": "dZZI", "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI", "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 6,
                           "cycle": "V"}}})
    s1 = amgx.SolverFactory.allocate(cfg)
    s1.setup(amgx.Matrix(a))
    x1, st1 = s1.solve(b)
    rel1 = np.linalg.norm(b - a.to_scipy() @ s1.extract_vector(x1)) / \
        np.linalg.norm(b)
    assert st1 == amgx.SolveStatus.SUCCESS and rel1 < 1e-7
    sd = DistributedSolver(cfg, mesh)
    sd.setup(a)
    assert len(sd.levels) >= 2
    x8, st8 = sd.solve(b)
    rel8 = np.linalg.norm(b - a.to_scipy() @ x8) / np.linalg.norm(b)
    assert st8 == 0 and rel8 < 1e-7
    assert sd.last_iters <= 2 * max(1, s1.last_iters)


def test_complex_distributed_krylov(mesh, rng):
    """Complex PCG / BiCGStab / FGMRES on the mesh (dZZI): conjugating
    psum projections, real residual norms in the fused while_loop."""
    import scipy.sparse as sp
    p = amgx.gallery.poisson5pt(14, 14)
    n = p.n_rows
    herm = sp.random(n, n, density=0.01, random_state=3)
    herm = herm + herm.T.conj()
    A = (p.to_scipy().astype(np.complex128) +
         0.2j * (sp.triu(herm, 1) - sp.triu(herm, 1).T)).tocsr()
    from amgx_tpu.matrix import CSRMatrix
    a = CSRMatrix(n, n, A.indptr, A.indices, A.data)   # Hermitian PD
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    for solver in ("PCG", "BICGSTAB", "FGMRES"):
        cfg = amgx.AMGConfig(
            f"solver={solver}, preconditioner=BLOCK_JACOBI, mode=dZZI, "
            "max_iters=300, tolerance=1e-9, convergence=RELATIVE_INI, "
            "monitor_residual=1")
        s = DistributedSolver(cfg, mesh)
        s.setup(a)
        x, st = s.solve(b)
        rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-7, (solver, rel)


def test_distributed_chebyshev_smoothing(mesh, rng):
    """Chebyshev smoothing in the distributed V-cycle (the TPU-recommended
    smoother: SpMV + axpy only) beats damped Jacobi on iteration count
    (reference: V-cheby configs, cheb_solver.cu)."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = rng.standard_normal(a.n_rows)

    def run(smoother):
        cfg = amgx.AMGConfig({"config_version": 2, "solver": {
            "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
            "convergence": "RELATIVE_INI", "monitor_residual": 1,
            "scope": "main",
            "preconditioner": {"solver": "AMG", "scope": "amg",
                               "algorithm": "AGGREGATION",
                               "selector": "SIZE_2", "smoother": smoother,
                               "relaxation_factor": 0.7, "presweeps": 2,
                               "postsweeps": 2, "max_iters": 1,
                               "chebyshev_polynomial_order": 4,
                               "min_coarse_rows": 32, "max_levels": 12,
                               "cycle": "V"}}})
        s = DistributedSolver(cfg, mesh)
        s.setup(a)
        x, st = s.solve(b)
        rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-6
        return s.last_iters

    assert run("CHEBYSHEV") <= run("BLOCK_JACOBI")


def test_distributed_scaling(mesh, rng):
    """Scalers in the distributed path (reference: Scaler hooks in
    Solver::setup/solve): the system is scaled before partitioning, the
    user's matrix is untouched, vectors map at the API boundary, and
    resetup rescales fresh coefficients. Convergence is tested on the
    scaled system (reference semantics), so the true-residual tolerance is
    looser than the solver tolerance."""
    import scipy.sparse as sp
    from amgx_tpu.matrix import CSRMatrix
    a0 = amgx.gallery.poisson5pt(24, 24)
    d = 10.0 ** rng.uniform(-3, 3, a0.n_rows)
    A = (sp.diags(d) @ a0.to_scipy() @ sp.diags(d)).tocsr()
    a = CSRMatrix(a0.n_rows, a0.n_cols, A.indptr, A.indices, A.data)
    b = rng.standard_normal(a.n_rows)
    for scaling in ("BINORMALIZATION", "DIAGONAL_SYMMETRIC"):
        cfg = amgx.AMGConfig(
            "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=500, "
            "tolerance=1e-10, convergence=RELATIVE_INI, "
            f"monitor_residual=1, scaling={scaling}")
        s = DistributedSolver(cfg, mesh)
        s.setup(a)
        x, st = s.solve(b)
        rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-4, (scaling, rel)
        assert np.array_equal(a.data, A.data)       # user matrix untouched
        a2 = CSRMatrix(a.n_rows, a.n_cols, a.indptr, a.indices,
                       a.data * 3.0)
        s.resetup(a2)
        x, st = s.solve(b)
        rel = np.linalg.norm(b - 3 * A @ x) / np.linalg.norm(b)
        assert rel < 1e-4, ("resetup", scaling, rel)


def test_distributed_pcgf_and_chebyshev(mesh, rng):
    """Distributed PCGF (flexible CG) converges with an AMG
    preconditioner; distributed CHEBYSHEV reproduces the single-chip
    solver's residual path (both share the mode-0 D^-1 A window, so
    standalone convergence is spectrum-limited by design)."""
    a = amgx.gallery.poisson5pt(24, 24)
    b = rng.standard_normal(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCGF", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION", "selector": "SIZE_2",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 10,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    assert st == 0 and rel < 1e-6 and s.last_iters <= 30

    cs = ("solver=CHEBYSHEV, max_iters=50, tolerance=1e-8, "
          "convergence=RELATIVE_INI, monitor_residual=1")
    s1 = amgx.SolverFactory.allocate(amgx.AMGConfig(cs))
    s1.setup(amgx.Matrix(a))
    s1.solve(b)
    s2 = DistributedSolver(amgx.AMGConfig(cs), mesh)
    s2.setup(a)
    s2.solve(b)
    h1 = np.array(s1.res_history)
    h2 = np.array(s2.res_history)
    k = min(len(h1), len(h2))
    assert np.abs(h1[:k] - h2[:k]).max() / h1[0] < 0.05


def test_distributed_idr(mesh, rng):
    """Distributed IDR(s) (idr_solver.cu): shadow projections psum-reduced,
    small M/f replicated; IDRMSYNC aliases the same fused program."""
    a = amgx.gallery.poisson5pt(20, 20)
    b = rng.standard_normal(a.n_rows)
    for name, s_dim in (("IDR", 4), ("IDRMSYNC", 8)):
        cfg = amgx.AMGConfig(
            f"solver={name}, subspace_dim_s={s_dim}, max_iters=200, "
            "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
        s = DistributedSolver(cfg, mesh)
        s.setup(a)
        x, st = s.solve(b)
        rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
        assert st == 0 and rel < 1e-6


@pytest.mark.parametrize("cycle", ["V", "W", "F"])
def test_cycle_parity_vs_single_chip(mesh, rng, cycle):
    """Distributed V/W/F cycles reproduce the single-chip cycle dispatchers
    (reference: core/src/cycles/{v,w,f}_cycle.cu). Global aggregation so
    both sides build the identical hierarchy; the iterate paths then must
    agree to fp tolerance. Guards the F = F-then-V semantics in
    distributed/solve.py against regressing to W."""
    a = amgx.gallery.poisson5pt(20, 20)
    b = rng.standard_normal(a.n_rows)
    body = {
        "solver": "AMG", "max_iters": 5, "tolerance": 1e-30,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main", "algorithm": "AGGREGATION", "selector": "SIZE_2",
        "smoother": {"solver": "BLOCK_JACOBI", "scope": "jac",
                     "relaxation_factor": 0.7},
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 16,
        "max_levels": 4, "cycle": cycle,
        "distributed_aggregation": "GLOBAL"}
    s1 = amgx.SolverFactory.allocate(
        amgx.AMGConfig({"config_version": 2, "solver": dict(body)}))
    s1.setup(amgx.Matrix(a))
    x1, _ = s1.solve(b)
    sd = DistributedSolver(
        amgx.AMGConfig({"config_version": 2, "solver": dict(body)}), mesh)
    sd.setup(a)
    xd, _ = sd.solve(b)
    assert np.allclose(s1.extract_vector(x1), xd, atol=1e-8), \
        f"{cycle}-cycle iterate diverged from single-chip"


def test_distributed_two_stage_gs_smoother(mesh, rng):
    """Hybrid two-stage GS smoothing on the mesh (shard-local triangular
    operators, inner Jacobi sweeps — no coloring, no extra collectives):
    must beat damped-Jacobi smoothing on iteration count and survive a
    values-only resetup."""
    from amgx_tpu.matrix import CSRMatrix
    a = amgx.gallery.poisson7pt(12, 12, 12)
    b = np.ones(a.n_rows)

    def cfgf(sm):
        return amgx.AMGConfig({"config_version": 2, "solver": {
            "solver": "PCG", "max_iters": 200, "tolerance": 1e-10,
            "convergence": "RELATIVE_INI", "monitor_residual": 1,
            "scope": "main",
            "preconditioner": {"solver": "AMG", "scope": "amg",
                               "algorithm": "CLASSICAL",
                               "selector": "PMIS", "interpolator": "D2",
                               "smoother": sm, "presweeps": 1,
                               "postsweeps": 1, "max_iters": 1,
                               "min_coarse_rows": 32, "max_levels": 12,
                               "cycle": "V"}}})

    gs = {"solver": "TWO_STAGE_GS", "scope": "gs", "symmetric_GS": 1,
          "gs_inner_sweeps": 2, "relaxation_factor": 1.0}
    jc = {"solver": "BLOCK_JACOBI", "scope": "jc",
          "relaxation_factor": 0.7}
    s_gs = DistributedSolver(cfgf(gs), mesh)
    s_gs.setup(a)
    x, st = s_gs.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    assert st == 0 and rel < 1e-8
    s_jc = DistributedSolver(cfgf(jc), mesh)
    s_jc.setup(a)
    s_jc.solve(b)
    assert s_gs.last_iters <= s_jc.last_iters
    a2 = CSRMatrix(a.n_rows, a.n_cols, a.indptr, a.indices, a.data * 2.0)
    s_gs.resetup(a2)
    x2, st2 = s_gs.solve(b)
    r2 = np.linalg.norm(b - a2.to_scipy() @ np.asarray(x2)) / \
        np.linalg.norm(b)
    assert st2 == 0 and r2 < 1e-8


def test_distributed_chebyshev_poly_preconditioner(mesh, rng):
    """CHEBYSHEV_POLY as a distributed PCG preconditioner (SpMV + axpy
    only): must beat plain Jacobi preconditioning."""
    a = amgx.gallery.poisson7pt(10, 10, 10)
    b = np.ones(a.n_rows)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 300, "tolerance": 1e-10,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "CHEBYSHEV_POLY", "scope": "cp",
                           "chebyshev_polynomial_order": 3}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, st = s.solve(b)
    r = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    assert st == 0 and r < 1e-8
    cfg2 = amgx.AMGConfig(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
        "tolerance=1e-10, convergence=RELATIVE_INI, monitor_residual=1")
    s2 = DistributedSolver(cfg2, mesh)
    s2.setup(a)
    s2.solve(b)
    assert s.last_iters < s2.last_iters


def test_distributed_arnoldi(mesh):
    """Round 5: ARNOLDI runs distributed (reference:
    eigen_examples/eigensolver_mpi.c exercises every method)."""
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(16, 16)
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    es = DistributedEigenSolver("ARNOLDI", mesh, krylov_dim=40)
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref) / ref < 1e-6
    v = evecs[0]
    r = a.to_scipy() @ v - evals[0] * v
    assert np.linalg.norm(r) / abs(evals[0]) < 1e-2


def test_distributed_jacobi_davidson(mesh):
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    a = amgx.gallery.poisson5pt(12, 12)
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    es = DistributedEigenSolver("JACOBI_DAVIDSON", mesh, max_iters=200,
                                tolerance=1e-6, krylov_dim=20)
    es.setup(a)
    evals, evecs = es.solve()
    assert abs(evals[0] - ref) / ref < 1e-4


def test_complex_distributed_two_stage_gs(mesh, rng):
    """Round 5: distributed TWO_STAGE_GS accepts complex modes — the
    shard-local triangular packs carry complex values (previously an
    honest NotImplementedError guard)."""
    from amgx_tpu.matrix import CSRMatrix
    p = amgx.gallery.poisson5pt(12, 12)
    data = p.data.astype(np.complex128) + \
        0.1j * rng.standard_normal(p.data.shape[0])
    a = CSRMatrix(p.n_rows, p.n_cols, p.indptr, p.indices, data)
    b = np.ones(a.n_rows, np.complex128)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "GMRES", "max_iters": 200, "gmres_n_restart": 40,
        "mode": "dZZI", "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_2",
                           "smoother": "TWO_STAGE_GS",
                           "relaxation_factor": 0.9, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 16, "max_levels": 8,
                           "cycle": "V"}}})
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    assert st == 0 and rel < 1e-6, (st, rel)
    # single-chip iterate parity
    s1 = amgx.SolverFactory.allocate(cfg)
    s1.setup(amgx.Matrix(a, mode="dZZI"))
    _, st1 = s1.solve(b)
    assert st1 == 0
    assert abs(s.last_iters - s1.last_iters) <= 2
