"""Distributed G5 (lane-binned gather) SpMV path.

The reference has ONE SpMV covering all sparsity, distributed included
(base/src/multiply.cu:113-197, amgx_cusparse.cu:84-160); here the
distributed analog is the stacked per-shard G5 pack: shard-local owned
blocks that are neither stencil-DIA nor banded convert to the lane-binned
gather format (ops/gather_spmv.py) with halo entries packed as columns
past the owned range, so the shard SpMV is exchange -> concat -> kernel.
These tests pin (a) exact numerics vs scipy on a randomly permuted Poisson
(the layout ladder cannot RCM it back), (b) that the compiled solve
program actually consumes the G5 arrays, (c) solver convergence parity.
"""

import numpy as np
import pytest

import jax

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.distributed import DistEllMatrix, DistributedSolver
from amgx_tpu.distributed.solve import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_mesh(N_DEV)


@pytest.fixture(scope="module")
def permuted(mesh):
    a = amgx.gallery.poisson7pt(12, 12, 12)
    rng = np.random.default_rng(0)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    return CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices, s.data), s


@pytest.fixture(autouse=True)
def small_threshold(monkeypatch):
    monkeypatch.setattr(DistEllMatrix, "GATHER_MIN_SHARD_NNZ", 100)


def test_gather_layout_engages_and_matches_scipy(mesh, permuted):
    csr, s = permuted
    dm = DistEllMatrix.from_global(csr, N_DEV, mesh=mesh,
                                   sort_interior_first=False)
    assert dm.gather_arrays is not None, \
        "permuted Poisson must take the G5 path"
    assert dm.dia_bands is None and dm.band_strips is None
    rng = np.random.default_rng(1)
    x = rng.standard_normal(csr.n_rows)
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=1, "
        "tolerance=0, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(cfg, mesh)
    sv.setup(csr)
    a0 = sv.levels[0].a
    assert a0.gather_arrays is not None
    xd = a0.scatter_vector(x, "cols", mesh)
    from jax.sharding import PartitionSpec as P

    # direct program-level check via the solver's own dispatcher
    static = (a0.dia_offsets, getattr(a0, "margins", None),
              getattr(a0, "band_meta", None), a0.nbr_perms,
              tuple(sorted(a0.gather_meta.items())))
    mat = sv._mat_pytree(a0)

    def f(mat, v):
        m = jax.tree.map(lambda u: u[0] if u.ndim >= 1 and u.shape[0] == 1
                         else u, mat)
        return sv._apply_mat(m, v[0], static)[None]

    g = jax.shard_map(f, mesh=mesh,
                      in_specs=(jax.tree.map(lambda _: P("x"), mat),
                                P("x")),
                      out_specs=P("x"))
    y = dm.gather_vector(np.asarray(jax.jit(g)(mat, xd)), "rows")
    ref = s @ x
    assert np.allclose(y, ref, rtol=1e-10, atol=1e-12)


def test_compiled_program_consumes_g5_arrays(mesh, permuted):
    """Perf gate: the level-0 operand pytree of the compiled solve is the
    G5 pack (step schedule + bmeta present), not the ELL cols/vals."""
    csr, _ = permuted
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=3, "
        "tolerance=1e-30, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(cfg, mesh)
    sv.setup(csr)
    assert "g5" in sv._mat_args, "solve operands must carry the G5 pack"
    for k in ("vals", "hl", "bmeta", "step_flags"):
        assert k in sv._mat_args["g5"]
    assert "cols" not in sv._mat_args, \
        "ELL fallback arrays still ride the solve program"


def test_pcg_and_amg_convergence_on_g5(mesh, permuted):
    csr, s = permuted
    b = np.ones(csr.n_rows)
    cfg = amgx.AMGConfig(
        "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
        "tolerance=1e-9, convergence=RELATIVE_INI, monitor_residual=1")
    sv = DistributedSolver(cfg, mesh)
    sv.setup(csr)
    assert sv.levels[0].a.gather_arrays is not None
    x, st = sv.solve(b)
    r = np.linalg.norm(b - s @ np.asarray(x)) / np.linalg.norm(b)
    assert st == 0 and r < 1e-7, (st, r)

    cfg2 = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-9,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "CLASSICAL", "selector": "PMIS",
                           "interpolator": "D1",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7, "presweeps": 1,
                           "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 32, "max_levels": 12,
                           "cycle": "V"}}})
    sv2 = DistributedSolver(cfg2, mesh)
    sv2.setup(csr)
    assert sv2.levels[0].a.gather_arrays is not None
    x2, st2 = sv2.solve(b)
    r2 = np.linalg.norm(b - s @ np.asarray(x2)) / np.linalg.norm(b)
    assert st2 == 0 and r2 < 1e-7, (st2, r2)
