"""Eigensolver tests (mirrors core/tests/eigensolver_test.cu and the
eigen_examples drivers)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix

A = amgx.gallery.poisson5pt(10, 10)
DENSE = A.to_dense()
EVALS = np.linalg.eigvalsh(DENSE)


def _cfg(method, **kw):
    base = {"eig_solver": method, "eig_max_iters": 300,
            "eig_tolerance": 1e-8, "eig_which": "largest"}
    base.update(kw)
    return amgx.AMGConfig(", ".join(f"{k}={v}" for k, v in base.items()))


def _largest(method, **kw):
    cfg = _cfg(method, **kw)
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(A))
    evals, evecs = es.solve()
    return evals, evecs, es


@pytest.mark.parametrize("method", ["SINGLE_ITERATION", "LANCZOS",
                                    "ARNOLDI", "SUBSPACE_ITERATION",
                                    "LOBPCG", "JACOBI_DAVIDSON"])
def test_largest_eigenvalue(method):
    evals, evecs, es = _largest(method)
    assert abs(evals[0] - EVALS[-1]) / EVALS[-1] < 1e-3
    # residual check: ||A v - lambda v|| small
    v = evecs[0]
    r = DENSE @ v - evals[0] * v
    assert np.linalg.norm(r) / abs(evals[0]) < 1e-2


def test_power_iteration_progress():
    # adjacent Poisson eigenvalues are nearly degenerate, so plain power
    # iteration may use every allowed step; it must still land on lambda_max
    evals, evecs, es = _largest("SINGLE_ITERATION")
    assert es.last_iters <= 300
    assert abs(evals[0] - EVALS[-1]) / EVALS[-1] < 1e-3


def test_shifted_mode():
    cfg = _cfg("LANCZOS", eig_which="shift", eig_shift=2.0)
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(A))
    evals, _ = es.solve()
    # largest eigenvalue of A - 2I, then shifted back
    assert abs(evals[0] - EVALS[-1]) / EVALS[-1] < 1e-3


def test_pagerank_power_iteration():
    # small web graph: 0->1, 0->2, 1->2, 2->0, 3->2 (3 is dangling-ish)
    rows = [0, 0, 1, 2, 3]
    cols = [1, 2, 2, 0, 2]
    adj = CSRMatrix.from_coo(4, 4, rows, cols, np.ones(5))
    cfg = _cfg("SINGLE_ITERATION", eig_which="pagerank",
               eig_damping_factor=0.85, eig_max_iters=200)
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.pagerank_setup(amgx.Matrix(adj))
    evals, evecs = es.solve()
    pr = np.abs(evecs[0])
    pr = pr / pr.sum()
    # node 2 collects the most mass, then 0
    assert pr[2] == pr.max()
    assert pr[0] > pr[1]
    # compare against the dense Google matrix eigenvector
    P = np.zeros((4, 4))
    outdeg = np.array([2.0, 1.0, 1.0, 1.0])
    for r, c in zip(rows, cols):
        P[c, r] = 1.0 / outdeg[r]
    G = 0.85 * P + 0.15 / 4
    w, v = np.linalg.eig(G)
    ref = np.abs(np.real(v[:, np.argmax(np.real(w))]))
    ref = ref / ref.sum()
    assert np.allclose(pr, ref, atol=5e-2)


def test_subspace_iteration_multiple():
    cfg = _cfg("SUBSPACE_ITERATION", eig_wanted_count=3,
               eig_max_iters=500)
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(A))
    evals, evecs = es.solve()
    assert len(evals) == 3
    ref = EVALS[-3:][::-1]
    for got, want in zip(sorted(evals, reverse=True)[:1], ref[:1]):
        assert abs(got - want) / want < 1e-2


def test_amg_eigensolver_facade():
    cfg = _cfg("LANCZOS")
    es = amgx.AMGEigenSolver(cfg)
    es.setup(amgx.Matrix(A))
    evals, _ = es.solve()
    assert abs(evals[0] - EVALS[-1]) / EVALS[-1] < 1e-3
