"""Determinism tests (mirrors core/tests/aggregates_determinism_test.cu,
low_deg_determinism.cu using the determinism-checker checksums)."""

import numpy as np

import amgx_tpu as amgx
from amgx_tpu.determinism import DeterminismChecker, checksum
from amgx_tpu.amg.aggregation import select_aggregates
from amgx_tpu.amg.classical import strong_connections, pmis_select


A = amgx.gallery.poisson5pt(20, 20)


def test_checksum_order_insensitive():
    a = np.array([3.0, 1.0, 2.0])
    b = np.array([2.0, 3.0, 1.0])
    assert checksum(a) == checksum(b)
    assert checksum(a) != checksum(a + 1)


def test_aggregation_deterministic():
    cfg = amgx.AMGConfig("determinism_flag=1")
    c1, c2 = DeterminismChecker(), DeterminismChecker()
    for c in (c1, c2):
        agg, nc = select_aggregates(A, "SIZE_2", cfg, "default")
        c.checkpoint("aggregates", agg)
        c.checkpoint("count", np.array([nc]))
    assert c1.matches(c2)


def test_pmis_deterministic():
    strong = strong_connections(A, "AHAT", 0.25)
    cf1 = pmis_select(A, strong)
    cf2 = pmis_select(A, strong)
    assert np.array_equal(cf1, cf2)


def test_hierarchy_deterministic():
    """Two full setups produce identical hierarchies (XLA is deterministic;
    this guards the host-side graph algorithms)."""
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "algorithm": "AGGREGATION", "selector": "SIZE_2",
        "smoother": "MULTICOLOR_GS", "coarse_solver": "DENSE_LU_SOLVER",
        "min_coarse_rows": 8, "max_iters": 3, "monitor_residual": 1,
        "tolerance": 1e-30, "convergence": "RELATIVE_INI",
        "scope": "main"}})
    sums = []
    for _ in range(2):
        s = amgx.SolverFactory.allocate(cfg)
        s.setup(amgx.Matrix(A))
        chk = DeterminismChecker()
        for lvl in s.amg.levels:
            chk.checkpoint(f"level{lvl.index}", lvl.m.csr.indptr,
                           lvl.m.csr.indices, lvl.m.csr.data)
        sums.append(chk.digest())
    assert sums[0] == sums[1]


def test_solve_deterministic():
    cfg = amgx.AMGConfig("solver=CG, max_iters=30, tolerance=1e-30, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    b = np.linspace(0, 1, A.n_rows)
    xs = []
    for _ in range(2):
        s = amgx.SolverFactory.allocate(cfg)
        s.setup(amgx.Matrix(A))
        x, _ = s.solve(b)
        xs.append(np.asarray(x))
    assert np.array_equal(xs[0], xs[1])
