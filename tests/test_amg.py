"""AMG hierarchy + cycle tests (mirrors core/tests/
aggregates_coarsening_factor.cu, classical_pmis.cu, classical_strength*.cu,
nested_amg_equivalence.cu, amg_levels_reuse.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.amg import classical as cls_mod
from amgx_tpu.amg import aggregation as agg_mod

A = amgx.gallery.poisson5pt(16, 16)
B = np.ones(A.n_rows)


def _amg_cfg(**over):
    base = {"solver": "AMG", "algorithm": "AGGREGATION", "selector": "SIZE_2",
            "smoother": "MULTICOLOR_GS", "presweeps": 1, "postsweeps": 1,
            "coarse_solver": "DENSE_LU_SOLVER", "min_coarse_rows": 8,
            "dense_lu_num_rows": 8,     # disable the early dense-LU gate so
            "max_levels": 20, "cycle": "V", "max_iters": 60,  # tests see
            "tolerance": 1e-8, "convergence": "RELATIVE_INI",  # deep grids
            "monitor_residual": 1, "scope": "main"}
    base.update(over)
    return amgx.AMGConfig({"config_version": 2, "solver": base})


def _run(cfg, a=A, b=B):
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    return s, status, rel


def test_aggregation_amg_converges():
    s, status, rel = _run(_amg_cfg())
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


def test_classical_amg_converges():
    s, status, rel = _run(_amg_cfg(algorithm="CLASSICAL", selector="PMIS",
                                   interpolator="D1"))
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


@pytest.mark.parametrize("cycle", ["V", "W", "F", "CG", "CGF"])
def test_cycles_converge(cycle):
    s, status, rel = _run(_amg_cfg(cycle=cycle, max_iters=80))
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


def test_aggregation_coarsening_factor():
    """SIZE_2 pairwise matching should roughly halve the rows
    (aggregates_coarsening_factor.cu)."""
    s, _, _ = _run(_amg_cfg())
    lv = s.amg.levels
    assert len(lv) >= 3
    for fine, coarse in zip(lv, lv[1:]):
        ratio = fine.n_rows / coarse.n_rows
        assert 1.5 <= ratio <= 4.5


def test_size4_size8_coarsen_faster():
    s2, _, _ = _run(_amg_cfg(selector="SIZE_2"))
    s8, _, _ = _run(_amg_cfg(selector="SIZE_8"))
    assert len(s8.amg.levels) < len(s2.amg.levels)


def test_pmis_valid_splitting():
    """classical_pmis.cu analog: C points form an independent set in the
    strength graph, and every F point has a strong path to a C point."""
    strong = cls_mod.strong_connections(A, "AHAT", 0.25)
    cf = cls_mod.pmis_select(A, strong)
    n = A.n_rows
    rows = np.repeat(np.arange(n), A.row_nnz())
    c_set = cf >= 0
    # independence on symmetrized strength graph
    both_c = c_set[rows] & c_set[A.indices] & strong
    assert not both_c.any()
    # coverage: every F point has >= 1 strong C neighbour (5pt Poisson)
    f_rows = rows[strong & c_set[A.indices]]
    covered = np.zeros(n, bool)
    covered[f_rows] = True
    assert covered[~c_set].all()


def test_strength_ahat_theta_monotone():
    s_small = cls_mod.strong_connections(A, "AHAT", 0.1)
    s_big = cls_mod.strong_connections(A, "AHAT", 0.9)
    assert s_big.sum() <= s_small.sum()


def test_strength_all():
    s = cls_mod.strong_connections(A, "ALL", 0.5)
    rows = np.repeat(np.arange(A.n_rows), A.row_nnz())
    assert s.sum() == (A.indices != rows).sum()


def test_interpolation_rowsums():
    """Direct interpolation preserves constants on M-matrix rows with
    strong C neighbours: P rows sum to ~1 for interior F points."""
    strong = cls_mod.strong_connections(A, "AHAT", 0.25)
    cf = cls_mod.pmis_select(A, strong)
    p = cls_mod.direct_interpolation(A, strong, cf)
    assert p.n_cols == int(cf.max()) + 1
    rs = np.asarray(p.to_scipy().sum(axis=1)).ravel()
    c_rows = cf >= 0
    assert np.allclose(rs[c_rows], 1.0)


def test_grid_stats_string():
    s, _, _ = _run(_amg_cfg())
    out = s.grid_stats_string()
    assert "Grid Complexity" in out and "Operator Complexity" in out


def test_structure_reuse_resetup():
    """amg_levels_reuse.cu analog: resetup with structure_reuse keeps the
    hierarchy shape and still converges on scaled values."""
    cfg = _amg_cfg(structure_reuse_levels=-1)
    s = amgx.SolverFactory.allocate(cfg)
    m = amgx.Matrix(A)
    s.setup(m)
    shapes1 = [l.n_rows for l in s.amg.levels]
    x1, _ = s.solve(B)
    m.replace_coefficients(A.data * 2.0)
    s.resetup(m)
    shapes2 = [l.n_rows for l in s.amg.levels]
    assert shapes1 == shapes2
    x2, status = s.solve(B)
    assert status == amgx.SolveStatus.SUCCESS
    assert np.allclose(2.0 * s.extract_vector(x2),
                       s.extract_vector(x1), atol=1e-5)


def test_nested_amg_equivalence():
    """nested_amg_equivalence.cu analog: AMG used standalone vs as a
    preconditioner of a 1-iteration Richardson-like FGMRES gives comparable
    convergence behavior."""
    s1, st1, rel1 = _run(_amg_cfg())
    cfg2 = amgx.AMGConfig({
        "config_version": 2,
        "solver": {"solver": "FGMRES", "gmres_n_restart": 30,
                   "max_iters": 60, "tolerance": 1e-8,
                   "convergence": "RELATIVE_INI", "monitor_residual": 1,
                   "scope": "main",
                   "preconditioner": {
                       "solver": "AMG", "scope": "amg",
                       "algorithm": "AGGREGATION", "selector": "SIZE_2",
                       "smoother": "MULTICOLOR_GS", "presweeps": 1,
                       "postsweeps": 1, "max_iters": 1,
                       "coarse_solver": "DENSE_LU_SOLVER",
                       "min_coarse_rows": 8, "cycle": "V"}}})
    s2, st2, rel2 = _run(cfg2)
    assert st2 == amgx.SolveStatus.SUCCESS
    assert s2.last_iters <= s1.last_iters


def test_energymin_algorithm():
    s, status, rel = _run(_amg_cfg(algorithm="ENERGYMIN",
                                   interpolator="EM", max_iters=100))
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


def test_dense_coarse_levels():
    """dense_threshold_rows moves small coarse operators onto the MXU."""
    s, status, rel = _run(_amg_cfg(dense_threshold_rows=128))
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6
    from amgx_tpu.matrix import DenseOperator
    kinds = [type(l.m.device_op()) for l in s.amg.levels]
    assert any(k is DenseOperator for k in kinds)


def test_adaptive_selector():
    s, status, rel = _run(_amg_cfg(selector="ADAPTIVE"))
    assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


def test_parallel_greedy_selector(rng):
    """MIS-rooted parallel aggregation: full cover, capped sizes,
    deterministic (parallel_greedy_selector.cu semantics)."""
    import amgx_tpu as amgx
    from amgx_tpu.amg.aggregation import select_aggregates
    cfg = amgx.AMGConfig()
    a = amgx.gallery.poisson7pt(10, 10, 10)
    agg, nc = select_aggregates(a, "PARALLEL_GREEDY_SELECTOR", cfg,
                                "default")
    sizes = np.bincount(agg)
    assert (agg >= 0).all() and agg.max() == nc - 1
    assert sizes.max() <= 8 and 2.0 <= a.n_rows / nc <= 8.0
    agg2, _ = select_aggregates(a, "PARALLEL_GREEDY_SELECTOR", cfg,
                                "default")
    assert np.array_equal(agg, agg2)


def test_geo_selector_coordinates():
    """GEO uses attached coordinates (Matrix aux geo.coords) for uniform
    spatial blocks (geo_selector.cu)."""
    import amgx_tpu as amgx
    from amgx_tpu.amg.aggregation import select_aggregates
    a = amgx.gallery.poisson7pt(8, 8, 8)
    a.aux["geo.coords"] = np.mgrid[0:8, 0:8, 0:8].reshape(3, -1).T * 1.0
    agg, nc = select_aggregates(a, "GEO", amgx.AMGConfig(), "default")
    assert (agg >= 0).all() and nc == 64        # 2x2x2 blocks of 8
    assert np.bincount(agg).max() == 8


def test_multi_pairwise_aggregation_passes():
    """aggregation_passes controls MULTI_PAIRWISE coarsening depth
    (core.cu:492: each pass about doubles aggregate size)."""
    import amgx_tpu as amgx
    from amgx_tpu.amg.aggregation import select_aggregates
    a = amgx.gallery.poisson5pt(32, 32)
    ncs = []
    for passes in (1, 2, 3):
        cfg = amgx.AMGConfig(f"aggregation_passes={passes}")
        _, nc = select_aggregates(a, "MULTI_PAIRWISE", cfg, "default")
        ncs.append(nc)
    assert ncs[0] > ncs[1] > ncs[2]             # deeper coarsening per pass


def test_energymin_interpolation_properties():
    """EM interpolation (energymin_amg_level.cu:93-368 analog): the
    constrained sweeps monotonically reduce tr(P^T A P) while preserving
    constants exactly; uncovered CR F-nodes are promoted to C."""
    import amgx_tpu as amgx
    from amgx_tpu.amg import classical as cls_mod
    from amgx_tpu.amg.energymin import em_interpolation, ensure_coverage
    a = amgx.gallery.poisson5pt(24, 24)
    strong = cls_mod.strong_connections(a, "AHAT", 0.25)
    cf = cls_mod.select_cf(a, strong, "CR", amgx.AMGConfig(), "default")
    cf = ensure_coverage(a, strong, cf)
    A = a.to_scipy()
    prev = np.inf
    for sw in (0, 1, 2, 4):
        P = em_interpolation(a, strong, cf, sweeps=sw).to_scipy()
        energy = (P.T @ A @ P).diagonal().sum()
        assert np.abs(P @ np.ones(P.shape[1]) - 1).max() < 1e-12
        assert energy <= prev + 1e-9
        prev = energy


def test_merge_singletons_mutual_pair():
    """Two mutual-strongest singletons must merge into ONE aggregate; the
    old simultaneous assignment swapped their ids and left both singleton
    (reference: merge_singletons, size2_selector.cu)."""
    import scipy.sparse as sp
    from amgx_tpu.amg.aggregation import merge_singletons
    # 0-1 strongly coupled pair; 2-3 another; 1-2 weak link
    w = sp.csr_matrix(np.array([[0, 9, 0, 0],
                                [9, 0, 1, 0],
                                [0, 1, 0, 9],
                                [0, 0, 9, 0]], np.float64))
    agg = np.arange(4)
    out = merge_singletons(w, agg.copy(), agg)
    assert out[0] == out[1] and out[2] == out[3]
    assert out[0] != out[2]
    # chain: 0 -> 1, and 1 <-> 2 mutual; all three singletons must land in
    # one aggregate (pointer jumping through the singleton hop)
    w2 = sp.csr_matrix(np.array([[0, 9, 0],
                                 [9, 0, 10],
                                 [0, 10, 0]], np.float64))
    out2 = merge_singletons(w2, np.arange(3), np.arange(3))
    assert out2[0] == out2[1] == out2[2]
