"""Plugin-system tests (mirrors template_plugin/ and the
initialize_plugins walker)."""

import os

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.plugins import load_plugin, initialize_plugins

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEMPLATE = os.path.join(HERE, "examples", "template_plugin.py")


def test_template_plugin_registers_and_solves():
    load_plugin(TEMPLATE)
    assert "TEMPLATE_SOLVER" in amgx.SolverFactory.names()
    cfg = amgx.AMGConfig("solver=TEMPLATE_SOLVER, template_relaxation=0.2, "
                         "max_iters=300, tolerance=1e-6, "
                         "convergence=RELATIVE_INI, monitor_residual=1")
    a = amgx.gallery.poisson5pt(8, 8)
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    assert rel < 1e-4


def test_plugin_config_walker(tmp_path):
    p = tmp_path / "PluginConfig.txt"
    p.write_text(f"# comment line\n{TEMPLATE}\n")
    loaded = initialize_plugins(str(p))
    assert loaded == [TEMPLATE]


def test_cycle_knobs():
    """finest_sweeps + error_scaling still converge."""
    a = amgx.gallery.poisson5pt(16, 16)
    # error_scaling=3 (energy minimization) is the productive mode for
    # unsmoothed aggregation; mode 2 throttles the correction by design
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "algorithm": "AGGREGATION", "selector": "SIZE_2",
        "smoother": "MULTICOLOR_GS", "coarse_solver": "DENSE_LU_SOLVER",
        "min_coarse_rows": 8, "dense_lu_num_rows": 8, "cycle": "V",
        "finest_sweeps": 2, "error_scaling": 3,
        "max_iters": 60, "tolerance": 1e-8, "convergence": "RELATIVE_INI",
        "monitor_residual": 1, "scope": "main"}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    assert status == amgx.SolveStatus.SUCCESS
