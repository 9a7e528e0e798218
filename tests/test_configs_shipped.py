"""Every shipped config preset must parse and allocate its solver tree
(mirrors core/tests/factories.cu + nested_solvers.cu); a representative
sample must actually solve."""

import glob
import json
import os

import numpy as np
import pytest

import amgx_tpu as amgx

CFG_DIR = os.path.join(os.path.dirname(amgx.__file__), "configs")
ALL = sorted(glob.glob(os.path.join(CFG_DIR, "*.json")))


def test_configs_exist():
    assert len(ALL) >= 60


@pytest.mark.parametrize("path", ALL, ids=[os.path.basename(p)
                                           for p in ALL])
def test_config_parses_and_allocates(path):
    cfg = amgx.AMGConfig(open(path).read())
    s = amgx.SolverFactory.allocate(cfg)
    assert s is not None


SOLVE_SAMPLE = ["FGMRES_AGGREGATION.json", "AMG_CLASSICAL_PMIS.json",
                "PCG_V.json", "PBICGSTAB.json", "CHEB_SOLVER_NOPREC.json",
                "JACOBI.json", "V-cheby-smoother.json",
                "GMRES_AMG_D2.json", "IDR_DILU.json", "PCG_DILU.json",
                "AMG_CLASSICAL_AGGRESSIVE_L1_TRUNC.json",
                "CLASSICAL_W_CYCLE.json", "AGGREGATION_MULTI_PAIRWISE.json",
                "PCGF_CLASSICAL_V_JACOBI.json"]


@pytest.mark.parametrize("name", SOLVE_SAMPLE)
def test_config_solves_poisson(name):
    cfg = amgx.AMGConfig(open(os.path.join(CFG_DIR, name)).read())
    cfg.set("print_solve_stats", 0)
    cfg.set("obtain_timings", 0)
    a = amgx.gallery.poisson5pt(12, 12)
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ s.extract_vector(x)) / \
        np.linalg.norm(b)
    if name in ("JACOBI.json", "CHEB_SOLVER_NOPREC.json"):
        assert rel < 0.5          # plain relaxation: progress only
    elif name == "AMG_CLASSICAL_AGGRESSIVE_L1_TRUNC.json":
        # aggressive coarsening trades per-cycle rate for grid size
        assert rel < 1e-2
    else:
        assert status == amgx.SolveStatus.SUCCESS and rel < 1e-6


DIST_SAMPLE = ["FGMRES_AGGREGATION.json", "AMG_CLASSICAL_PMIS.json",
               "PCG_V.json", "PBICGSTAB.json", "GMRES_AMG_D2.json",
               "CLASSICAL_W_CYCLE.json", "V-cheby-smoother.json",
               "PCG_CLASSICAL_V_JACOBI.json",
               "PBICGSTAB_AGGREGATION_W_JACOBI.json",
               "AMG_CLASSICAL_AGGRESSIVE_L1_TRUNC.json"]


@pytest.mark.parametrize("name", DIST_SAMPLE)
def test_config_solves_distributed(name):
    """A representative shipped-config sample must also run through the
    mesh-partitioned SPMD solver (reference: the same JSON configs drive
    the MPI examples, examples/amgx_mpi_capi.c); configs whose components
    have no distributed implementation fall back (documented) and are
    skipped here."""
    import jax
    from amgx_tpu.distributed.solve import DistributedSolver, make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    path = os.path.join(CFG_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not shipped")
    cfg = amgx.AMGConfig(open(path).read())
    cfg.set("print_solve_stats", 0)
    cfg.set("obtain_timings", 0)
    cfg.set("print_grid_stats", 0)
    a = amgx.gallery.poisson5pt(16, 16)
    b = np.ones(a.n_rows)
    try:
        s = DistributedSolver(cfg, make_mesh(8))
        s.setup(a)
        x, status = s.solve(b)
    except NotImplementedError as e:
        pytest.skip(f"documented single-chip fallback: {e}")
    rel = np.linalg.norm(b - a.to_scipy() @ np.asarray(x)) / \
        np.linalg.norm(b)
    if name == "AMG_CLASSICAL_AGGRESSIVE_L1_TRUNC.json":
        # standalone aggressive AMG trades per-cycle rate for grid size
        # (same bound as the single-chip sample)
        assert rel < 1e-2, (name, status, rel)
    else:
        assert status == 0 and rel < 1e-6, (name, status, rel)


EIG_DIR = os.path.join(CFG_DIR, "eigen")
EIG_ALL = sorted(glob.glob(os.path.join(EIG_DIR, "*.json")))


@pytest.mark.parametrize("path", EIG_ALL, ids=[os.path.basename(p)
                                               for p in EIG_ALL])
def test_eigen_config_allocates(path):
    cfg = amgx.AMGConfig(open(path).read())
    es = amgx.EigenSolverFactory.allocate(cfg)
    assert es is not None


def test_eigen_lanczos_preset_solves():
    cfg = amgx.AMGConfig(open(os.path.join(EIG_DIR, "LANCZOS.json")).read())
    a = amgx.gallery.poisson5pt(10, 10)
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(a))
    evals, _ = es.solve()
    ref = np.linalg.eigvalsh(a.to_dense()).max()
    assert abs(evals[0] - ref) / ref < 1e-4


def test_print_config_echo(capsys):
    cfg = amgx.AMGConfig("solver=CG, print_config=1, max_iters=3")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(amgx.gallery.poisson5pt(4, 4)))
    out = capsys.readouterr().out
    assert "Configuration" in out and "max_iters" in out
