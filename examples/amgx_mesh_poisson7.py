"""Distributed Poisson-7pt solve over the device mesh
(mirror of reference examples/amgx_mpi_poisson7.c: built-in generator +
row-partitioned solve; MPI ranks -> mesh shards).

Usage: python examples/amgx_mesh_poisson7.py --nx 64 --ny 64 --nz 64
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse

import numpy as np

import amgx_tpu as amgx
from amgx_tpu.distributed import DistributedSolver
from amgx_tpu.distributed.solve import make_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--ny", type=int, default=32)
    ap.add_argument("--nz", type=int, default=32)
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (0 = all)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    amgx.initialize()
    mesh = make_mesh(args.devices or None)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_8",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 64, "cycle": "V"}}})
    a = amgx.gallery.poisson7pt(args.nx, args.ny, args.nz)
    s = DistributedSolver(cfg, mesh)
    s.setup(a)
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    rel = np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b)
    print(f"devices={mesh.devices.size} levels={len(s.levels)} "
          f"status={status} iters={s.last_iters} rel_resid={rel:.3e} "
          f"setup={s.setup_time:.3f}s solve={s.solve_time:.3f}s")


if __name__ == "__main__":
    main()
