"""Driver for the multi-process (multi-host analog) distributed test.

Launched by test_multihost.py as N separate processes, each owning 4
virtual CPU devices of one global 8-device mesh — the CI analog of a
2-host TPU slice (the reference's MPI multi-rank path,
examples/amgx_mpi_capi.c:263-325). Each process runs the identical SPMD
program; cross-process data movement goes through
distributed/multihost.py.

Usage: python multihost_driver.py <pid> <nproc> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

import amgx_tpu as amgx  # noqa: E402
from amgx_tpu.distributed.solve import DistributedSolver, make_mesh  # noqa: E402

amgx.initialize()
A = amgx.gallery.poisson7pt(12, 12, 12)
b = np.ones(A.n_rows)
bnorm = np.linalg.norm(b)

# 1. PCG + sharded-setup AMG (classical PMIS/D1) across both processes
cfg = amgx.AMGConfig({"config_version": 2, "solver": {
    "solver": "PCG", "max_iters": 100, "tolerance": 1e-10,
    "convergence": "RELATIVE_INI", "monitor_residual": 1, "scope": "main",
    "preconditioner": {"solver": "AMG", "scope": "amg",
                       "algorithm": "CLASSICAL", "selector": "PMIS",
                       "interpolator": "D1", "smoother": "BLOCK_JACOBI",
                       "relaxation_factor": 0.7, "presweeps": 1,
                       "postsweeps": 1, "max_iters": 1,
                       "min_coarse_rows": 32, "max_levels": 12,
                       "cycle": "V"}}})
s = DistributedSolver(cfg, mesh=make_mesh(4 * nproc))
s.setup(A)
assert s._sharded_setup
x, st = s.solve(b)
r = np.linalg.norm(b - A.to_scipy() @ np.asarray(x)) / bnorm
assert st == 0 and r < 1e-8, (st, r)

# 2. plain Krylov (banded/DIA layout path, interior-split overlap)
cfg2 = amgx.AMGConfig(
    "solver=PCG, preconditioner=BLOCK_JACOBI, max_iters=300, "
    "tolerance=1e-8, convergence=RELATIVE_INI, monitor_residual=1")
s2 = DistributedSolver(cfg2, mesh=make_mesh(4 * nproc))
s2.setup(A)
x2, st2 = s2.solve(b)
r2 = np.linalg.norm(b - A.to_scipy() @ np.asarray(x2)) / bnorm
assert st2 == 0 and r2 < 1e-6, (st2, r2)

print(f"MULTIHOST_OK pid={pid} amg_resid={r:.3e} pcg_resid={r2:.3e} "
      f"amg_iters={s.last_iters}", flush=True)
