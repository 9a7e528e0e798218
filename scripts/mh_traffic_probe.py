"""Profile per-call-site allgather_host traffic in a 2-process rank-local
AMG setup (diagnostic only)."""
import os
import sys
import traceback
from collections import defaultdict

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

import numpy as np  # noqa: E402

import amgx_tpu as amgx  # noqa: E402
from amgx_tpu.distributed import multihost as mh  # noqa: E402

site_bytes = defaultdict(int)
site_calls = defaultdict(int)
_orig = mh.allgather_host


def traced(arr):
    stack = traceback.extract_stack()
    # innermost frame inside amgx_tpu that is not multihost.py
    site = "?"
    for fr in reversed(stack[:-1]):
        if "amgx_tpu" in fr.filename and "multihost" not in fr.filename \
                and "mh_traffic" not in fr.filename:
            site = f"{os.path.basename(fr.filename)}:{fr.lineno}"
            break
    site_bytes[site] += np.asarray(arr).nbytes
    site_calls[site] += 1
    return _orig(arr)


mh.allgather_host = traced
import amgx_tpu.distributed.setup as dsetup  # noqa: E402
dsetup_names = [n for n in dir(dsetup)]

from amgx_tpu import capi  # noqa: E402

amgx.initialize()
A5 = amgx.gallery.poisson7pt(14, 14, 14)
n5 = A5.n_rows
lo5, hi5 = pid * n5 // nproc, (pid + 1) * n5 // nproc
sp5 = A5.to_scipy().tocsr()
loc5 = sp5[lo5:hi5]
b5 = np.ones(n5)
_, cfg5 = capi.AMGX_config_create(
    "config_version=2, solver=PCG, max_iters=100, tolerance=1e-10, "
    "convergence=RELATIVE_INI, monitor_residual=1, "
    "preconditioner(amg)=AMG, amg:algorithm=CLASSICAL, "
    "amg:selector=PMIS, amg:interpolator=D1, amg:smoother=BLOCK_JACOBI, "
    "amg:relaxation_factor=0.7, amg:presweeps=1, amg:postsweeps=1, "
    "amg:max_iters=1, amg:min_coarse_rows=32, amg:max_levels=12, "
    "amg:cycle=V")
_, rsrc5 = capi.AMGX_resources_create_simple(cfg5)
_, mh5 = capi.AMGX_matrix_create(rsrc5, "dDDI")
_, bh5 = capi.AMGX_vector_create(rsrc5, "dDDI")
_, xh5 = capi.AMGX_vector_create(rsrc5, "dDDI")
capi.AMGX_matrix_upload_distributed(
    mh5, n5, hi5 - lo5, loc5.nnz, 1, 1, loc5.indptr, loc5.indices,
    loc5.data)
capi.AMGX_vector_upload(bh5, hi5 - lo5, 1, b5[lo5:hi5])
capi.AMGX_vector_set_zero(xh5, hi5 - lo5, 1)
_, sh5 = capi.AMGX_solver_create(rsrc5, "dDDI", cfg5)
capi.AMGX_solver_setup(sh5, mh5)
capi.AMGX_solver_solve_with_0_initial_guess(sh5, bh5, xh5)

if pid == 0:
    total = sum(site_bytes.values())
    print(f"TOTAL {total}B over {sum(site_calls.values())} calls "
          f"(operator ~{sp5.nnz * 12}B)", flush=True)
    for site, nb in sorted(site_bytes.items(), key=lambda kv: -kv[1]):
        print(f"  {site:40s} {nb:>10d}B  {site_calls[site]:>5d} calls",
              flush=True)
