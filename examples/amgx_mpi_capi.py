"""Distributed C-API driver — the analog of the reference's MPI example
(examples/amgx_mpi_capi.c:263-325): each rank uploads ONLY its owned rows
of a partitioned system, solves over the whole mesh, and downloads its
local solution slice.

Single-process run (all shards in one process, partition by offsets):

    python examples/amgx_mpi_capi.py [matrix.mtx] [config.json]

Multi-process run (one process per host, rank-local upload — the
reference's true MPI contract): launch N copies under `jax.distributed`,
e.g. with JAX_COORDINATOR/NUM_PROCESSES/PROCESS_ID environment variables,
and each process uploads its own contiguous row block.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import amgx_tpu as amgx
from amgx_tpu import capi


def main():
    import jax
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    amgx.initialize()
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else None
    if cfg_path:
        _, cfg = capi.AMGX_config_create_from_file(cfg_path)
    else:
        _, cfg = capi.AMGX_config_create(
            "config_version=2, solver=PCG, preconditioner=BLOCK_JACOBI, "
            "max_iters=200, tolerance=1e-10, convergence=RELATIVE_INI, "
            "monitor_residual=1, print_solve_stats=1")
    _, rsrc = capi.AMGX_resources_create_simple(cfg)
    _, M = capi.AMGX_matrix_create(rsrc, "dDDI")
    _, B = capi.AMGX_vector_create(rsrc, "dDDI")
    _, X = capi.AMGX_vector_create(rsrc, "dDDI")

    if len(sys.argv) > 1:
        A = amgx.io.read_system(sys.argv[1])[0]
    else:
        A = amgx.gallery.poisson7pt(24, 24, 24)
    n = A.n_rows
    b = np.ones(n)
    sp = A.to_scipy().tocsr()

    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc > 1:
        # rank-local upload: this process passes only its owned rows
        lo, hi = pid * n // nproc, (pid + 1) * n // nproc
        loc = sp[lo:hi]
        capi.AMGX_matrix_upload_distributed(
            M, n, hi - lo, loc.nnz, 1, 1, loc.indptr, loc.indices,
            loc.data)
        capi.AMGX_vector_upload(B, hi - lo, 1, b[lo:hi])
        capi.AMGX_vector_set_zero(X, hi - lo, 1)
    else:
        # single process: global upload with contiguous partition offsets
        n_dev = len(jax.devices())
        _, dist = capi.AMGX_distribution_create()
        dist.set_partition_data(
            "offsets", np.linspace(0, n, n_dev + 1, dtype=np.int64))
        capi.AMGX_matrix_upload_distributed(
            M, n, n, A.nnz, 1, 1, A.indptr, A.indices, A.data, None, dist)
        capi.AMGX_vector_upload(B, n, 1, b)
        capi.AMGX_vector_set_zero(X, n, 1)

    _, S = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(S, M)
    capi.AMGX_solver_solve_with_0_initial_guess(S, B, X)
    _, x_loc = capi.AMGX_vector_download(X)
    _, iters = capi.AMGX_solver_get_iterations_number(S)

    if nproc > 1:
        from amgx_tpu.distributed.multihost import allgather_host
        x = np.concatenate(allgather_host(x_loc))
    else:
        x = x_loc
    r = np.linalg.norm(b - sp @ x) / np.linalg.norm(b)
    print(f"rank {pid}/{nproc}: status={S.status} iters={iters} "
          f"true relative residual={r:.3e}")


if __name__ == "__main__":
    main()
