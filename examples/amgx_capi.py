"""Single-chip C-API demo (mirror of reference examples/amgx_capi.c).

Usage: python examples/amgx_capi.py -m system.mtx -c config.json
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse

import numpy as np

from amgx_tpu import capi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--matrix", required=True, help=".mtx system file")
    ap.add_argument("-c", "--config", required=True, help="JSON/cfg file")
    ap.add_argument("--mode", default="dDDI")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    capi.AMGX_initialize()
    rc, cfg = capi.AMGX_config_create_from_file(args.config)
    rc, rsrc = capi.AMGX_resources_create_simple(cfg)
    rc, A = capi.AMGX_matrix_create(rsrc, args.mode)
    rc, b = capi.AMGX_vector_create(rsrc, args.mode)
    rc, x = capi.AMGX_vector_create(rsrc, args.mode)
    capi.AMGX_read_system(A, b, x, args.matrix)
    n = A.csr.n_rows
    if x.data is None or not np.any(x.data):
        capi.AMGX_vector_set_zero(x, n, A.block_dim[0])
    rc, solver = capi.AMGX_solver_create(rsrc, args.mode, cfg)
    capi.AMGX_solver_setup(solver, A)
    capi.AMGX_solver_solve(solver, b, x)
    rc, status = capi.AMGX_solver_get_status(solver)
    rc, iters = capi.AMGX_solver_get_iterations_number(solver)
    print(f"status={status} iterations={iters}")
    capi.AMGX_solver_destroy(solver)
    capi.AMGX_finalize()


if __name__ == "__main__":
    main()
