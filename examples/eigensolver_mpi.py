"""Distributed eigensolver driver (mirror of reference
eigen_examples/eigensolver_mpi.c — every method over a device mesh).

Usage:
    python examples/eigensolver_mpi.py [-n SIDE] [-d N_DEV]
                                       [-m METHOD] [--which largest]

On a machine without N physical devices, run with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the SPMD path on a virtual mesh (the test-suite setup).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=24, help="Poisson side")
    ap.add_argument("-d", type=int, default=0,
                    help="devices (0 = all available)")
    ap.add_argument("-m", default="ALL",
                    help="method or ALL (POWER, LANCZOS, ARNOLDI, "
                         "SUBSPACE_ITERATION, LOBPCG, JACOBI_DAVIDSON)")
    ap.add_argument("--which", default="largest")
    args = ap.parse_args()

    import jax
    import amgx_tpu as amgx
    from amgx_tpu.distributed.eigen import DistributedEigenSolver
    from amgx_tpu.distributed.solve import make_mesh

    n_dev = args.d or len(jax.devices())
    mesh = make_mesh(n_dev)
    a = amgx.gallery.poisson5pt(args.n, args.n)
    ref = None
    if a.n_rows <= 4096:
        ref = float(np.linalg.eigvalsh(a.to_dense()).max())

    methods = ([args.m] if args.m != "ALL" else
               ["SINGLE_ITERATION", "LANCZOS", "ARNOLDI",
                "SUBSPACE_ITERATION", "LOBPCG", "JACOBI_DAVIDSON"])
    for m in methods:
        es = DistributedEigenSolver(m, mesh, max_iters=500,
                                    tolerance=1e-7, krylov_dim=40,
                                    which=args.which)
        es.setup(a)
        evals, evecs = es.solve()
        line = f"{m:20s} lambda={evals[0]:.8f} iters={es.last_iters}"
        if ref is not None:
            line += f"  rel_err={abs(evals[0]-ref)/ref:.2e}"
        print(line)


if __name__ == "__main__":
    main()
