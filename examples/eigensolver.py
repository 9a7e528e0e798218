"""Eigensolver driver (mirror of reference eigen_examples/eigensolver.c).

Usage: python examples/eigensolver.py -c "eig_solver=LANCZOS, eig_which=largest"
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse

import numpy as np

import amgx_tpu as amgx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--matrix", help=".mtx file (default poisson5pt)")
    ap.add_argument("-c", "--config",
                    default="eig_solver=LANCZOS, eig_which=largest, "
                            "eig_max_iters=200, eig_tolerance=1e-8")
    ap.add_argument("--pagerank", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    amgx.initialize()
    cfg = amgx.AMGConfig(args.config)
    if args.matrix:
        a, _, _ = amgx.io.read_system(args.matrix)
    else:
        a = amgx.gallery.poisson5pt(32, 32)
    es = amgx.AMGEigenSolver(cfg)
    if args.pagerank:
        es.pagerank_setup(amgx.Matrix(a))
    else:
        es.setup(amgx.Matrix(a))
    evals, evecs = es.solve()
    print(f"iterations={es.solver.last_iters} eigenvalues={evals}")


if __name__ == "__main__":
    main()
