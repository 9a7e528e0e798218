"""SpMV timing harness (mirror of reference examples/amgx_spmv_test.c:
427-439: average SpMV time over -it repetitions, with a host-reference
check like its -ref flag)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import time

import numpy as np

import amgx_tpu as amgx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--matrix", help=".mtx file (default: poisson7pt)")
    ap.add_argument("--side", type=int, default=64)
    ap.add_argument("-it", type=int, default=100)
    ap.add_argument("-ref", action="store_true",
                    help="verify against the host (scipy) SpMV")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    amgx.initialize()
    if args.matrix:
        a, _, _ = amgx.io.read_system(args.matrix)
    else:
        a = amgx.gallery.poisson7pt(args.side, args.side, args.side)
    import jax
    import jax.numpy as jnp
    from amgx_tpu.matrix import csr_to_ell
    op = csr_to_ell(a)
    x = np.random.default_rng(0).standard_normal(op.n_pad)
    xd = jnp.asarray(x)
    scale = 0.12
    inner = args.it

    def many(v):
        return jax.lax.fori_loop(0, inner, lambda i, u: op.apply(u) * scale,
                                 v)
    f = jax.jit(many)
    f(xd).block_until_ready()
    t0 = time.perf_counter()
    f(xd).block_until_ready()
    dt = (time.perf_counter() - t0) / inner
    print(f"n={a.n_rows} nnz={a.nnz} avg SpMV time: {dt*1e6:.1f} us "
          f"({a.nnz/dt/1e9:.2f} Gnnz/s)")
    if args.ref:
        y = np.asarray(jax.jit(op.apply)(xd))[: a.n_rows]
        ref = a.to_scipy() @ x[: a.n_rows]
        err = np.abs(y - ref).max() / max(1e-30, np.abs(ref).max())
        print(f"max rel err vs host reference: {err:.3e}")
        assert err < 1e-5


if __name__ == "__main__":
    main()
