"""Per-piece V-cycle breakdown on chip (VERDICT r4 weak #2): slope-time
each level's operator apply, P/R transfer, smoother sweep, coarse LU, the
full preconditioner apply, and the full fused PCG iteration, for the
amg_pcg flagship config at 48^3."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax                                                  # noqa: E402
import jax.numpy as jnp                                     # noqa: E402
import amgx_tpu as amgx                                     # noqa: E402

print("devices:", jax.devices())


def slope_time(g, inner=12, reps=4):
    for k in (inner, 3 * inner):
        float(g(k))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(inner))
        t1 = time.perf_counter()
        float(g(3 * inner))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * inner))
    return max(float(np.median(slopes)), 1e-12)


def timed_apply(name, opfn, tree, n_in, n_out, inner=12):
    """Slope-time y = opfn(tree, x) with a chained fori_loop."""
    @jax.jit
    def g_(k, t, x0):
        def body(_, x):
            y = opfn(t, x)
            if n_out == n_in:
                return y * (1.0 - 1e-30)
            return x0 + 1e-30 * jnp.sum(y)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x0))

    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal(n_in).astype(np.float32))
    dt = slope_time(lambda k: g_(k, tree, x0), inner)
    print(f"  {name:34s} {dt*1e6:9.1f} us")
    return dt


n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 48
a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
cfg = amgx.AMGConfig({"config_version": 2, "solver": {
    "solver": "PCG", "max_iters": 100, "tolerance": 1e-6,
    "convergence": "RELATIVE_INI", "monitor_residual": 1,
    "fused_solve": 1, "mode": "dFFI", "scope": "main",
    "preconditioner": {"solver": "AMG", "scope": "amg",
                       "dense_threshold_rows": 4096,
                       "algorithm": "AGGREGATION", "selector": "SIZE_8",
                       "smoother": "BLOCK_JACOBI",
                       "relaxation_factor": 0.7,
                       "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                       "min_coarse_rows": 64, "max_levels": 12,
                       "cycle": "V"}}})
s = amgx.SolverFactory.allocate(cfg)
s.setup(amgx.Matrix(a, mode="dFFI"))
amg = s.preconditioner.amg
print("levels:")
for i, lev in enumerate(amg.levels):
    op = lev.m.device_op(4096)
    print(f"  L{i}: n={lev.n_rows} nnz={lev.nnz} op={type(op).__name__}"
          + (f" W={op.width}" if hasattr(op, "width") else ""))

for i, lev in enumerate(amg.levels):
    op = lev.m.device_op(4096)
    n = lev.n_rows
    xlen_probe = op.apply(jnp.zeros(
        op.n_pad if hasattr(op, "n_pad") else n, jnp.float32)).shape[0]
    timed_apply(f"L{i} op.apply ({type(op).__name__})",
                lambda t, x: t.apply(x), op, xlen_probe, xlen_probe)
    if lev.P is not None:
        nc = amg.levels[i + 1].n_rows
        pin = lev.P.n_pad if hasattr(lev.P, "n_pad") else nc
        # P: coarse -> fine
        xc = lev.R.apply(jnp.zeros(
            lev.R.n_pad if hasattr(lev.R, "n_pad") else xlen_probe,
            jnp.float32))
        timed_apply(f"L{i} P.apply ({type(lev.P).__name__})",
                    lambda t, x: t.apply(x), lev.P, xc.shape[0], -1)
        timed_apply(f"L{i} R.apply ({type(lev.R).__name__})",
                    lambda t, x: t.apply(x), lev.R,
                    lev.R.cols.shape[0] if hasattr(lev.R, "cols")
                    else xlen_probe, -1)
    if lev.smoother is not None:
        sm = lev.smoother

        def sweep(t, x, lev=lev, sm=sm):
            st = sm.solve_init(x, x, False)
            y, _ = sm.first_iteration(x, x, st, False)
            return y
        try:
            timed_apply(f"L{i} smoother sweep", sweep, None,
                        xlen_probe, xlen_probe)
        except Exception as e:
            print(f"  L{i} smoother sweep FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")

# full preconditioner apply
pre = s.preconditioner.as_preconditioner()
npad = amg.levels[0].m.device_op(4096).n_pad
timed_apply("FULL precond apply (V-cycle)",
            lambda t, x: pre(x), None, npad, npad, inner=8)

# full PCG iteration (fused solve / iters)
b = np.ones(a.n_rows, np.float32)
s.solve(b)
t0 = time.perf_counter()
s.solve(b)
dt = time.perf_counter() - t0
print(f"full solve: {dt*1e3:.1f} ms / {s.last_iters} iters = "
      f"{dt/max(1,s.last_iters)*1e3:.2f} ms/iter")
