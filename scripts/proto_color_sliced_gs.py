"""Evaluated-and-not-integrated prototype (round 5): per-color ROW-SLICED
operator packs for multicolor GS smoothing.

Color-sequential GS on TPU pays one FULL SpMV per color (the masked
update form); slicing the operator into per-color row subsets (zero
rows elsewhere) makes each color's apply touch only its own nnz:
chip-measured at the classical 48^3 L1 level (35k rows, 966k nnz, 19
colors): sweep 1019 us (masked, 19 full G5 applies) -> 91 us (19 sliced
G5 applies), 11x. Rejected as a default because the 19 per-color packs
add 1.27 s of setup (pack overhead dominates at ~50k nnz each;
slots/nnz 2.44) — the warm-setup target (<=1.0 s) outweighs ~60-80 ms
per classical solve. Becomes attractive if per-color packs are ever
batched through one native pass. Run this script on the chip to
reproduce."""

import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.ops.gather_spmv import csr_to_gather


def main(side=48):
    a = amgx.gallery.poisson7pt(side, side, side, dtype=np.float32)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": 20, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": "dFFI", "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        "interp_max_elements": 4, "presweeps": 1, "postsweeps": 1,
        "min_coarse_rows": 64, "max_levels": 12, "cycle": "V",
        "dense_threshold_rows": 4096}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode="dFFI"))
    lev = s.amg.levels[1]
    csr, sm = lev.m.csr, lev.smoother
    col = np.asarray(sm.color)[:csr.n_rows]
    C = sm.num_colors
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    t0 = time.perf_counter()
    packs, tot = [], 0
    for c in range(C):
        k = col[rows] == c
        cc = CSRMatrix.from_coo(csr.n_rows, csr.n_cols, rows[k],
                                csr.indices[k], csr.data[k],
                                sum_duplicates=False)
        gm = csr_to_gather(cc, dtype=np.float32, allow_empty=True)
        packs.append(gm)
        tot += gm.slots if gm else 0
    print(f"packs: {time.perf_counter()-t0:.2f}s "
          f"slots/nnz {tot/csr.nnz:.2f} colors {C}")

    def slope(g, inner=10, reps=4):
        for kk in (inner, 3 * inner):
            float(g(kk))
        v = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(g(inner))
            t1 = time.perf_counter(); float(g(3 * inner))
            t2 = time.perf_counter()
            v.append(((t2 - t1) - (t1 - t0)) / (2 * inner))
        return max(float(np.median(v)), 1e-12)

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(csr.n_rows).astype(np.float32))

    @jax.jit
    def g_sliced(k, ps, x0):
        def body(i, u):
            for gm in ps:
                y = gm.apply_rect(u[:gm.n_cols])
                u = u.at[:y.shape[0]].add(1e-30 * y)
            return u * (1.0 - 1e-30)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x0))

    full = lev.m.device_op(4096)

    @jax.jit
    def g_full(k, op, x0):
        def body(i, u):
            for c in range(C):
                u = u.at[:].add(1e-30 * op.apply(u))
            return u * (1.0 - 1e-30)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x0))

    print(f"sliced: {slope(lambda k: g_sliced(k, packs, x))*1e6:.0f}us  "
          f"masked: {slope(lambda k: g_full(k, full, x))*1e6:.0f}us")


if __name__ == "__main__":
    main()
