"""Benchmark driver — prints ONE JSON line with the headline metric.

Run on real TPU hardware by the round driver. Measures:
  * SpMV throughput (DIA/stencil path and general ELL path) on 3-D Poisson —
    K applications fused into one jitted fori_loop so launch latency (large
    through remote tunnels) amortizes out and kernel bandwidth is what's
    measured,
  * AMG-preconditioned PCG setup + solve wall time (the solve runs as a
    single fused lax.while_loop program).
Headline: SpMV effective bandwidth; vs_baseline = fraction of the chip's
HBM speed-of-light (the reference publishes no numbers — BASELINE.md — so
the speed-of-light fraction is the honest yardstick).
"""

from __future__ import annotations

import json
import time

import numpy as np

_HBM_GBPS = {
    "TPU v2": 700.0, "TPU v3": 900.0, "TPU v4": 1228.0,
    "TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v5p": 2765.0,
    "TPU v5": 2765.0, "TPU v6 lite": 1640.0, "TPU v6e": 1640.0,
}


def _hbm_gbps(device) -> float:
    kind = getattr(device, "device_kind", "")
    best = None
    for k, v in _HBM_GBPS.items():
        if kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else 819.0


def bench_spmv(n_side: int, inner: int, reps: int, dtype=np.float32):
    import jax
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.matrix import csr_to_ell
    from amgx_tpu.ops.spmv import csr_to_dia

    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    nnz = a.nnz
    results = {}
    scale = np.asarray(0.12, dtype)   # keep iterates bounded (|lam|<8.4)
    # the general ELL gather path is exercised on a smaller system: XLA
    # gathers scalarize on TPU, this path exists for irregular matrices
    a_ell = amgx.gallery.poisson7pt(min(n_side, 48), min(n_side, 48),
                                    min(n_side, 48), dtype=dtype)
    for name, op, mat in (("dia", csr_to_dia(a, dtype=dtype), a),
                          ("ell", csr_to_ell(a_ell, dtype=dtype), a_ell)):
        if op is None:
            continue
        nnz = mat.nnz
        n_pad = op.n_pad

        def many(x, op=op):
            return jax.lax.fori_loop(
                0, inner, lambda i, v: op.apply(v) * scale, x)

        f = jax.jit(many)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            n_pad).astype(dtype))
        f(x).block_until_ready()              # compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            f(x).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / inner)
        itemsize = np.dtype(dtype).itemsize
        if name == "dia":
            bytes_moved = (len(op.offsets) * n_pad + 2 * n_pad) * itemsize
        else:
            bytes_moved = (op.vals.size * itemsize + op.cols.size * 4
                           + 2 * n_pad * itemsize)
        results[name] = {"n": mat.n_rows, "nnz": nnz, "time_s": best,
                         "gbps": bytes_moved / best / 1e9,
                         "gnnz_per_s": nnz / best / 1e9}
    return a, results


def bench_amg(n_side: int, dtype=np.float32):
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    mode = "dFFI" if dtype == np.float32 else "dDDI"
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "mode": mode, "scope": "main",
        "preconditioner": {"solver": "AMG", "scope": "amg",
                           "algorithm": "AGGREGATION",
                           "selector": "SIZE_8",
                           "smoother": "BLOCK_JACOBI",
                           "relaxation_factor": 0.7,
                           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
                           "min_coarse_rows": 64, "max_levels": 12,
                           "cycle": "V"}}})
    s = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s.setup(amgx.Matrix(a, mode=mode))
    setup_t = time.perf_counter() - t0
    b = np.ones(a.n_rows, dtype)
    x, status = s.solve(b)            # includes the fused-loop compile
    t0 = time.perf_counter()
    x, status = s.solve(b)            # steady-state timing
    solve_t = time.perf_counter() - t0
    rel = float(self_rel(s))
    levels = len(s.preconditioner.amg.levels) \
        if getattr(s, "preconditioner", None) is not None else 0
    return {"n": a.n_rows, "nnz": a.nnz, "setup_s": setup_t,
            "solve_s": solve_t, "iters": s.last_iters, "status": status,
            "rel_resid": rel, "levels": levels}


def self_rel(s):
    if not s.res_history:
        return float("nan")
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    return h[-1] / h[0] if h[0] else float("nan")


def main():
    import jax
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        # large enough to amortize the ~300us fixed per-op launch floor of
        # the tunneled runtime against real HBM traffic (192^3 compiles hang
        # through the remote-compile tunnel; 128^3 is the verified sweet
        # spot)
        spmv_side, inner, reps, amg_side = 128, 50, 4, 48
    else:
        spmv_side, inner, reps, amg_side = 24, 10, 2, 16
    a, spmv = bench_spmv(spmv_side, inner, reps)
    amg = bench_amg(amg_side)
    best = max(spmv.values(), key=lambda r: r["gbps"])
    sol = _hbm_gbps(dev)
    print(json.dumps({
        "metric": "spmv_gbps",
        "value": round(best["gbps"], 2),
        "unit": "GB/s",
        "vs_baseline": round(best["gbps"] / sol, 4),
        "detail": {"device": getattr(dev, "device_kind", str(dev)),
                   "hbm_sol_gbps": sol, "n": a.n_rows, "nnz": a.nnz,
                   "spmv": spmv, "amg_pcg": amg},
    }))


if __name__ == "__main__":
    main()
