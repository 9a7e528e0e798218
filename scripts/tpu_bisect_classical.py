"""Bisect the TPU kernel fault behind BENCH_r03 amg_classical rc=1.

Runs escalating probes, each in its own subprocess with a deadline, on the
real TPU. Usage: python scripts/tpu_bisect_classical.py [phase ...]
(no args = run all phases sequentially and print a summary).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def phase_f64_basic():
    """f64 arithmetic + DIA spmv via the XLA fallback path."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.ops.spmv import csr_to_dia, dia_spmv
    a = amgx.gallery.poisson7pt(32, 32, 32, dtype=np.float64)
    dia = csr_to_dia(a, dtype=np.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(dia.n_pad))
    f = jax.jit(lambda op, v: jnp.sum(dia_spmv(op, v)))
    r = float(f(dia, x))
    print(json.dumps({"ok": True, "sum": r}))


def phase_f64_ell():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.matrix import csr_to_ell
    a = amgx.gallery.poisson7pt(32, 32, 32, dtype=np.float64)
    op = csr_to_ell(a, dtype=np.float64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.n_pad))
    f = jax.jit(lambda o, v: jnp.sum(o.apply(v)))
    print(json.dumps({"ok": True, "sum": float(f(op, x))}))


def _classical(n_side, mode, smoother, dtype, max_iters=10):
    import jax
    if mode[1] == "D":
        jax.config.update("jax_enable_x64", True)
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": max_iters, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "mode": mode, "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": smoother,
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 64,
        "max_levels": 12, "cycle": "V",
        "dense_threshold_rows": 4096}})
    s = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s.setup(amgx.Matrix(a, mode=mode))
    setup_t = time.perf_counter() - t0
    b = np.ones(a.n_rows, dtype)
    t0 = time.perf_counter()
    x, status = s.solve(b)
    solve_t = time.perf_counter() - t0
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    print(json.dumps({"ok": True, "setup_s": setup_t, "solve_s": solve_t,
                      "iters": s.last_iters, "status": status,
                      "rel": (h[-1] / h[0]) if h and h[0] else None}))


def phase_cla16_f64_mcgs():
    _classical(16, "dDDI", "MULTICOLOR_GS", np.float64)


def phase_cla32_f64_bj():
    _classical(32, "dDDI", "BLOCK_JACOBI", np.float64)


def phase_cla32_f32_mcgs():
    _classical(32, "dFFI", "MULTICOLOR_GS", np.float32)


def phase_cla32_f64_mcgs():
    _classical(32, "dDDI", "MULTICOLOR_GS", np.float64)


def phase_cla32_f64_l1j():
    _classical(32, "dDDI", "JACOBI_L1", np.float64)


def phase_mcgs32_f64_alone():
    """MULTICOLOR_GS as a standalone smoother solve, f64, no AMG."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(32, 32, 32, dtype=np.float64)
    cfg = amgx.AMGConfig(
        "solver=MULTICOLOR_GS, max_iters=10, tolerance=1e-8, "
        "convergence=RELATIVE_INI, monitor_residual=1, mode=dDDI")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode="dDDI"))
    b = np.ones(a.n_rows)
    x, status = s.solve(b)
    print(json.dumps({"ok": True, "iters": s.last_iters,
                      "status": status}))


PHASES = [
    "f64_basic", "f64_ell", "cla16_f64_mcgs", "mcgs32_f64_alone",
    "cla32_f64_bj", "cla32_f32_mcgs", "cla32_f64_l1j", "cla32_f64_mcgs",
]


def main():
    names = sys.argv[1:] or PHASES
    out = {}
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", name]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=600, cwd=ROOT)
            line = None
            for ln in reversed(r.stdout.strip().splitlines()):
                if ln.strip().startswith("{"):
                    line = json.loads(ln)
                    break
            out[name] = line or {"error": f"rc={r.returncode}",
                                 "stderr": r.stderr[-300:]}
        except subprocess.TimeoutExpired:
            out[name] = {"error": "timeout"}
        print(name, "->", json.dumps(out[name]), flush=True)
    print(json.dumps(out))



def _classical_fused(n_side, mode, smoother, dtype, max_iters=30):
    import jax
    if mode[1] == "D":
        jax.config.update("jax_enable_x64", True)
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=dtype)
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "AMG", "max_iters": max_iters, "tolerance": 1e-8,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": mode, "scope": "main",
        "algorithm": "CLASSICAL", "selector": "PMIS",
        "interpolator": "D2", "smoother": smoother,
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 64,
        "max_levels": 12, "cycle": "V",
        "dense_threshold_rows": 4096}})
    s = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s.setup(amgx.Matrix(a, mode=mode))
    setup_t = time.perf_counter() - t0
    b = np.ones(a.n_rows, dtype)
    t0 = time.perf_counter()
    x, status = s.solve(b)
    compile_solve_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, status = s.solve(b)
    solve_t = time.perf_counter() - t0
    h = [float(np.atleast_1d(v)[0]) for v in s.res_history]
    print(json.dumps({"ok": True, "setup_s": setup_t,
                      "first_solve_s": compile_solve_t,
                      "solve_s": solve_t,
                      "iters": s.last_iters, "status": status,
                      "rel": (h[-1] / h[0]) if h and h[0] else None}))


def phase_fused32_f32_mcgs():
    _classical_fused(32, "dFFI", "MULTICOLOR_GS", np.float32)


def phase_fused48_f32_mcgs():
    _classical_fused(48, "dFFI", "MULTICOLOR_GS", np.float32)


def phase_fused48_f64_mcgs():
    _classical_fused(48, "dDDI", "MULTICOLOR_GS", np.float64)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        globals()["phase_" + sys.argv[2]]()
    else:
        main()
