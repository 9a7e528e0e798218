"""TPU probe: fused eigensolver timings (VERDICT r3 item 2) and the f64
fused-classical bisect. Each phase in its own subprocess with a deadline."""
from __future__ import annotations
import json, os, subprocess, sys, time
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def phase_lanczos64():
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(64, 64, 64, dtype=np.float32)
    cfg = amgx.AMGConfig("eig_solver=LANCZOS, eig_max_iters=60, "
                         "eig_tolerance=1e-6, eig_which=largest")
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(a, mode="dFFI"))
    t0 = time.perf_counter()
    evals, _ = es.solve()          # includes compile
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    evals, _ = es.solve()          # warm
    t_warm = time.perf_counter() - t0
    n = 64
    exact = 12.0 * np.sin(n * np.pi / (2.0 * (n + 1))) ** 2
    print(json.dumps({"lam": evals[0], "exact": float(exact),
                      "rel_err": abs(evals[0] - exact) / exact,
                      "first_s": t_first, "warm_s": t_warm,
                      "iters": es.last_iters}))


def phase_pagerank():
    import amgx_tpu as amgx
    from amgx_tpu.matrix import CSRMatrix
    rng = np.random.default_rng(0)
    ng = 32768
    deg = 8
    rows = np.repeat(np.arange(ng), deg)
    cols = rng.integers(0, ng, size=ng * deg)
    g = CSRMatrix.from_coo(ng, ng, rows, cols, np.ones(ng * deg, np.float32))
    cfg = amgx.AMGConfig("eig_solver=SINGLE_ITERATION, eig_max_iters=200, "
                         "eig_tolerance=1e-8, eig_which=pagerank, "
                         "eig_damping_factor=0.85")
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(g, mode="dFFI"))
    es.pagerank_setup(amgx.Matrix(g, mode="dFFI"))
    t0 = time.perf_counter()
    es.solve()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    es.solve()
    t_warm = time.perf_counter() - t0
    print(json.dumps({"first_s": t_first, "warm_s": t_warm,
                      "iters": es.last_iters}))


def phase_lobpcg64():
    import amgx_tpu as amgx
    a = amgx.gallery.poisson7pt(64, 64, 64, dtype=np.float32)
    cfg = amgx.AMGConfig("eig_solver=LOBPCG, eig_max_iters=100, "
                         "eig_tolerance=1e-6, eig_which=largest")
    es = amgx.EigenSolverFactory.allocate(cfg)
    es.setup(amgx.Matrix(a, mode="dFFI"))
    t0 = time.perf_counter()
    evals, _ = es.solve()
    t_first = time.perf_counter() - t0
    n = 64
    exact = 12.0 * np.sin(n * np.pi / (2.0 * (n + 1))) ** 2
    print(json.dumps({"lam": evals[0], "exact": float(exact),
                      "rel_err": abs(evals[0] - exact) / exact,
                      "first_s": t_first, "iters": es.last_iters}))


def _fused_cla(n_side, mode, dtype, max_iters=10):
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
        "interpolator": "D2", "smoother": "MULTICOLOR_GS",
        "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 64,
        "max_levels": 12, "cycle": "V", "dense_threshold_rows": 4096}})
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a, mode=mode))
    b = np.ones(a.n_rows, dtype)
    t0 = time.perf_counter()
    x, status = s.solve(b)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, status = s.solve(b)
    print(json.dumps({"first_s": t_first,
                      "warm_s": time.perf_counter() - t0,
                      "iters": s.last_iters, "status": status}))


def phase_fused16_f64():
    _fused_cla(16, "dDDI", np.float64)


def phase_fused32_f64():
    _fused_cla(32, "dDDI", np.float64)


PHASES = ["lanczos64", "pagerank", "lobpcg64", "fused16_f64",
          "fused32_f64"]


def main():
    names = sys.argv[1:] or PHASES
    out = {}
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", name]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=900, cwd=ROOT)
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


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        globals()["phase_" + sys.argv[2]]()
    else:
        main()
