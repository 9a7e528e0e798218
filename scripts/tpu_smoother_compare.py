"""Chip bench: amg_pcg flagship at 48^3 with different AMG smoothers
(VERDICT r4 weak #2: the TWO_STAGE_GS iteration win was never chip-
measured). Prints iters + warm solve seconds per config."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax                                                  # noqa: E402
import amgx_tpu as amgx                                     # noqa: E402

n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 48
a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
b = np.ones(a.n_rows, np.float32)


def run(smoother, extra=None):
    pre = {"solver": "AMG", "scope": "amg",
           "dense_threshold_rows": 4096,
           "algorithm": "AGGREGATION", "selector": "SIZE_8",
           "smoother": smoother, "relaxation_factor": 0.7,
           "presweeps": 1, "postsweeps": 1, "max_iters": 1,
           "min_coarse_rows": 64, "max_levels": 12, "cycle": "V"}
    pre.update(extra or {})
    cfg = amgx.AMGConfig({"config_version": 2, "solver": {
        "solver": "PCG", "max_iters": 100, "tolerance": 1e-6,
        "convergence": "RELATIVE_INI", "monitor_residual": 1,
        "fused_solve": 1, "mode": "dFFI", "scope": "main",
        "preconditioner": pre}})
    s = amgx.SolverFactory.allocate(cfg)
    t0 = time.perf_counter()
    s.setup(amgx.Matrix(a, mode="dFFI"))
    setup_t = time.perf_counter() - t0
    s.solve(b)
    t0 = time.perf_counter()
    x, st = s.solve(b)
    dt = time.perf_counter() - t0
    xv = s.extract_vector(x)
    rel = np.linalg.norm(b - a.to_scipy() @ xv) / np.linalg.norm(b)
    print(f"{smoother:22s} iters={s.last_iters:3d} solve={dt*1e3:7.1f} ms "
          f"({dt/max(1,s.last_iters)*1e3:5.2f} ms/it) setup={setup_t:5.2f} s "
          f"rel={rel:.1e} status={st}")


run("BLOCK_JACOBI")
run("TWO_STAGE_GS")
run("CHEBYSHEV", {"chebyshev_polynomial_order": 4})
run("MULTICOLOR_GS")
run("MULTICOLOR_DILU")
