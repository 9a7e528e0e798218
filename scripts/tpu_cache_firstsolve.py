"""Cold vs cached first-solve for the classical 48^3 flagship
(VERDICT r4 item 3: 322 s cold, target <=60 s cold / <=5 s second
process with the persistent compile cache)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import amgx_tpu as amgx                                    # noqa: E402
from amgx_tpu.refinement import RefinedSolver              # noqa: E402
import jax                                                 # noqa: E402

jax.config.update("jax_enable_x64", True)
n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 48

a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float64)
b = np.ones(a.n_rows)
cfg = amgx.AMGConfig({"config_version": 2, "solver": {
    "solver": "AMG", "max_iters": 20, "tolerance": 1e-6,
    "convergence": "RELATIVE_INI", "monitor_residual": 1,
    "fused_solve": 1, "mode": "dFFI", "scope": "main",
    "algorithm": "CLASSICAL", "selector": "PMIS",
    "interpolator": "D2", "smoother": "MULTICOLOR_GS",
    "presweeps": 1, "postsweeps": 1, "min_coarse_rows": 64,
    "max_levels": 12, "cycle": "V", "dense_threshold_rows": 4096}})
rs = RefinedSolver(cfg, inner_mode="dFFI")
t0 = time.perf_counter()
rs.setup(a)
setup_t = time.perf_counter() - t0
t0 = time.perf_counter()
x, status, hist = rs.solve(b, max_refinements=12, tolerance=1e-8)
first_t = time.perf_counter() - t0
t0 = time.perf_counter()
x, status, hist = rs.solve(b, max_refinements=12, tolerance=1e-8)
warm_t = time.perf_counter() - t0
true_r = float(np.linalg.norm(b - a.to_scipy() @ x) / np.linalg.norm(b))
print(f"setup_s={setup_t:.2f} first_solve_s={first_t:.2f} "
      f"warm_solve_s={warm_t:.2f} true_rel_resid={true_r:.2e} "
      f"status={status}")
