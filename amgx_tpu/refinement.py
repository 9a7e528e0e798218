"""Mixed-precision iterative refinement.

SURVEY.md §7.3: f64 throughput on TPU is weak, so the first-class
mixed-precision pattern is an f32 (or bf16) inner solve wrapped in f64
residual refinement — the TPU equivalent of running the reference in dDFI
and polishing. The inner solver is any configured solver tree.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .config import AMGConfig
from .matrix import CSRMatrix, Matrix
from .solvers import SolverFactory, SolveStatus


def solve_refined(cfg: AMGConfig, a: CSRMatrix, b: np.ndarray,
                  max_refinements: int = 20, tolerance: float = 1e-12,
                  inner_mode: str = "dFFI"
                  ) -> Tuple[np.ndarray, int, list]:
    """Solve A x = b to f64 accuracy with an ``inner_mode`` inner solver.

    Returns (x, status, residual_history). The inner solver's own tolerance
    applies per correction solve; refinement iterates
        r = b - A x  (f64, host)  ->  solve A d = r (low precision)
        x += d
    until ||r|| <= tolerance * ||b||.
    """
    cfg = cfg.clone()
    cfg.set("mode", inner_mode)
    inner = SolverFactory.allocate(cfg)
    inner.setup(Matrix(a, mode=inner_mode))
    a64 = a.to_scipy().astype(np.float64)
    b = np.asarray(b, np.float64)
    x = np.zeros_like(b)
    nb = np.linalg.norm(b)
    history = []
    status = SolveStatus.NOT_CONVERGED
    for k in range(max_refinements):
        r = b - a64 @ x
        nr = float(np.linalg.norm(r))
        history.append(nr)
        if nr <= tolerance * nb:
            status = SolveStatus.SUCCESS
            break
        d, _ = inner.solve(r, zero_initial_guess=True)
        x = x + np.asarray(inner.extract_vector(d), np.float64)
    else:
        r = b - a64 @ x
        history.append(float(np.linalg.norm(r)))
        if history[-1] <= tolerance * nb:
            status = SolveStatus.SUCCESS
    return x, status, history
