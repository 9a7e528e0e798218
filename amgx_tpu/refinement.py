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


class RefinedSolver:
    """Reusable mixed-precision refinement solver (setup once, solve
    many — the reference's time-stepping contract, amg_solver.cu
    setup/resetup/solve). Keeping one instance alive keeps the inner
    solver's compiled programs warm: a fresh allocation per solve would
    pay the full jit compile each time."""

    def __init__(self, cfg: AMGConfig, inner_mode: str = "dFFI"):
        cfg = cfg.clone()
        cfg.set("mode", inner_mode)
        self.cfg = cfg
        self.inner_mode = inner_mode
        self.inner = None
        self._a64 = None

    def setup(self, a: CSRMatrix) -> None:
        self.inner = SolverFactory.allocate(self.cfg)
        self.inner.setup(Matrix(a, mode=self.inner_mode))
        self._a64 = a.to_scipy().astype(np.float64)

    def resetup(self, data: np.ndarray, diag_data=None) -> None:
        """Time-stepping: same sparsity, new values. Rides the inner
        solver's structure-reuse resetup (configure
        structure_reuse_levels) and the device value-update path, and
        refreshes the f64 residual operator (reference:
        AMGX_matrix_replace_coefficients + AMGX_solver_resetup)."""
        m = getattr(self.inner, "_m_user", None) or self.inner.m
        m.replace_coefficients(data, diag_data)
        self.inner.resetup()
        self._a64 = m.csr.to_scipy().astype(np.float64)

    def solve(self, b: np.ndarray, max_refinements: int = 20,
              tolerance: float = 1e-12
              ) -> Tuple[np.ndarray, int, list]:
        """Refine to f64 accuracy:
            r = b - A x  (f64, host)  ->  solve A d = r (low precision)
            x += d
        until ||r|| <= tolerance * ||b||. Returns (x, status, history)."""
        a64 = self._a64
        b = np.asarray(b, np.float64)
        x = np.zeros_like(b)
        nb = np.linalg.norm(b)
        history = []
        status = SolveStatus.NOT_CONVERGED
        for _ in range(max_refinements):
            r = b - a64 @ x
            nr = float(np.linalg.norm(r))
            history.append(nr)
            if nr <= tolerance * nb:
                status = SolveStatus.SUCCESS
                break
            d, _ = self.inner.solve(r, zero_initial_guess=True)
            x = x + np.asarray(self.inner.extract_vector(d), np.float64)
        else:
            r = b - a64 @ x
            history.append(float(np.linalg.norm(r)))
            if history[-1] <= tolerance * nb:
                status = SolveStatus.SUCCESS
        return x, status, history


def solve_refined(cfg: AMGConfig, a: CSRMatrix, b: np.ndarray,
                  max_refinements: int = 20, tolerance: float = 1e-12,
                  inner_mode: str = "dFFI"
                  ) -> Tuple[np.ndarray, int, list]:
    """One-shot convenience wrapper around :class:`RefinedSolver`."""
    s = RefinedSolver(cfg, inner_mode)
    s.setup(a)
    return s.solve(b, max_refinements, tolerance)
