"""NOSOLVER — identity solver (reference: core/src/solvers/dummy_solver.cu)."""

from __future__ import annotations

from .base import Solver, register_solver


@register_solver("NOSOLVER")
class DummySolver(Solver):
    """x = b: the identity preconditioner."""

    def solver_setup(self):
        pass

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        return b, None

    def as_preconditioner(self):
        return lambda r: r
