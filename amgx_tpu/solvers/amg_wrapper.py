"""AMG as a Solver (registry name "AMG").

Reference: AlgebraicMultigrid_Solver (base/include/solvers/
algebraic_multigrid_solver.h:37-105): wraps the AMG hierarchy; one
solve_iteration = one multigrid cycle.
"""

from __future__ import annotations

from .base import Solver, register_solver
from ..amg.hierarchy import AMG
from ..amg.cycles import cycle


@register_solver("AMG")
class AMGSolver(Solver):

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.amg = AMG(cfg, scope)

    def solver_setup(self):
        if self.m is None:
            raise ValueError("AMG needs a Matrix handle (host CSR)")
        # resetup flows through the base Solver.resetup plumbing (fine-
        # level reordering, scalers, coloring) and only the hierarchy
        # build switches to the structure-reuse path
        if getattr(self, "_resetup_child", False) and self.amg.levels:
            self.amg.resetup(self.m)
        else:
            self.amg.setup(self.m)

    def solve_init(self, b, x, zero_guess):
        return None

    def first_iteration(self, b, x, s, zero_guess):
        x = cycle(self.amg, 0, b, x, zero_guess=zero_guess)
        return x, None

    def solve_iteration(self, b, x, s):
        x = cycle(self.amg, 0, b, x, zero_guess=False)
        return x, None

    def grid_stats_string(self):
        return self.amg.grid_stats_string()
