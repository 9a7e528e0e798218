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
        self.amg.setup(self.m)

    def resetup(self, m=None):
        if m is not None:
            self.m = m
            self.op = m.device_op(
                dense_threshold=self.cfg.get("dense_threshold_rows",
                                             self.scope))
        self.amg.resetup(self.m)
        # jit caches stay valid: the solve programs read all device state
        # from operand pytrees (Solver._device_state)

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
