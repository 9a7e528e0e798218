"""Template plugin (mirror of reference template_plugin/: the skeleton
showing how to add a solver through the factory system).

Use:  from amgx_tpu.plugins import load_plugin
      load_plugin("examples/template_plugin.py")
      cfg = amgx.AMGConfig("solver=TEMPLATE_SOLVER, ...")
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import jax.numpy as jnp

from amgx_tpu.config import register_parameter
from amgx_tpu.solvers.base import Solver, register_solver


@register_solver("TEMPLATE_SOLVER")
class TemplateSolver(Solver):
    """Richardson iteration x += omega (b - A x) — the simplest possible
    solver, as the reference's template plugin implements."""

    def solver_setup(self):
        self.omega = self.cfg.get("template_relaxation", self.scope)

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        return x + self.omega * (b - self.op.apply(x)), None


def initialize():
    """Called by the plugin loader (reference: plugin initialize())."""
    register_parameter("template_relaxation", float, 0.1,
                       "relaxation factor of the template solver")
