"""KACZMARZ smoother (reference: core/src/solvers/kaczmarz_solver.cu).

Row-projection iteration x += a_i (b_i - a_i.x)/||a_i||^2. With a proper
coloring, all rows of one color project simultaneously (multicolor Kaczmarz,
kaczmarz_coloring_needed=1); without coloring a damped simultaneous
projection (Cimmino-style) is used. Projections apply through A^T, stored as
a second ELL operator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Solver, register_solver
from ..matrix import csr_to_ell, mode_dtypes


@register_solver("KACZMARZ")
class KaczmarzSolver(Solver):

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.use_coloring = bool(cfg.get("kaczmarz_coloring_needed", scope))

    # builds its own distance-2 coloring in solver_setup
    needs_coloring = False

    def solver_setup(self):
        csr = self.m.csr
        if csr.block_dim != (1, 1):
            # block systems: expand to the scalar view (row projections act
            # on scalar equations; block vectors are already interleaved so
            # the expansion matches the vector layout exactly)
            from ..matrix import CSRMatrix
            csr = CSRMatrix.from_scipy(csr.to_scipy())
        self._scalar_csr = csr
        vec_dt, _ = mode_dtypes(self.mode)
        self.at = csr_to_ell(csr.transpose(), dtype=vec_dt,
                             row_pad=self.vec_len)
        rownorm = np.zeros(self.vec_len)
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        np.add.at(rownorm, rows, np.abs(csr.data) ** 2)
        safe = np.where(rownorm == 0, 1.0, rownorm)
        inv_rn_np = (1.0 / safe).astype(vec_dt)
        # Kaczmarz projections of one color are exactly simultaneous only if
        # same-color rows touch disjoint columns -> distance-2 coloring
        # (reference kaczmarz_solver.cu colors A A^T)
        self.damping = 1.0
        if self.use_coloring:
            from ..coloring import color_matrix
            coloring = color_matrix(csr, "MIN_MAX_2RING")
            col = np.full(self.vec_len, -1, np.int32)
            col[:csr.n_rows] = coloring.colors
            # one batched put (eager transfers cost a tunnel round trip)
            self.inv_rownorm, self.color = jax.device_put(
                (inv_rn_np, col))
            self.num_colors = coloring.num_colors
        else:
            # Cimmino-style simultaneous projections need damping by the
            # maximum column overlap to stay contractive
            self.damping = 1.0 / max(1, int(csr.row_nnz().max()))
            self.inv_rownorm = jax.device_put(inv_rn_np)

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        omega = self.relaxation_factor
        if self.use_coloring:
            for c in range(self.num_colors):
                r = b - self.op.apply(x)
                delta = jnp.where(self.color == c, r * self.inv_rownorm, 0.0)
                x = x + omega * self.at.apply(delta)
        else:
            r = b - self.op.apply(x)
            x = x + omega * self.damping * self.at.apply(
                r * self.inv_rownorm)
        return x, None
