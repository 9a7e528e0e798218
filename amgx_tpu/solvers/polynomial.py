"""Polynomial smoothers: POLYNOMIAL and KPZ_POLYNOMIAL.

Reference: core/src/solvers/polynomial_solver.cu (smoothed-operator
polynomial) and kpz_polynomial_solver.cu (Kaczmarz-polynomial, KPZ). Both are
SpMV+axpy-only smoothers — ideal TPU citizens. POLYNOMIAL applies a fixed
Neumann-type polynomial in the symmetrically scaled operator
S = D^{-1/2} A D^{-1/2}; KPZ applies the same polynomial through A A^T row
projections.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Solver, register_solver
from ..matrix import csr_to_ell, mode_dtypes


@register_solver("POLYNOMIAL")
class PolynomialSolver(Solver):

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.order = max(1, int(cfg.get("chebyshev_polynomial_order", scope)))

    def solver_setup(self):
        vec_dt, _ = mode_dtypes(self.mode)
        csr = self.m.csr
        d = np.ones(self.n_pad)
        diag = np.abs(csr.diagonal().astype(np.float64))
        if diag.ndim > 1:          # block diagonal: use frobenius norms
            diag = np.sqrt((diag ** 2).sum(axis=(1, 2)))
            diag = np.repeat(diag, csr.block_dim[0])
            d = np.ones(self.vec_len)
        d[:diag.shape[0]] = np.where(diag == 0, 1.0, diag)
        self.inv_sqrt_d = jnp.asarray((1.0 / np.sqrt(d)).astype(vec_dt))

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        """x += D^{-1/2} p(S) D^{-1/2} r with p a damped Neumann series."""
        isd = self.inv_sqrt_d
        r = b - self.op.apply(x)
        rt = isd * r
        acc = rt
        term = rt
        omega = self.relaxation_factor
        for _ in range(self.order):
            term = term - omega * isd * self.op.apply(isd * term)
            acc = acc + term
        x = x + omega * isd * acc
        return x, None


@register_solver("KPZ_POLYNOMIAL")
class KPZPolynomialSolver(Solver):
    """Kaczmarz-polynomial smoother: the POLYNOMIAL recursion applied to the
    normal-equations operator A^T R^{-1} A (R = row norms), keeping symmetric
    positive semidefiniteness for arbitrary A (kpz_polynomial_solver.cu)."""

    is_smoother = True

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.order = max(1, int(cfg.get("chebyshev_polynomial_order", scope)))

    def solver_setup(self):
        csr = self.m.csr
        if csr.block_dim != (1, 1):
            # block systems run through the scalar expansion (interleaved
            # block vectors match the scalar row layout exactly)
            from ..matrix import CSRMatrix
            csr = CSRMatrix.from_scipy(self.m.csr.to_scipy())
        vec_dt, _ = mode_dtypes(self.mode)
        self.at = csr_to_ell(csr.transpose(), dtype=vec_dt,
                             row_pad=self.vec_len)
        rownorm = np.zeros(self.vec_len)
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        np.add.at(rownorm, rows, np.abs(csr.data) ** 2)
        self.inv_rownorm = jnp.asarray(
            (1.0 / np.where(rownorm == 0, 1.0, rownorm)).astype(vec_dt))
        self._max_row_fanout = max(1, int(csr.row_nnz().max()))

    def solve_init(self, b, x, zero_guess):
        return None

    def solver_damping(self):
        # contraction bound for the normal-equations iteration: damp by the
        # maximum row fanout so ||I - w A^T R^{-1} A|| < 1
        return 1.0 / self._max_row_fanout

    def solve_iteration(self, b, x, s):
        omega = self.relaxation_factor * self.solver_damping()
        z = jnp.zeros_like(x)
        r = b - self.op.apply(x)
        term = r
        for _ in range(self.order):
            z = z + omega * self.at.apply(term * self.inv_rownorm)
            term = r - self.op.apply(z)
        x = x + z
        return x, None
