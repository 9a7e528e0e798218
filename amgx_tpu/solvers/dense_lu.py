"""DENSE_LU_SOLVER — exact dense solve for small (coarse) systems.

Reference: core/src/solvers/dense_lu_solver.cu:580-763 (CSR -> dense,
cuSOLVER getrf/getrs). TPU version: CSR -> padded dense, LU-factorized with
jax.scipy at setup; solve is one pair of triangular solves — ideal MXU work.
Padding rows carry an identity diagonal so the factorization stays
non-singular and padded rhs entries (always zero) map to zero.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import Solver, register_solver
from ..matrix import mode_dtypes


@register_solver("DENSE_LU_SOLVER")
class DenseLUSolver(Solver):

    def solver_setup(self):
        vec_dt, _ = mode_dtypes(self.mode)
        csr = self.m.csr if self.m is not None else None
        if csr is None:
            raise ValueError("DENSE_LU_SOLVER needs a host CSR matrix")
        bx, _ = csr.block_dim
        host_dt = np.complex128 if np.issubdtype(
            csr.data.dtype, np.complexfloating) else np.float64
        dense = csr.to_dense().astype(host_dt)
        n = dense.shape[0]
        n_pad = self.vec_len
        full = np.eye(n_pad, dtype=host_dt)
        full[:n, :n] = dense
        # factorize in f64 on host for robustness, store factors in vec dtype
        import scipy.linalg as sla
        lu, piv = sla.lu_factor(full)
        self._lu, self._piv = jax.device_put(
            (lu.astype(vec_dt), piv.astype(np.int32)))

    @property
    def n_pad(self):
        # vector length equals the padded dense dimension
        op = self.op
        return getattr(op, "n_pad", None) or op.a.shape[0] // \
            self.block_dim[0]

    def solve_init(self, b, x, zero_guess):
        return None

    def solve_iteration(self, b, x, s):
        x = jax.scipy.linalg.lu_solve((self._lu, self._piv), b)
        return x, None

    def as_preconditioner(self):
        def apply(r):
            return jax.scipy.linalg.lu_solve((self._lu, self._piv), r)
        return apply
