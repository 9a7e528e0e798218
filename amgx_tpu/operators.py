"""Composable linear operators.

Replaces base/include/operators/operator.h:37-57 and core/src/operators/.
An operator is anything with ``apply(x)`` and ``shape``; EllMatrix /
DiaMatrix / DenseOperator satisfy the protocol natively.
"""

from __future__ import annotations

import jax.numpy as jnp


class ShiftedOperator:
    """(A - shift I) x (reference: core/src/operators shifted_operator)."""

    def __init__(self, op, shift: float):
        self.op = op
        self.shift = shift
        self.shape = op.shape
        self.block_dim = getattr(op, "block_dim", (1, 1))
        self.dtype = op.dtype

    def apply(self, x):
        return self.op.apply(x) - self.shift * x


class SolverOperator:
    """M^{-1} A x — the preconditioned operator (reference:
    solver_operator)."""

    def __init__(self, op, solver):
        self.op = op
        self.solver = solver
        self.shape = op.shape
        self.block_dim = getattr(op, "block_dim", (1, 1))
        self.dtype = op.dtype

    def apply(self, x):
        y = self.op.apply(x)
        z = jnp.zeros_like(y)
        z, _ = self.solver.solve(y, z, zero_initial_guess=True)
        return z


class DeflatedMultiplyOperator:
    """A x - lambda (x . v) v for deflation in eigensolvers."""

    def __init__(self, op, lam, v):
        self.op = op
        self.lam = lam
        self.v = v
        self.shape = op.shape
        self.block_dim = getattr(op, "block_dim", (1, 1))
        self.dtype = op.dtype

    def apply(self, x):
        return self.op.apply(x) - self.lam * jnp.vdot(self.v, x) * self.v


class PagerankOperator:
    """Google-matrix apply: damping * D^{-1} A^T x + teleport
    (reference: core/src/operators pagerank used by eig 'pagerank')."""

    def __init__(self, op_t, inv_outdeg, damping: float = 0.85,
                 dangling=None):
        self.op_t = op_t            # transposed adjacency as device op
        self.inv_outdeg = inv_outdeg
        self.damping = damping
        self.dangling = dangling    # 0/1 mask of dangling nodes, or None
        self.shape = op_t.shape
        self.block_dim = (1, 1)
        self.dtype = op_t.dtype

    def apply(self, x):
        n = jnp.sum(self.inv_outdeg > 0) + jnp.sum(self.inv_outdeg == 0)
        y = self.op_t.apply(self.inv_outdeg * x)
        mass = jnp.sum(x)
        if self.dangling is not None:
            mass_d = jnp.vdot(self.dangling, x)
        else:
            mass_d = 0.0
        total = x.shape[0]
        return (self.damping * (y + mass_d / total) +
                (1.0 - self.damping) * mass / total)
