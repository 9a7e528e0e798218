"""Composable linear operators.

Replaces base/include/operators/operator.h:37-57 and core/src/operators/.
An operator is anything with ``apply(x)`` and ``shape``; EllMatrix /
DiaMatrix / DenseOperator satisfy the protocol natively.

All composed operators that wrap device matrices are registered as pytrees
so they can ride as jit *operands* (the fused eigensolver loops pass the
operator into one compiled ``lax.while_loop`` program instead of closure-
capturing multi-MB constants into the HLO — see eigensolvers/methods.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
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

    def tree_flatten(self):
        return (self.op,), (self.shift,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (op,) = children
        return cls(op, aux[0])


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


@jax.tree_util.register_pytree_node_class
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

    def tree_flatten(self):
        return (self.op, self.lam, self.v), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
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
        y = self.op_t.apply(self.inv_outdeg * x)
        mass = jnp.sum(x)
        if self.dangling is not None:
            mass_d = jnp.vdot(self.dangling, x)
        else:
            mass_d = 0.0
        total = x.shape[0]
        return (self.damping * (y + mass_d / total) +
                (1.0 - self.damping) * mass / total)

    def tree_flatten(self):
        has_d = self.dangling is not None
        kids = (self.op_t, self.inv_outdeg) + \
            ((self.dangling,) if has_d else ())
        return kids, (self.damping, has_d)

    @classmethod
    def tree_unflatten(cls, aux, children):
        damping, has_d = aux
        op_t, inv = children[0], children[1]
        dang = children[2] if has_d else None
        return cls(op_t, inv, damping, dang)
