"""IDR(s) solvers (reference: core/src/solvers/idr_solver.cu and
idrmsync_solver.cu). Induced Dimension Reduction with shadow space dimension
``subspace_dim_s``; IDRMSYNC is the merged-synchronization variant — on TPU
both reduce to the same fused XLA program, so it aliases IDR.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import register_solver
from .krylov import _PreconditionedSolver


@register_solver("IDR")
class IDRSolver(_PreconditionedSolver):
    """IDR(s) with bi-orthogonalization (van Gijzen & Sonneveld)."""

    def __init__(self, cfg, scope="default"):
        super().__init__(cfg, scope)
        self.s = int(cfg.get("subspace_dim_s", scope))

    def solver_setup(self):
        super().solver_setup()
        rng = np.random.default_rng(42)
        n = self.vec_len
        P = rng.standard_normal((self.s, n))
        # orthonormalize the shadow space
        q, _ = np.linalg.qr(P.T)
        self._P = jnp.asarray(q.T)           # (s, n)

    def solve_init(self, b, x, zero_guess):
        r = b if zero_guess else b - self.op.apply(x)
        n = r.shape[0]
        s = self.s
        return {"r": r,
                "G": jnp.zeros((s, n), r.dtype),
                "U": jnp.zeros((s, n), r.dtype),
                "M": jnp.eye(s, dtype=r.dtype),
                "om": jnp.asarray(1.0, r.dtype)}

    def solve_iteration(self, b, x, st):
        """One IDR(s) cycle: s intermediate steps + one (I - om A) step.
        The shadow-space index k is a static Python loop variable, so all
        triangular subsolves use static slices and the cycle traces into one
        XLA program."""
        import jax.scipy.linalg as jsla
        A, Mpre = self.op, self.precond()
        P = self._P.astype(x.dtype)
        r, G, U, M, om = st["r"], st["G"], st["U"], st["M"], st["om"]
        s = self.s
        f = P @ r                                    # (s,)
        for k in range(s):
            c = jsla.solve_triangular(M[k:, k:], f[k:], lower=True)
            v = r - c @ G[k:]
            v = Mpre(v)
            u = c @ U[k:] + om * v
            g = A.apply(u)
            # bi-orthogonalize (g, u) against the first k shadow directions
            for j in range(k):
                alpha = jnp.vdot(P[j], g) / M[j, j]
                g = g - alpha * G[j]
                u = u - alpha * U[j]
            G = G.at[k].set(g)
            U = U.at[k].set(u)
            M = M.at[k:, k].set(P[k:] @ g)
            beta = f[k] / M[k, k]
            r = r - beta * g
            x = x + beta * u
            if k + 1 < s:
                f = f.at[k + 1:].add(-beta * M[k + 1:, k])
        # (I - om A) step into the next Sonneveld space
        v = Mpre(r)
        t = A.apply(v)
        om = jnp.vdot(t, r) / jnp.vdot(t, t)
        x = x + om * v
        r = r - om * t
        return x, {"r": r, "G": G, "U": U, "M": M, "om": om}


@register_solver("IDRMSYNC")
class IDRMSyncSolver(IDRSolver):
    """Merged-synchronization IDR(s) (idrmsync_solver.cu) — algebraically the
    same iteration; the synchronization merging is a GPU latency optimization
    that XLA fusion subsumes."""
