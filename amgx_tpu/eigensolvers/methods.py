"""Eigensolver methods: SINGLE_ITERATION (power / inverse-power / PageRank),
LANCZOS, ARNOLDI, SUBSPACE_ITERATION, LOBPCG, JACOBI_DAVIDSON.

References: core/src/eigensolvers/{single_iteration,lanczos,arnoldi,
subspace_iteration,lobpcg,jacobi_davidson}_eigensolver.cu and the shared
multivector + QR helpers (qr.cu). The reference offloads small dense
eigenproblems to LAPACK/MAGMA (base/src/amgx_lapack.cu); here numpy.linalg
plays that role — the Ritz problems are metadata-sized.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import EigenSolver, register_eigensolver
from ..solvers.base import SolverFactory


def _normalize(v):
    n = jnp.sqrt(jnp.vdot(v, v))
    return v / jnp.where(n == 0, 1.0, n), n


@register_eigensolver("SINGLE_ITERATION")
class SingleIterationEigenSolver(EigenSolver):
    """Power iteration on A (largest / pagerank) or inverse iteration through
    a configured linear solver (smallest)
    (single_iteration_eigensolver.cu)."""

    def solver_setup(self):
        self.inner = None
        if self.which == "smallest":
            self.inner = SolverFactory.allocate(self.cfg, self.scope,
                                                "solver")
            self.inner.setup(self.m if self.m is not None else self.op)

    def _apply(self, v):
        if self.which == "smallest":
            x, _ = self.inner.solve(v, zero_initial_guess=True)
            return x
        return self.op.apply(v)

    def solve_init(self, x):
        v, _ = _normalize(x)
        return {"v": v, "lam": jnp.asarray(0.0, x.dtype),
                "resid": jnp.asarray(np.inf, x.dtype)}

    def solve_iteration(self, s):
        v = s["v"]
        w = self._apply(v)
        lam = jnp.vdot(v, w)
        resid = jnp.sqrt(jnp.vdot(w - lam * v, w - lam * v)) / \
            jnp.maximum(jnp.abs(lam), 1e-300)
        v_new, _ = _normalize(w)
        return {"v": v_new, "lam": lam, "resid": resid}

    def finalize(self, state):
        lam = float(np.asarray(state["lam"]))
        if self.which == "smallest":
            lam = 1.0 / lam if lam != 0 else 0.0
        if self.which == "shift":
            lam = lam + self.shift
        self.eigenvalues = [lam]
        v = np.asarray(state["v"])[: self._logical_len()]
        self.eigenvectors = v[None, :]


@register_eigensolver("LANCZOS")
class LanczosEigenSolver(EigenSolver):
    """Lanczos tridiagonalization with full storage of the Krylov basis and
    a host-side tridiagonal Ritz solve (lanczos_eigensolver.cu)."""

    def solve_init(self, x):
        v, _ = _normalize(x)
        m = self.krylov_dim
        n = v.shape[0]
        V = jnp.zeros((m + 1, n), v.dtype).at[0].set(v)
        return {"V": V, "alpha": np.zeros(m), "beta": np.zeros(m),
                "j": 0, "lam": jnp.asarray(0.0, v.dtype),
                "resid": jnp.asarray(np.inf), "v": v}

    def solve_iteration(self, s):
        m = self.krylov_dim
        V, alpha, beta, j = s["V"], s["alpha"], s["beta"], s["j"]
        if j >= m:            # restart from best Ritz vector
            s = self._ritz(s)
            v = s["v"]
            V = jnp.zeros_like(V).at[0].set(v)
            alpha, beta, j = np.zeros(m), np.zeros(m), 0
        vj = V[j]
        w = self.op.apply(vj)
        a = float(jnp.vdot(vj, w))
        w = w - a * vj
        if j > 0:
            w = w - beta[j - 1] * V[j - 1]
        # full reorthogonalization (reference reorthogonalizes optionally)
        coef = V[:j + 1] @ w
        w = w - coef @ V[:j + 1]
        b = float(jnp.sqrt(jnp.vdot(w, w)))
        alpha[j] = a + float(coef[j])
        beta[j] = b
        V = V.at[j + 1].set(w / (b if b != 0 else 1.0))
        out = {"V": V, "alpha": alpha, "beta": beta, "j": j + 1,
               "lam": s["lam"], "resid": s["resid"], "v": s["v"]}
        if j + 1 >= min(m, 2):
            out = self._ritz(out)
        return out

    def _ritz(self, s):
        j = s["j"]
        alpha, beta = s["alpha"][:j], s["beta"][:max(0, j - 1)]
        if j == 0:
            return s
        T = np.diag(alpha) + np.diag(beta, 1) + np.diag(beta, -1)
        evals, evecs = np.linalg.eigh(T)
        pick = -1 if self.which in ("largest", "pagerank", "shift") else 0
        lam = evals[pick]
        y = evecs[:, pick]
        v = y @ s["V"][:j]
        v, _ = _normalize(v)
        resid = abs(float(s["beta"][j - 1] * y[-1])) / max(abs(lam), 1e-300)
        return {**s, "lam": jnp.asarray(lam), "v": v,
                "resid": jnp.asarray(resid)}

    def finalize(self, state):
        state = self._ritz(state)
        lam = float(np.asarray(state["lam"]))
        if self.which == "shift":
            lam += self.shift
        self.eigenvalues = [lam]
        self.eigenvectors = np.asarray(state["v"])[None,
                                                   : self._logical_len()]


@register_eigensolver("ARNOLDI")
class ArnoldiEigenSolver(EigenSolver):
    """Arnoldi iteration for non-symmetric operators
    (arnoldi_eigensolver.cu)."""

    def solve_init(self, x):
        v, _ = _normalize(x)
        m = self.krylov_dim
        V = jnp.zeros((m + 1, v.shape[0]), v.dtype).at[0].set(v)
        return {"V": V, "H": np.zeros((m + 1, m)), "j": 0,
                "lam": jnp.asarray(0.0), "resid": jnp.asarray(np.inf),
                "v": v}

    def solve_iteration(self, s):
        m = self.krylov_dim
        V, H, j = s["V"], s["H"], s["j"]
        if j >= m:
            s = self._ritz(s)
            v = s["v"]
            V = jnp.zeros_like(V).at[0].set(v)
            H, j = np.zeros((m + 1, m)), 0
        w = self.op.apply(V[j])
        h = np.asarray(V[:j + 1] @ w)
        w = w - jnp.asarray(h) @ V[:j + 1]
        hn = float(jnp.sqrt(jnp.vdot(w, w)))
        H[:j + 1, j] = h
        H[j + 1, j] = hn
        V = V.at[j + 1].set(w / (hn if hn != 0 else 1.0))
        out = {"V": V, "H": H, "j": j + 1, "lam": s["lam"],
               "resid": s["resid"], "v": s["v"]}
        if j + 1 >= min(m, 2):
            out = self._ritz(out)
        return out

    def _ritz(self, s):
        j = s["j"]
        if j == 0:
            return s
        Hj = s["H"][:j, :j]
        evals, evecs = np.linalg.eig(Hj)
        if self.which in ("largest", "pagerank", "shift"):
            pick = int(np.argmax(np.abs(evals)))
        else:
            pick = int(np.argmin(np.abs(evals)))
        lam = evals[pick]
        y = evecs[:, pick]
        v = jnp.asarray(np.real(y)) @ s["V"][:j]
        v, _ = _normalize(v)
        resid = abs(s["H"][j, j - 1] * y[-1]) / max(abs(lam), 1e-300)
        return {**s, "lam": jnp.asarray(np.real(lam)), "v": v,
                "resid": jnp.asarray(float(np.real(resid)))}

    finalize = LanczosEigenSolver.finalize
    _finalize_shift = True


@register_eigensolver("SUBSPACE_ITERATION")
class SubspaceIterationEigenSolver(EigenSolver):
    """Block power iteration with QR re-orthonormalization and a projected
    Ritz solve (subspace_iteration_eigensolver.cu + qr.cu)."""

    def solve_init(self, x):
        k = max(self.wanted, 1)
        pad = min(k + 2, max(k, 2))
        rng = np.random.default_rng(11)
        n = x.shape[0]
        X = rng.standard_normal((n, pad))
        X[:, 0] = np.asarray(x)
        X[self._logical_len():, :] = 0.0
        Q, _ = np.linalg.qr(X)
        return {"Q": jnp.asarray(Q.astype(np.asarray(x).dtype)),
                "lam": jnp.asarray(0.0), "resid": jnp.asarray(np.inf),
                "v": x, "evals": np.zeros(pad)}

    def solve_iteration(self, s):
        Q = s["Q"]
        # block apply: one operator application per column
        cols = [self.op.apply(Q[:, i]) for i in range(Q.shape[1])]
        Y = jnp.stack(cols, axis=1)
        B = np.asarray(Q.T @ Y)              # Ritz projection
        evals, evecs = np.linalg.eig(B)
        order = np.argsort(-np.abs(evals))
        evals, evecs = np.real(evals[order]), np.real(evecs[:, order])
        Ynp = np.asarray(Y)
        Qn, _ = np.linalg.qr(Ynp @ evecs)
        lam = evals[0]
        v = Q @ jnp.asarray(evecs[:, 0])
        v, _ = _normalize(v)
        w = self.op.apply(v)
        resid = float(jnp.sqrt(jnp.vdot(w - lam * v, w - lam * v))) / \
            max(abs(lam), 1e-300)
        return {"Q": jnp.asarray(Qn), "lam": jnp.asarray(lam),
                "resid": jnp.asarray(resid), "v": v, "evals": evals}

    def finalize(self, state):
        k = max(self.wanted, 1)
        evals = state["evals"][:k]
        if self.which == "shift":
            evals = evals + self.shift
        self.eigenvalues = [float(e) for e in np.atleast_1d(evals)]
        Q = np.asarray(state["Q"])[: self._logical_len(), :k]
        self.eigenvectors = Q.T


@register_eigensolver("LOBPCG")
class LOBPCGEigenSolver(EigenSolver):
    """Locally optimal block preconditioned CG (lobpcg_eigensolver.cu);
    the (optional) preconditioner comes from the 'solver' scope like the
    reference's inner solver."""

    def solver_setup(self):
        self.precond = None
        name, _ = self.cfg.get_pair("preconditioner", self.scope)
        if name and name != "NOSOLVER":
            self.precond = SolverFactory.allocate(self.cfg, self.scope,
                                                  "preconditioner")
            self.precond.setup(self.m if self.m is not None else self.op)

    def solve_init(self, x):
        v, _ = _normalize(x)
        return {"v": v, "p": jnp.zeros_like(v),
                "lam": jnp.asarray(0.0), "resid": jnp.asarray(np.inf)}

    def solve_iteration(self, s):
        A = self.op
        v, p = s["v"], s["p"]
        Av = A.apply(v)
        lam = jnp.vdot(v, Av)
        r = Av - lam * v
        resid = jnp.sqrt(jnp.vdot(r, r)) / jnp.maximum(jnp.abs(lam), 1e-300)
        if self.precond is not None:
            r = self.precond.as_preconditioner()(r)
        # Rayleigh-Ritz on span{v, r, p} (3x3 host eig)
        basis = [v, r]
        if float(jnp.vdot(p, p)) > 0:
            basis.append(p)
        B = []
        for u in basis:
            u, _ = _normalize(u)
            for w in B:
                u = u - jnp.vdot(w, u) * w
            nu = jnp.sqrt(jnp.vdot(u, u))
            if float(nu) > 1e-12:
                B.append(u / nu)
        k = len(B)
        G = np.zeros((k, k))
        AB = [A.apply(u) for u in B]
        for i in range(k):
            for j in range(k):
                G[i, j] = float(jnp.vdot(B[i], AB[j]))
        evals, evecs = np.linalg.eigh(0.5 * (G + G.T))
        pick = -1 if self.which in ("largest", "shift", "pagerank") else 0
        y = evecs[:, pick]
        v_new = sum(float(y[i]) * B[i] for i in range(k))
        v_new, _ = _normalize(v_new)
        p_new = v_new - float(np.dot(y, [float(jnp.vdot(B[i], v))
                                         for i in range(k)])) * v
        return {"v": v_new, "p": p_new,
                "lam": jnp.asarray(evals[pick]), "resid": resid}

    def finalize(self, state):
        lam = float(np.asarray(state["lam"]))
        if self.which == "shift":
            lam += self.shift
        self.eigenvalues = [lam]
        self.eigenvectors = np.asarray(state["v"])[None,
                                                   : self._logical_len()]


@register_eigensolver("JACOBI_DAVIDSON")
class JacobiDavidsonEigenSolver(EigenSolver):
    """Jacobi-Davidson with an (approximately solved) correction equation
    (jacobi_davidson_eigensolver.cu). The correction solve uses diagonal
    preconditioning of (A - theta I)."""

    def solve_init(self, x):
        v, _ = _normalize(x)
        return {"V": [v], "lam": jnp.asarray(0.0),
                "resid": jnp.asarray(np.inf), "v": v}

    def solve_iteration(self, s):
        A = self.op
        V = s["V"]
        k = len(V)
        G = np.zeros((k, k))
        AV = [A.apply(u) for u in V]
        for i in range(k):
            for j in range(k):
                G[i, j] = float(jnp.vdot(V[i], AV[j]))
        evals, evecs = np.linalg.eigh(0.5 * (G + G.T))
        pick = -1 if self.which in ("largest", "shift", "pagerank") else 0
        theta = evals[pick]
        y = evecs[:, pick]
        u = sum(float(y[i]) * V[i] for i in range(k))
        u, _ = _normalize(u)
        r = A.apply(u) - theta * u
        resid = jnp.sqrt(jnp.vdot(r, r)) / max(abs(theta), 1e-300)
        # approximate correction: t = -(diag(A) - theta)^{-1} r, orth. to u
        t = -r / jnp.where(jnp.abs(theta) > 0, theta, 1.0)
        t = t - jnp.vdot(u, t) * u
        for w in V:
            t = t - jnp.vdot(w, t) * w
        tn = jnp.sqrt(jnp.vdot(t, t))
        if float(tn) > 1e-12:
            V = V + [t / tn]
        if len(V) > max(4, self.krylov_dim):
            V = [u]                       # restart
        return {"V": V, "lam": jnp.asarray(theta), "resid": resid, "v": u}

    def finalize(self, state):
        lam = float(np.asarray(state["lam"]))
        if self.which == "shift":
            lam += self.shift
        self.eigenvalues = [lam]
        self.eigenvectors = np.asarray(state["v"])[None,
                                                   : self._logical_len()]
