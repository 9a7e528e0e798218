"""Eigensolver methods: SINGLE_ITERATION (power / inverse-power / PageRank),
LANCZOS, ARNOLDI, SUBSPACE_ITERATION, LOBPCG, JACOBI_DAVIDSON.

References: core/src/eigensolvers/{single_iteration,lanczos,arnoldi,
subspace_iteration,lobpcg,jacobi_davidson}_eigensolver.cu and the shared
multivector + QR helpers (qr.cu). The reference offloads small dense
eigenproblems to LAPACK/MAGMA (base/src/amgx_lapack.cu); here numpy.linalg
plays that role — the Ritz problems are metadata-sized.

TPU execution model: the reference's solve loop runs device-resident with
only Ritz-sized data on the host (eigensolver.cu:205-356). The host-driven
``solve_iteration`` protocol below (kept for exotic operators) costs one+
host round trip per step — ~28 ms each through a remote-TPU tunnel — so
every method overrides ``_run`` with a device-resident loop:

  * power / PageRank / LOBPCG: the whole iteration in one jitted
    ``lax.while_loop`` (LOBPCG's 3x3 Rayleigh-Ritz runs on-device via
    ``jnp.linalg.eigh`` with sentinel diagonals masking degenerate
    directions).
  * Lanczos / Arnoldi: ``krylov_dim`` steps batched in one jitted
    ``lax.fori_loop`` (CGS2 full reorthogonalization as masked dense
    matvecs against the basis); per restart the host fetches only the
    tridiagonal / Hessenberg coefficients for the LAPACK-sized Ritz solve.
  * Subspace iteration: one device program per step (block apply +
    Gram projection), one k-by-k fetch for the nonsymmetric Ritz eig.

The operator rides as a jit *operand* (registered pytree — operators.py),
so multi-MB matrices are never baked into the HLO as constants.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .base import EigenSolver, register_eigensolver
from ..solvers.base import SolverFactory


def _normalize(v):
    n = jnp.sqrt(jnp.vdot(v, v))
    return v / jnp.where(n == 0, 1.0, n), n


def _unit(v):
    """Traceable normalize returning the same dtype."""
    n = jnp.sqrt(jnp.vdot(v, v).real)
    return (v / jnp.where(n == 0, 1.0, n)).astype(v.dtype)


def _real_dt(dt):
    return jnp.zeros((), dt).real.dtype


@register_eigensolver("SINGLE_ITERATION")
class SingleIterationEigenSolver(EigenSolver):
    """Power iteration on A (largest / pagerank) or inverse iteration through
    a configured linear solver (smallest)
    (single_iteration_eigensolver.cu)."""

    def solver_setup(self):
        self.inner = None
        self._jit_power = None
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

    def _run(self, x):
        # inverse iteration drives a whole inner Krylov solve per step —
        # that stays on the reference-style host loop
        if self.which == "smallest" or not self._op_is_operand():
            return super()._run(x)
        if self._jit_power is None:
            mi, tol = self.max_iters, self.tolerance

            def run(op, v0):
                rdt = _real_dt(v0.dtype)
                v0 = _unit(v0)

                def cond(c):
                    it, _, _, resid = c
                    return jnp.logical_and(it < mi, resid >= tol)

                def body(c):
                    it, v, lam, _ = c
                    w = op.apply(v)
                    lam = jnp.vdot(v, w)
                    r = w - lam * v
                    resid = jnp.sqrt(jnp.vdot(r, r).real) / \
                        jnp.maximum(jnp.abs(lam).real,
                                    jnp.asarray(1e-30, rdt))
                    return it + 1, _unit(w), lam, resid.astype(rdt)

                c0 = (jnp.asarray(0, jnp.int32), v0,
                      jnp.asarray(0.0, v0.dtype), jnp.asarray(np.inf, rdt))
                return lax.while_loop(cond, body, c0)

            self._jit_power = jax.jit(run)
        it, v, lam, resid = self._jit_power(self.op, x)
        return int(it), {"v": v, "lam": lam, "resid": resid}

    def finalize(self, state):
        lam = float(np.asarray(state["lam"]).real)
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
    a host-side tridiagonal Ritz solve (lanczos_eigensolver.cu). The fused
    path batches krylov_dim steps into one device program per restart."""

    def solver_setup(self):
        self._jit_lz = {}
        self._jit_lz_combine = None

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

    # -- fused path ---------------------------------------------------------

    def _batch_fn(self, steps: int):
        """One jitted program running `steps` Lanczos steps with CGS2 full
        reorthogonalization; returns the basis V and the (2, steps)
        alpha/beta table — the only host fetch per restart."""

        def run(op, v0):
            n = v0.shape[0]
            dt = v0.dtype
            rdt = _real_dt(dt)
            v0 = _unit(v0)
            V = jnp.zeros((steps + 1, n), dt).at[0].set(v0)
            ab = jnp.zeros((2, steps), rdt)

            def body(j, c):
                V, ab = c
                vj = lax.dynamic_index_in_dim(V, j, 0, keepdims=False)
                w = op.apply(vj)
                mask = jnp.arange(steps + 1) <= j
                c1 = jnp.where(mask, V.conj() @ w, 0)
                w = w - c1 @ V
                c2 = jnp.where(mask, V.conj() @ w, 0)   # CGS2 second pass
                w = w - c2 @ V
                a = (c1 + c2)[j]
                b = jnp.sqrt(jnp.vdot(w, w).real)
                ab = ab.at[0, j].set(a.real).at[1, j].set(b)
                V = V.at[j + 1].set(
                    (w / jnp.where(b == 0, 1.0, b)).astype(dt))
                return V, ab

            return lax.fori_loop(0, steps, body, (V, ab))

        return jax.jit(run)

    def _run(self, x):
        if not self._op_is_operand():
            return super()._run(x)
        if self._jit_lz_combine is None:
            def combine(V, y):
                return _unit(y @ V)
            self._jit_lz_combine = jax.jit(combine)
        m = max(2, min(self.krylov_dim, self.max_iters))
        op = self.op
        it_total = 0
        v = x
        lam, resid = 0.0, np.inf
        while it_total < self.max_iters and resid >= self.tolerance:
            steps = max(2, min(m, self.max_iters - it_total))
            fn = self._jit_lz.get(steps)
            if fn is None:
                fn = self._jit_lz[steps] = self._batch_fn(steps)
            V, ab = fn(op, v)
            alpha, beta = np.asarray(ab, np.float64)
            # breakdown = invariant subspace found: truncate there
            scale = max(float(np.abs(alpha).max()), float(beta.max()), 1.0)
            j = steps
            tiny = np.nonzero(beta <= 1e-12 * scale)[0]
            broke = tiny.size > 0
            if broke:
                j = int(tiny[0]) + 1
            T = np.diag(alpha[:j])
            if j > 1:
                T = T + np.diag(beta[:j - 1], 1) + np.diag(beta[:j - 1], -1)
            evals, evecs = np.linalg.eigh(T)
            pick = -1 if self.which in ("largest", "pagerank", "shift") \
                else 0
            lam = float(evals[pick])
            y = evecs[:, pick]
            ypad = np.zeros(steps + 1)
            ypad[:j] = y
            v = self._jit_lz_combine(V, jnp.asarray(ypad, _real_dt(V.dtype)))
            resid = 0.0 if broke else \
                abs(float(beta[j - 1] * y[-1])) / max(abs(lam), 1e-300)
            it_total += min(j, self.max_iters - it_total)
        return it_total, {"lam": jnp.asarray(lam), "v": v,
                          "resid": jnp.asarray(resid)}

    def finalize(self, state):
        if "j" in state:
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
    (arnoldi_eigensolver.cu). The fused path batches krylov_dim steps into
    one device program per restart and fetches only H."""

    def solver_setup(self):
        self._jit_ar = {}
        self._jit_ar_combine = None

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

    # -- fused path ---------------------------------------------------------

    def _batch_fn(self, steps: int):
        def run(op, v0):
            n = v0.shape[0]
            dt = v0.dtype
            rdt = _real_dt(dt)
            v0 = _unit(v0)
            V = jnp.zeros((steps + 1, n), dt).at[0].set(v0)
            H = jnp.zeros((steps + 1, steps), rdt)

            def body(j, c):
                V, H = c
                vj = lax.dynamic_index_in_dim(V, j, 0, keepdims=False)
                w = op.apply(vj)
                mask = jnp.arange(steps + 1) <= j
                h1 = jnp.where(mask, V.conj() @ w, 0)
                w = w - h1 @ V
                h2 = jnp.where(mask, V.conj() @ w, 0)   # CGS2
                w = w - h2 @ V
                hn = jnp.sqrt(jnp.vdot(w, w).real)
                col = jnp.where(mask, (h1 + h2).real, 0.0) \
                    .astype(rdt).at[j + 1].set(hn)
                H = H.at[:, j].set(col)
                V = V.at[j + 1].set(
                    (w / jnp.where(hn == 0, 1.0, hn)).astype(dt))
                return V, H

            return lax.fori_loop(0, steps, body, (V, H))

        return jax.jit(run)

    def _run(self, x):
        if not self._op_is_operand() or \
                not jnp.issubdtype(x.dtype, jnp.floating):
            return super()._run(x)
        if self._jit_ar_combine is None:
            def combine(V, y):
                return _unit(y @ V)
            self._jit_ar_combine = jax.jit(combine)
        m = max(2, min(self.krylov_dim, self.max_iters))
        op = self.op
        it_total = 0
        v = x
        lam, resid = 0.0, np.inf
        while it_total < self.max_iters and resid >= self.tolerance:
            steps = max(2, min(m, self.max_iters - it_total))
            fn = self._jit_ar.get(steps)
            if fn is None:
                fn = self._jit_ar[steps] = self._batch_fn(steps)
            V, H = fn(op, v)
            Hn = np.asarray(H, np.float64)
            sub = np.array([Hn[i + 1, i] for i in range(steps)])
            scale = max(float(np.abs(Hn).max()), 1.0)
            j = steps
            tiny = np.nonzero(sub <= 1e-12 * scale)[0]
            broke = tiny.size > 0
            if broke:
                j = int(tiny[0]) + 1
            evals, evecs = np.linalg.eig(Hn[:j, :j])
            if self.which in ("largest", "pagerank", "shift"):
                pick = int(np.argmax(np.abs(evals)))
            else:
                pick = int(np.argmin(np.abs(evals)))
            lam = float(np.real(evals[pick]))
            y = np.real(evecs[:, pick])
            ypad = np.zeros(steps + 1)
            ypad[:j] = y
            v = self._jit_ar_combine(V, jnp.asarray(ypad, _real_dt(V.dtype)))
            resid = 0.0 if broke else \
                abs(float(Hn[j, j - 1] * y[-1])) / max(abs(lam), 1e-300)
            it_total += min(j, self.max_iters - it_total)
        return it_total, {"lam": jnp.asarray(lam), "v": v,
                          "resid": jnp.asarray(resid)}

    def finalize(self, state):
        if "j" in state:
            state = self._ritz(state)
        lam = float(np.asarray(state["lam"]))
        if self.which == "shift":
            lam += self.shift
        self.eigenvalues = [lam]
        self.eigenvectors = np.asarray(state["v"])[None,
                                                   : self._logical_len()]


@register_eigensolver("SUBSPACE_ITERATION")
class SubspaceIterationEigenSolver(EigenSolver):
    """Block power iteration with QR re-orthonormalization and a projected
    Ritz solve (subspace_iteration_eigensolver.cu + qr.cu). The fused path
    keeps the block, the QR, and the residual on-device; only the k-by-k
    Gram matrix crosses to the host for the nonsymmetric Ritz eig."""

    def solver_setup(self):
        self._jit_sub = None

    def _pad_dim(self):
        k = max(self.wanted, 1)
        return min(k + 2, max(k, 2))

    def solve_init(self, x):
        pad = self._pad_dim()
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

    def _run(self, x):
        if not self._op_is_operand() or \
                not jnp.issubdtype(x.dtype, jnp.floating):
            return super()._run(x)
        pad = self._pad_dim()
        if self._jit_sub is None:
            def s1(op, Q):
                cols = [op.apply(Q[:, i]) for i in range(pad)]
                Y = jnp.stack(cols, axis=1)
                return Y, Q.T @ Y

            def s2(op, Q, Y, E, lam):
                Qn, _ = jnp.linalg.qr(Y @ E)
                v = _unit(Q @ E[:, 0])
                r = op.apply(v) - lam * v
                resid = jnp.sqrt(jnp.vdot(r, r).real) / \
                    jnp.maximum(jnp.abs(lam), 1e-30)
                return Qn, v, resid

            self._jit_sub = (jax.jit(s1), jax.jit(s2))
        js1, js2 = self._jit_sub
        st = self.solve_init(x)
        Q, v = st["Q"], st["v"]
        op = self.op
        it, resid = 0, np.inf
        evals = np.zeros(pad)
        lam = 0.0
        while it < self.max_iters and resid >= self.tolerance:
            Y, B = js1(op, Q)
            ev, evec = np.linalg.eig(np.asarray(B, np.float64))
            order = np.argsort(-np.abs(ev))
            evals = np.real(ev[order])
            E = np.real(evec[:, order])
            lam = float(evals[0])
            Q, v, r_dev = js2(op, Q, Y, jnp.asarray(E, Q.dtype),
                              jnp.asarray(lam, _real_dt(Q.dtype)))
            resid = float(np.asarray(r_dev))
            it += 1
        return it, {"Q": Q, "lam": jnp.asarray(lam),
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
    reference's inner solver. The fused path runs the whole loop on-device:
    the 3x3 Rayleigh-Ritz uses jnp.linalg.eigh with sentinel diagonals for
    degenerate search directions (first iteration's p = 0, converged r)."""

    def solver_setup(self):
        self.precond = None
        self._jit_lobpcg = None
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

    def _run(self, x):
        if not self._op_is_operand() or \
                not jnp.issubdtype(x.dtype, jnp.floating):
            return super()._run(x)
        mi, tol = self.max_iters, self.tolerance
        pick_last = self.which in ("largest", "shift", "pagerank")
        # the preconditioner traces inline (its device buffers are baked as
        # constants — acceptable: M^{-1} is usually small relative to A, and
        # the host path remains for anything exotic)
        P = self.precond.as_preconditioner() \
            if self.precond is not None else None
        if self._jit_lobpcg is None:
            def run(op, v0):
                dt = v0.dtype
                rdt = _real_dt(dt)
                v0 = _unit(v0)
                eps = jnp.asarray(1e-12, rdt)

                def cond(c):
                    it, _, _, _, resid = c
                    return jnp.logical_and(it < mi, resid >= tol)

                def body(c):
                    it, v, p, lam, _ = c
                    Av = op.apply(v)
                    lam_r = jnp.vdot(v, Av).real
                    r = Av - lam_r * v
                    resid = jnp.sqrt(jnp.vdot(r, r).real) / \
                        jnp.maximum(jnp.abs(lam_r), jnp.asarray(1e-30, rdt))
                    if P is not None:
                        r = P(r)
                    u1 = v
                    u2 = r - jnp.vdot(u1, r) * u1
                    n2 = jnp.sqrt(jnp.vdot(u2, u2).real)
                    ok2 = n2 > eps
                    u2 = jnp.where(ok2, u2 / jnp.where(n2 == 0, 1.0, n2),
                                   0.0).astype(dt)
                    u3 = p - jnp.vdot(u1, p) * u1
                    u3 = u3 - jnp.vdot(u2, u3) * u2
                    n3 = jnp.sqrt(jnp.vdot(u3, u3).real)
                    ok3 = n3 > eps
                    u3 = jnp.where(ok3, u3 / jnp.where(n3 == 0, 1.0, n3),
                                   0.0).astype(dt)
                    B = jnp.stack([u1, u2, u3], axis=1)
                    AB = jnp.stack([Av, op.apply(u2), op.apply(u3)], axis=1)
                    G = (B.T @ AB).astype(rdt)
                    G = 0.5 * (G + G.T)
                    valid = jnp.stack(
                        [jnp.asarray(True), ok2, ok3])
                    vm = valid[:, None] & valid[None, :]
                    sent = jnp.asarray(-1e30 if pick_last else 1e30, rdt)
                    G = jnp.where(vm, G, 0.0) + \
                        jnp.diag(jnp.where(valid, jnp.zeros((), rdt), sent))
                    evals, evecs = jnp.linalg.eigh(G)
                    idx = 2 if pick_last else 0
                    y = evecs[:, idx].astype(dt)
                    lam_new = evals[idx].astype(rdt)
                    vn = _unit(B @ y)
                    pn = vn - (y @ (B.T @ v)) * v
                    return it + 1, vn, pn, lam_new, resid.astype(rdt)

                c0 = (jnp.asarray(0, jnp.int32), v0, jnp.zeros_like(v0),
                      jnp.asarray(0.0, rdt), jnp.asarray(np.inf, rdt))
                return lax.while_loop(cond, body, c0)

            self._jit_lobpcg = jax.jit(run)
        it, v, p, lam, resid = self._jit_lobpcg(self.op, x)
        return int(it), {"v": v, "p": p, "lam": lam, "resid": resid}

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
    preconditioning of (A - theta I). Host-driven: the basis grows
    dynamically and the method is not on the benchmark path."""

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
