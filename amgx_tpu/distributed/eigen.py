"""Distributed eigensolvers over the device mesh.

BASELINE.md target: "LANCZOS / LOBPCG / PageRank power iteration running on
the same kernel substrate at pod scale". Power iteration and Lanczos run on
the row-partitioned SpMV + psum reductions; the small Ritz problems stay on
host (like the reference's LAPACK bridge, base/src/amgx_lapack.cu).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..matrix import CSRMatrix
from . import comms
from .partition import DistEllMatrix
from .solve import make_mesh


class DistributedEigenSolver:
    """Power iteration / Lanczos with mesh-sharded operators."""

    def __init__(self, method: str = "LANCZOS", mesh: Optional[Mesh] = None,
                 axis: str = "x", max_iters: int = 100,
                 tolerance: float = 1e-8, krylov_dim: int = 20,
                 which: str = "largest", damping: float = 0.85,
                 wanted: int = 1, precond: str = "NONE"):
        self.method = method
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.max_iters = max_iters
        self.tolerance = tolerance
        self.krylov_dim = krylov_dim
        self.which = which
        self.damping = damping
        self.wanted = wanted
        self.precond = precond
        self.dm: Optional[DistEllMatrix] = None
        self.last_iters = 0

    def setup(self, csr: CSRMatrix) -> None:
        n_dev = self.mesh.devices.size
        self.dm = DistEllMatrix.from_global(csr, n_dev, mesh=self.mesh,
                                            axis=self.axis)
        if self.precond == "JACOBI" and csr.block_dim == (1, 1):
            d = np.asarray(csr.diagonal(), np.float64)
            self._invd = self.dm.scatter_vector(
                1.0 / np.where(d == 0, 1.0, d), "rows", self.mesh,
                self.axis)
        else:
            self._invd = self.dm.scatter_vector(
                np.ones(csr.n_rows), "rows", self.mesh, self.axis)
        self._build()

    def pagerank_setup(self, adj: CSRMatrix) -> None:
        """Build the Google-matrix power iteration from an adjacency matrix
        (reference: AMGX_eigensolver_pagerank_setup)."""
        outdeg = np.zeros(adj.n_rows)
        rows = np.repeat(np.arange(adj.n_rows), adj.row_nnz())
        np.add.at(outdeg, rows, np.abs(adj.data))
        inv = np.where(outdeg > 0, 1.0 / np.where(outdeg == 0, 1.0, outdeg),
                       0.0)
        at = adj.transpose()
        # A^T D^{-1} as explicit values so the distributed op is plain SpMV
        scaled = CSRMatrix(at.n_rows, at.n_cols, at.indptr, at.indices,
                           at.data * inv[at.indices])
        self.which = "pagerank"
        n_dev = self.mesh.devices.size
        self.dm = DistEllMatrix.from_global(scaled, n_dev, mesh=self.mesh,
                                            axis=self.axis)
        self._invd = self.dm.scatter_vector(np.ones(scaled.n_rows),
                                            "rows", self.mesh, self.axis)
        self._build()

    def _build(self):
        mesh, ax = self.mesh, self.axis
        dm = self.dm
        n_logical = dm.n_rows
        damping = self.damping
        pagerank = self.which == "pagerank"

        def step(cols, vals, pack, halo, v):
            cols, vals, pack, halo, v = (cols[0], vals[0], pack[0],
                                         halo[0], v[0])
            w = comms.dist_spmv(cols, vals, pack, halo, v, ax)
            if pagerank:
                mass = jax.lax.psum(jnp.sum(v), ax)
                w = damping * w + (1.0 - damping) * mass / n_logical
            lam = comms.dist_dot(v, w, ax)
            r2 = w - lam * v
            resid = comms.dist_nrm2(r2, ax) / jnp.maximum(jnp.abs(lam),
                                                          1e-300)
            nw = comms.dist_nrm2(w, ax)
            return (w / jnp.where(nw == 0, 1.0, nw))[None], lam, resid

        sh = P(ax)
        self._jit_step = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(sh, sh, sh, sh, sh),
            out_specs=(sh, P(), P())))

        def spmv_norm(cols, vals, pack, halo, v):
            cols, vals, pack, halo, v = (cols[0], vals[0], pack[0],
                                         halo[0], v[0])
            w = comms.dist_spmv(cols, vals, pack, halo, v, ax)
            return w[None]

        self._jit_spmv = jax.jit(jax.shard_map(
            spmv_norm, mesh=mesh, in_specs=(sh, sh, sh, sh, sh),
            out_specs=sh))

        # -- block primitives (SUBSPACE_ITERATION / LOBPCG) ----------------

        def block_apply(cols, vals, pack, halo, X):
            """Y = A X plus the two Gram matrices the host Ritz step
            needs: G = Xt Y, M = Yt Y (one psum each, k x k)."""
            cols, vals, pack, halo, X = (cols[0], vals[0], pack[0],
                                         halo[0], X[0])
            Y = comms.dist_block_spmv(cols, vals, pack, halo, X, ax)
            G = jax.lax.psum(X.T @ Y, ax)
            M = jax.lax.psum(Y.T @ Y, ax)
            return Y[None], G, M

        self._jit_block = jax.jit(jax.shard_map(
            block_apply, mesh=mesh, in_specs=(sh, sh, sh, sh, sh),
            out_specs=(sh, P(), P())))

        def block_combine(Y, C):
            return (Y[0] @ C.astype(Y.dtype))[None]

        self._jit_combine = jax.jit(jax.shard_map(
            block_combine, mesh=mesh, in_specs=(sh, P()), out_specs=sh))

        jacobi = self.precond == "JACOBI"

        def lobpcg_step(cols, vals, pack, halo, invd, v, p):
            """One fused locally-optimal step: residual, (optional) Jacobi
            preconditioning, orthonormal 3-term basis {v, r, p}, blocked
            A-apply and the 3x3 projected Gram — everything but the tiny
            host eigendecomposition (lobpcg_eigensolver.cu)."""
            cols, vals, pack, halo, invd, v, p = (
                cols[0], vals[0], pack[0], halo[0], invd[0], v[0], p[0])
            av = comms.dist_spmv(cols, vals, pack, halo, v, ax)
            lam = comms.dist_dot(v, av, ax)
            r = av - lam * v
            resid = comms.dist_nrm2(r, ax) / jnp.maximum(jnp.abs(lam),
                                                         1e-300)
            if jacobi:
                r = invd * r
            # Gram-Schmidt {v, r, p}; near-zero members flagged invalid
            u1 = r - comms.dist_dot(v, r, ax) * v
            n1 = comms.dist_nrm2(u1, ax)
            ok1 = n1 > 1e-12
            u1 = jnp.where(ok1, u1 / jnp.where(n1 == 0, 1.0, n1), 0.0)
            u2 = p - comms.dist_dot(v, p, ax) * v \
                - comms.dist_dot(u1, p, ax) * u1
            n2 = comms.dist_nrm2(u2, ax)
            ok2 = n2 > 1e-12
            u2 = jnp.where(ok2, u2 / jnp.where(n2 == 0, 1.0, n2), 0.0)
            B = jnp.stack([v, u1, u2], axis=1)              # (L, 3)
            AB = comms.dist_block_spmv(cols, vals, pack, halo, B, ax)
            G = jax.lax.psum(B.T @ AB, ax)                  # (3, 3)
            valid = jnp.stack([jnp.asarray(True), ok1, ok2])
            return B[None], G, valid, lam, resid

        self._jit_lobpcg = jax.jit(jax.shard_map(
            lobpcg_step, mesh=mesh, in_specs=(sh,) * 7,
            out_specs=(sh, P(), P(), P(), P())))

        def lobpcg_combine(B, y, v):
            """v_new = normalize(B y); p_new = v_new - y0 v (B is
            orthonormal with B[:,0] = v, so sum_i y_i <B_i, v> = y0)."""
            B, v = B[0], v[0]
            vn = B @ y.astype(B.dtype)
            nrm = jnp.sqrt(jax.lax.psum(jnp.vdot(vn, vn), ax))
            vn = vn / jnp.where(nrm == 0, 1.0, nrm)
            return vn[None], (vn - y[0] * v)[None]

        self._jit_lobpcg_combine = jax.jit(jax.shard_map(
            lobpcg_combine, mesh=mesh, in_specs=(sh, P(), sh),
            out_specs=(sh, sh)))

    # -- block vector entry/exit ------------------------------------------

    def _scatter_block(self, X: np.ndarray):
        """Global (n, k) host block -> (D, Lpad, k) sharded array (zero
        padding rows stay zero through every block op: the matrix rows are
        zero-padded too)."""
        from jax.sharding import NamedSharding
        dm = self.dm
        X = X.astype(dm.vals.dtype)
        out = np.zeros((dm.n_dev, dm.lr, X.shape[1]), X.dtype)
        perm = dm.row_perm
        if perm is not None:
            ok = perm >= 0
            out[ok] = X[perm[ok]]
        else:
            for d in range(dm.n_dev):
                c0 = dm.row_part.offsets[d]
                c1 = dm.row_part.offsets[d + 1]
                out[d, :c1 - c0] = X[c0:c1]
        return jax.device_put(out, NamedSharding(self.mesh, P(self.axis)))

    def _gather_block(self, arr) -> np.ndarray:
        from .multihost import to_host
        dm = self.dm
        a = to_host(arr)
        out = np.zeros((dm.n_rows, a.shape[2]), a.dtype)
        perm = dm.row_perm
        if perm is not None:
            ok = perm >= 0
            out[perm[ok]] = a[ok]
        else:
            for d in range(dm.n_dev):
                c0 = dm.row_part.offsets[d]
                c1 = dm.row_part.offsets[d + 1]
                out[c0:c1] = a[d, :c1 - c0]
        return out

    def solve(self, x0: Optional[np.ndarray] = None):
        dm = self.dm
        rng = np.random.default_rng(7)
        v0 = x0 if x0 is not None else rng.standard_normal(dm.n_rows)
        v = dm.scatter_vector(v0 / np.linalg.norm(v0), "rows", self.mesh,
                              self.axis)
        m = (dm.cols, dm.vals, dm.pack_idx, dm.halo_from)
        if self.method in ("SINGLE_ITERATION", "POWER"):
            lam = 0.0
            for it in range(self.max_iters):
                v, lam, resid = self._jit_step(*m, v)
                if float(resid) < self.tolerance:
                    break
            self.last_iters = it + 1
            vec = dm.gather_vector(v, "rows")
            return [float(lam)], vec[None, :]
        if self.method == "LANCZOS":
            # distributed matvecs, host tridiagonal Ritz solve
            k = self.krylov_dim
            V = [np.asarray(v)]
            alpha, beta = [], []
            for j in range(k):
                w = np.asarray(self._jit_spmv(*m, jnp.asarray(V[j])))
                a = float((V[j] * w).sum())
                w = w - a * V[j]
                if j > 0:
                    w = w - beta[-1] * V[j - 1]
                for u in V:                     # full reorthogonalization
                    w = w - (u * w).sum() * u
                b = float(np.sqrt((w * w).sum()))
                alpha.append(a)
                beta.append(b)
                if b < 1e-14:
                    break
                V.append(w / b)
            T = np.diag(alpha) + np.diag(beta[:len(alpha) - 1], 1) + \
                np.diag(beta[:len(alpha) - 1], -1)
            evals, evecs = np.linalg.eigh(T)
            pick = -1 if self.which in ("largest", "pagerank") else 0
            lam = float(evals[pick])
            y = evecs[:, pick]
            vec = sum(float(y[i]) * V[i] for i in range(len(y)))
            self.last_iters = len(alpha)
            return [lam], dm.gather_vector(jnp.asarray(vec), "rows")[None, :]
        if self.method == "ARNOLDI":
            # distributed matvecs, host Hessenberg Ritz solve (mirror of
            # the single-chip ArnoldiEigenSolver; reference:
            # arnoldi_eigensolver.cu + eigen_examples/eigensolver_mpi.c)
            k = self.krylov_dim
            V = [np.asarray(v)]
            H = np.zeros((k + 1, k))
            lam, resid, vec = 0.0, np.inf, np.asarray(v)
            j_done = 0
            for j in range(k):
                w = np.asarray(self._jit_spmv(*m, jnp.asarray(V[j])))
                h = np.array([float((u * w).sum()) for u in V])
                w = w - sum(h[i] * V[i] for i in range(len(V)))
                hn = float(np.sqrt((w * w).sum()))
                H[:j + 1, j] = h
                H[j + 1, j] = hn
                j_done = j + 1
                if hn < 1e-14:
                    break
                V.append(w / hn)
            Hj = H[:j_done, :j_done]
            evals, evecs = np.linalg.eig(Hj)
            pick = int(np.argmax(np.abs(evals))) \
                if self.which in ("largest", "pagerank", "shift") \
                else int(np.argmin(np.abs(evals)))
            lam = evals[pick]
            y = np.real(evecs[:, pick])
            vec = sum(float(y[i]) * V[i] for i in range(j_done))
            vec = vec / max(np.linalg.norm(vec), 1e-300)
            self.last_iters = j_done
            return [float(np.real(lam))], \
                dm.gather_vector(jnp.asarray(vec), "rows")[None, :]
        if self.method == "JACOBI_DAVIDSON":
            # host-driven JD with distributed matvecs (mirror of the
            # single-chip JacobiDavidsonEigenSolver)
            u = np.asarray(v)
            V = [u]
            theta, resid = 0.0, np.inf
            for it in range(self.max_iters):
                kdim = len(V)
                AV = [np.asarray(self._jit_spmv(*m, jnp.asarray(w)))
                      for w in V]
                G = np.empty((kdim, kdim))
                for i in range(kdim):
                    for j in range(kdim):
                        G[i, j] = float((V[i] * AV[j]).sum())
                evals, evecs = np.linalg.eigh(0.5 * (G + G.T))
                pick = -1 if self.which in ("largest", "shift",
                                            "pagerank") else 0
                theta = float(evals[pick])
                y = evecs[:, pick]
                u = sum(float(y[i]) * V[i] for i in range(kdim))
                u = u / max(np.linalg.norm(u), 1e-300)
                r = np.asarray(self._jit_spmv(*m, jnp.asarray(u))) \
                    - theta * u
                resid = float(np.linalg.norm(r)) / max(abs(theta), 1e-300)
                if resid < self.tolerance:
                    break
                t = -r / (theta if abs(theta) > 0 else 1.0)
                t = t - float((u * t).sum()) * u
                for w in V:
                    t = t - float((w * t).sum()) * w
                tn = np.linalg.norm(t)
                if tn > 1e-12:
                    V.append(t / tn)
                if len(V) > max(4, self.krylov_dim):
                    V = [u]               # restart
            self.last_iters = it + 1
            return [theta], dm.gather_vector(jnp.asarray(u),
                                             "rows")[None, :]
        if self.method in ("SUBSPACE_ITERATION", "SUBSPACE"):
            return self._solve_subspace(v0)
        if self.method == "LOBPCG":
            return self._solve_lobpcg(v0)
        raise ValueError(f"Unknown distributed eigensolver {self.method}")

    def _solve_subspace(self, v0: np.ndarray):
        """Distributed block power iteration with host Ritz solves
        (subspace_iteration_eigensolver.cu). Per iteration: one blocked
        A-apply + two k x k psum Grams on the mesh; eig / Cholesky
        orthonormalization on the k x k host matrices (the residual norm
        follows from the Grams alone — no extra matvec)."""
        dm = self.dm
        k = max(self.wanted, 1)
        pad = min(k + 2, max(k, 2))
        rng = np.random.default_rng(11)
        X = rng.standard_normal((dm.n_rows, pad))
        X[:, 0] = np.asarray(v0)
        Q, _ = np.linalg.qr(X)
        Xd = self._scatter_block(np.ascontiguousarray(Q))
        m = (dm.cols, dm.vals, dm.pack_idx, dm.halo_from)
        evals = np.zeros(pad)
        for it in range(self.max_iters):
            Y, G, M = self._jit_block(*m, Xd)
            G, M = np.asarray(G), np.asarray(M)
            ev, evec = np.linalg.eig(G)
            order = np.argsort(-np.abs(ev))
            evals = np.real(ev[order])
            evecs = np.real(evec[:, order])
            lam = float(evals[0])
            y0 = evecs[:, 0]
            # ||A x - lam x||^2 = y0' M y0 - lam y0'(G+G')y0 + lam^2|y0|^2
            rr = float(y0 @ M @ y0 - lam * (y0 @ (G + G.T) @ y0)
                       + lam * lam * (y0 @ y0))
            resid = np.sqrt(max(rr, 0.0)) / max(abs(lam), 1e-300)
            # X_new = Y evecs R^{-1}: Cholesky-QR in the Ritz basis
            S = evecs.T @ M @ evecs
            S = 0.5 * (S + S.T)
            try:
                R = np.linalg.cholesky(
                    S + (1e-14 * np.trace(S) / pad) * np.eye(pad)).T
                C = evecs @ np.linalg.inv(R)
            except np.linalg.LinAlgError:
                w, U = np.linalg.eigh(S)
                C = evecs @ (U / np.sqrt(np.maximum(w, 1e-30))) @ U.T
            Xd = self._jit_combine(Y, jnp.asarray(C))
            if resid < self.tolerance:
                break
        self.last_iters = it + 1
        vecs = self._gather_block(Xd)[:, :k].T
        return [float(e) for e in evals[:k]], vecs

    def _solve_lobpcg(self, v0: np.ndarray):
        """Distributed locally-optimal block PCG, mirroring the single-chip
        LOBPCGEigenSolver (lobpcg_eigensolver.cu): the whole step except the
        3x3 Ritz problem runs as one fused SPMD program."""
        dm = self.dm
        mesh, ax = self.mesh, self.axis
        v = dm.scatter_vector(np.asarray(v0) / np.linalg.norm(v0), "rows",
                              mesh, ax)
        p = dm.scatter_vector(np.zeros(dm.n_rows), "rows", mesh, ax)
        m = (dm.cols, dm.vals, dm.pack_idx, dm.halo_from)
        pick = -1 if self.which in ("largest", "shift", "pagerank") else 0
        lam = 0.0
        for it in range(self.max_iters):
            B, G, valid, lam_j, resid = self._jit_lobpcg(*m, self._invd,
                                                         v, p)
            lam = float(lam_j)
            if float(resid) < self.tolerance and it > 0:
                break
            G, mask = np.asarray(G), np.asarray(valid)
            Gs = 0.5 * (G + G.T)[np.ix_(mask, mask)]
            ev, evec = np.linalg.eigh(Gs)
            y = np.zeros(3)
            y[mask] = evec[:, pick]
            lam = float(ev[pick])
            v, p = self._jit_lobpcg_combine(B, jnp.asarray(y), v)
        self.last_iters = it + 1
        return [lam], dm.gather_vector(v, "rows")[None, :]
