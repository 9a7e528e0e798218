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
                 which: str = "largest", damping: float = 0.85):
        self.method = method
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.max_iters = max_iters
        self.tolerance = tolerance
        self.krylov_dim = krylov_dim
        self.which = which
        self.damping = damping
        self.dm: Optional[DistEllMatrix] = None
        self.last_iters = 0

    def setup(self, csr: CSRMatrix) -> None:
        n_dev = self.mesh.devices.size
        self.dm = DistEllMatrix.from_global(csr, n_dev, mesh=self.mesh,
                                            axis=self.axis)
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
        raise ValueError(f"Unknown distributed eigensolver {self.method}")
