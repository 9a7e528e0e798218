"""Energy-minimizing interpolation (ENERGYMIN algorithm).

Reference: core/src/energymin/ (energymin_amg_level.cu:93-368) — CR selector
plus an interpolation operator chosen to minimize the A-energy of the coarse
basis. This implementation starts from direct interpolation and applies
constrained energy-minimization sweeps: P <- P - D^{-1} (A P) projected onto
P's sparsity pattern with row sums re-normalized (the standard local
energy-minimization iteration).
"""

from __future__ import annotations

import numpy as np

from ..matrix import CSRMatrix
from . import classical as cls_mod


def ensure_coverage(csr: CSRMatrix, strong: np.ndarray,
                    cf_map: np.ndarray) -> np.ndarray:
    """Promote F nodes with no C point in their distance-<=2 strong
    neighborhood to C (CR can strand such nodes; without an interpolatory
    set their coarse correction is zero and constants are lost). Returns a
    re-numbered cf map."""
    import scipy.sparse as sp
    n = csr.n_rows
    rows = np.repeat(np.arange(n), csr.row_nnz())
    keep = strong & (csr.indices < n) & (csr.indices != rows)
    s = sp.csr_matrix((np.ones(int(keep.sum())),
                       (rows[keep], csr.indices[keep])), shape=(n, n))
    c = cf_map >= 0
    cov1 = (s @ c.astype(np.float64)) > 0
    cov2 = (s @ cov1.astype(np.float64)) > 0
    c_new = c | (~c & ~cov1 & ~cov2)
    out = np.full(n, cls_mod.FINE, cf_map.dtype)
    out[c_new] = np.arange(int(c_new.sum()))
    return out


def em_interpolation(csr: CSRMatrix, strong: np.ndarray,
                     cf_map: np.ndarray, sweeps: int = 2) -> CSRMatrix:
    import scipy.sparse as sp
    # seed from extended (distance-2) interpolation: CR leaves many F nodes
    # with no strong C neighbor, and the energy-min sweep can only move
    # weights inside the seed pattern — distance-2 covers every F row
    p0 = cls_mod.distance2_interpolation(csr, strong, cf_map)
    n, nc = p0.shape
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    a = sp.csr_matrix((data, csr.indices, csr.indptr),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    d = a.diagonal()
    d = np.where(d == 0, 1.0, d)
    dinv = sp.diags(1.0 / d)
    p = p0.to_scipy().tocsr()
    c_rows = cf_map >= 0
    # constant-preserving initialization: scale F rows to unit sum (the
    # sweeps below keep row sums invariant)
    rs = np.asarray(p.sum(axis=1)).ravel()
    scale = np.where(~c_rows & (rs != 0),
                     1.0 / np.where(rs == 0, 1.0, rs), 1.0)
    p = (sp.diags(scale) @ p).tocsr()
    pattern = p.copy()
    pattern.data[:] = 1.0
    # constrained steepest descent on E(P) = 1/2 tr(P^T A P): the update
    # direction is D^{-1} A P masked to the pattern, with its row mean
    # removed so row sums (constant preservation) are invariant — the
    # standard projected energy-minimization sweep. C rows are the
    # injection identity and never move.
    f_scale = sp.diags((~c_rows).astype(np.float64))
    cnt = np.asarray(pattern.sum(axis=1)).ravel()
    cnt_inv = np.where(cnt > 0, 1.0 / np.where(cnt == 0, 1.0, cnt), 0.0)
    for _ in range(sweeps):
        upd = (dinv @ (a @ p)).multiply(pattern).tocsr()
        mean = np.asarray(upd.sum(axis=1)).ravel() * cnt_inv
        upd = (upd - sp.diags(mean) @ pattern).tocsr()
        upd = f_scale @ upd                   # freeze C rows
        p = (p - 0.5 * upd).tocsr()
    p = p.tocsr()
    p.eliminate_zeros()
    return CSRMatrix(n, nc, p.indptr, p.indices, p.data)
