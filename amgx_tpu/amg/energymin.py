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


def em_interpolation(csr: CSRMatrix, strong: np.ndarray,
                     cf_map: np.ndarray, sweeps: int = 2) -> CSRMatrix:
    import scipy.sparse as sp
    p0 = cls_mod.direct_interpolation(csr, strong, cf_map)
    n, nc = p0.shape
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    a = sp.csr_matrix((data, csr.indices, csr.indptr),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    d = a.diagonal()
    d = np.where(d == 0, 1.0, d)
    dinv = sp.diags(1.0 / d)
    p = p0.to_scipy().tocsr()
    pattern = p.copy()
    pattern.data[:] = 1.0
    c_rows = cf_map >= 0
    for _ in range(sweeps):
        upd = (dinv @ (a @ p)).tocsr()
        upd = upd.multiply(pattern)          # keep the sparsity pattern
        p = (p - 0.5 * upd).tocsr()
        # C rows stay identity
        p = p.tolil()
        for i in np.nonzero(c_rows)[0]:
            p.rows[i] = [int(cf_map[i])]
            p.data[i] = [1.0]
        p = p.tocsr()
        # renormalize row sums of F rows to preserve constants
        rs = np.asarray(p.sum(axis=1)).ravel()
        scale = np.where((rs != 0) & ~c_rows, 1.0 / np.where(rs == 0, 1.0,
                                                             rs), 1.0)
        p = sp.diags(scale) @ p
    p = p.tocsr()
    p.eliminate_zeros()
    return CSRMatrix(n, nc, p.indptr, p.indices, p.data)
