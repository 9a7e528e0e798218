"""Sparse x sparse products (SpGEMM) and the Galerkin triple product.

Replaces the reference's hash-table SpGEMM stack (base/src/csr_multiply*.cu,
csr_galerkin_product) — GPU open-addressing hash tables are meaningless on
TPU. Setup-phase products run host-side using a fully vectorized
expand-sort-compress (ESC) scheme in numpy:

  expand:   every nonzero (i,k,a) of A fans out to row k of B -> (i,j,a*b)
  sort:     lexsort by (i,j)
  compress: np.add.reduceat over equal (i,j) runs

which is O(flops) with no Python-level loops. A native C++ Gustavson kernel
(csrc/spgemm.cpp, loaded via ctypes) accelerates the same entry points when
built; results are identical.
"""

from __future__ import annotations

import numpy as np

from ..matrix import CSRMatrix


def _native():
    from .. import native
    return native.lib()


def csr_spgemm(a: CSRMatrix, b: CSRMatrix) -> CSRMatrix:
    """C = A @ B (reference: CSR_Multiply::csr_multiply, csr_multiply.cu:63)."""
    if a.n_cols != b.n_rows:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    lib = _native()
    if lib is not None and a.block_dim == (1, 1) and b.block_dim == (1, 1):
        out = lib.csr_spgemm(a, b)
        if out is not None:
            return out
    return _esc_spgemm(a, b)


def _esc_spgemm(a: CSRMatrix, b: CSRMatrix) -> CSRMatrix:
    if a.nnz == 0 or b.nnz == 0:
        return CSRMatrix.from_coo(a.n_rows, b.n_cols, [], [],
                                  np.zeros((0,), a.data.dtype))
    a_rows = np.repeat(np.arange(a.n_rows, dtype=np.int64), a.row_nnz())
    a_cols = a.indices.astype(np.int64)
    b_rnnz = b.row_nnz()
    # expansion sizes: for each A-nnz, the nnz of the matching B row
    fan = b_rnnz[a_cols]
    total = int(fan.sum())
    # expanded row ids of C
    c_rows = np.repeat(a_rows, fan)
    # expanded positions into B's data: for each A-nnz e, the range
    # b.indptr[a_cols[e]] ... +fan[e]
    starts = b.indptr[a_cols].astype(np.int64)
    base = np.repeat(starts, fan)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(fan) - fan, fan)
    b_pos = base + within
    c_cols = b.indices[b_pos].astype(np.int64)
    c_vals = np.repeat(a.data, fan) * b.data[b_pos]
    # sort + compress
    key = c_rows * b.n_cols + c_cols
    order = np.argsort(key, kind="stable")
    key = key[order]
    c_vals = c_vals[order]
    uniq, first = np.unique(key, return_index=True)
    summed = np.add.reduceat(c_vals, first)
    rows = (uniq // b.n_cols)
    cols = (uniq % b.n_cols)
    return CSRMatrix.from_coo(a.n_rows, b.n_cols, rows, cols, summed,
                              sum_duplicates=False)


def galerkin_product(r: CSRMatrix, a: CSRMatrix, p: CSRMatrix) -> CSRMatrix:
    """RAP = R @ A @ P (reference: csr_galerkin_product, csr_multiply.cu:326)."""
    lib = _native()
    if (lib is not None and r.block_dim == (1, 1) and a.block_dim == (1, 1)
            and p.block_dim == (1, 1)):
        out = lib.galerkin(r, a, p)
        if out is not None:
            return out
    return csr_spgemm(csr_spgemm(r, a), p)


def aggregation_galerkin(a: CSRMatrix, agg: np.ndarray,
                         n_coarse: int) -> CSRMatrix:
    """Ac[I,J] = sum_{i in I, j in J} A[i,j] for piecewise-constant
    aggregation (reference: aggregation coarseAgenerators LOW_DEG/THRUST,
    core/src/aggregation/coarseAgenerators/). One sort+reduce, no SpGEMM."""
    def _fold_diag(ac):
        if a.diag_data is None:
            return ac
        d_rows = agg[np.arange(a.n_rows)]
        keep = d_rows >= 0
        extra = CSRMatrix.from_coo(n_coarse, n_coarse, d_rows[keep],
                                   d_rows[keep], a.diag_data[keep],
                                   block_dim=a.block_dim)
        return csr_add(ac, extra)

    lib = _native()
    if (lib is not None and a.block_dim == (1, 1)
            and a.data.dtype in (np.float32, np.float64)
            and a.n_rows > 1024):
        out = lib.agg_galerkin(a, agg, n_coarse)
        if out is not None:
            indptr, cols, vals = out
            return _fold_diag(CSRMatrix(
                n_coarse, n_coarse, indptr, cols,
                vals.astype(a.data.dtype, copy=False)))
    rows = np.repeat(np.arange(a.n_rows, dtype=np.int64), a.row_nnz())
    c_rows = agg[rows]
    c_cols = agg[a.indices]
    keep = (c_rows >= 0) & (c_cols >= 0)
    ac = CSRMatrix.from_coo(n_coarse, n_coarse, c_rows[keep],
                            c_cols[keep], a.data[keep],
                            block_dim=a.block_dim)
    return _fold_diag(ac)


def csr_add(a: CSRMatrix, b: CSRMatrix) -> CSRMatrix:
    """C = A + B with matching shapes/blocks."""
    if a.shape != b.shape or a.block_dim != b.block_dim:
        raise ValueError("csr_add shape/block mismatch")
    rows = np.concatenate([
        np.repeat(np.arange(a.n_rows, dtype=np.int64), a.row_nnz()),
        np.repeat(np.arange(b.n_rows, dtype=np.int64), b.row_nnz())])
    cols = np.concatenate([a.indices, b.indices]).astype(np.int64)
    vals = np.concatenate([a.data, b.data], axis=0)
    return CSRMatrix.from_coo(a.n_rows, a.n_cols, rows, cols, vals,
                              block_dim=a.block_dim)


def sparsity_ilu1(a: CSRMatrix) -> CSRMatrix:
    """Symbolic ILU(1) sparsity: pattern of A + pattern(L_A @ U_A)
    (reference: CSR_Multiply::csr_sparsity_ilu1, csr_multiply.cu). Values of
    new fill positions are zero."""
    import scipy.sparse as sp
    s = a.to_scipy() if a.block_dim == (1, 1) else sp.csr_matrix(
        (np.ones(a.nnz), a.indices, a.indptr), shape=(a.n_rows, a.n_cols))
    pattern = sp.csr_matrix((np.ones_like(s.data), s.indices, s.indptr),
                            shape=s.shape)
    low = sp.tril(pattern, k=-1, format="csr")
    up = sp.triu(pattern, k=1, format="csr")
    fill = (low @ up).tocsr()
    fill.data[:] = 1.0
    combined = (pattern + fill).tocsr()
    combined.sort_indices()
    out_rows = np.repeat(np.arange(a.n_rows, dtype=np.int64),
                         np.diff(combined.indptr))
    if a.block_dim == (1, 1):
        dense_vals = np.zeros(combined.nnz, dtype=a.data.dtype)
        src = a.to_scipy().tocsr()
        src.sort_indices()
        # fill in original values at their positions
        m = sp.csr_matrix((np.arange(1, combined.nnz + 1), combined.indices,
                           combined.indptr), shape=combined.shape)
        sub = np.asarray(m[src.nonzero()]).ravel().astype(np.int64) - 1
        dense_vals[sub] = src.data
        return CSRMatrix(a.n_rows, a.n_cols, combined.indptr,
                         combined.indices, dense_vals)
    # blocked: map block values
    vals = np.zeros((combined.nnz, *a.block_dim), dtype=a.data.dtype)
    lut = {}
    for i in range(a.n_rows):
        for k in range(a.indptr[i], a.indptr[i + 1]):
            lut[(i, int(a.indices[k]))] = k
    for i in range(a.n_rows):
        for k in range(combined.indptr[i], combined.indptr[i + 1]):
            j = int(combined.indices[k])
            if (i, j) in lut:
                vals[k] = a.data[lut[(i, j)]]
    return CSRMatrix(a.n_rows, a.n_cols, combined.indptr, combined.indices,
                     vals, block_dim=a.block_dim)
