"""Matrix gallery: Poisson stencil generators.

Replaces the vendored cusp::gallery::poisson5pt/7pt/9pt/27pt generators the
reference uses for tests (base/include/cusp/gallery/poisson.h) and the
built-in distributed generator AMGX_generate_distributed_poisson_7pt
(distributed_manager.cu:977).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .matrix import CSRMatrix


def _stencil_matrix(dims: Tuple[int, ...], offsets, weights,
                    dtype=np.float64) -> CSRMatrix:
    """Build a finite-difference stencil matrix on a regular grid with
    Dirichlet (truncated) boundaries."""
    grids = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    coords = np.stack([g.ravel() for g in grids], axis=1)   # (n, ndim)
    n = coords.shape[0]
    idx = np.arange(n, dtype=np.int64)
    rows_list, cols_list, vals_list = [], [], []
    strides = np.array([int(np.prod(dims[k + 1:])) for k in range(len(dims))],
                       dtype=np.int64)
    for off, w in zip(offsets, weights):
        nb = coords + np.asarray(off)
        ok = np.all((nb >= 0) & (nb < np.asarray(dims)), axis=1)
        j = (nb * strides).sum(axis=1)
        rows_list.append(idx[ok])
        cols_list.append(j[ok])
        vals_list.append(np.full(int(ok.sum()), w, dtype=dtype))
    rows = np.concatenate(rows_list)
    cols = np.concatenate(cols_list)
    vals = np.concatenate(vals_list)
    return CSRMatrix.from_coo(n, n, rows, cols, vals)


def poisson5pt(nx: int, ny: int, dtype=np.float64) -> CSRMatrix:
    offs = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    w = [4.0, -1.0, -1.0, -1.0, -1.0]
    return _stencil_matrix((nx, ny), offs, w, dtype)


def poisson7pt(nx: int, ny: int, nz: int, dtype=np.float64) -> CSRMatrix:
    offs = [(0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1)]
    w = [6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0]
    return _stencil_matrix((nx, ny, nz), offs, w, dtype)


def poisson9pt(nx: int, ny: int, dtype=np.float64) -> CSRMatrix:
    offs, w = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            offs.append((dx, dy))
            w.append(8.0 if (dx, dy) == (0, 0) else -1.0)
    return _stencil_matrix((nx, ny), offs, w, dtype)


def poisson27pt(nx: int, ny: int, nz: int, dtype=np.float64) -> CSRMatrix:
    offs, w = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append((dx, dy, dz))
                w.append(26.0 if (dx, dy, dz) == (0, 0, 0) else -1.0)
    return _stencil_matrix((nx, ny, nz), offs, w, dtype)


def poisson(points: int, *dims, dtype=np.float64) -> CSRMatrix:
    gen = {5: poisson5pt, 7: poisson7pt, 9: poisson9pt, 27: poisson27pt}
    if points not in gen:
        raise ValueError(f"Unsupported stencil {points}")
    return gen[points](*dims, dtype=dtype)


def random_spd(n: int, density: float = 0.05, seed: int = 0,
               dtype=np.float64) -> CSRMatrix:
    """Random diagonally dominant SPD matrix (test fixture; reference:
    tests random_matrix_generation.cu)."""
    rng = np.random.default_rng(seed)
    nnz = max(n, int(n * n * density))
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz).astype(dtype)
    # symmetrize
    r = np.concatenate([rows, cols])
    c = np.concatenate([cols, rows])
    v = np.concatenate([vals, vals]) * 0.5
    a = CSRMatrix.from_coo(n, n, r, c, v)
    dense_rowsum = np.zeros(n)
    np.add.at(dense_rowsum, np.repeat(np.arange(n), a.row_nnz()),
              np.abs(a.data))
    diag = CSRMatrix.from_coo(n, n, np.arange(n), np.arange(n),
                              dense_rowsum + 1.0)
    from .ops.spgemm import csr_add
    return csr_add(a, diag)
