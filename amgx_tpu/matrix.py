"""Matrix containers.

TPU-native re-design of AMGX's Matrix (reference: base/include/matrix.h:44-370,
base/src/matrix.cu). The reference keeps one CSR/BSR container that every CUDA
kernel consumes; on TPU we split responsibilities:

  * ``CSRMatrix`` — host-side (numpy) container used by the *setup* phase
    (coarsening, coloring, SpGEMM) where algorithms are irregular and
    metadata-sized.
  * ``EllMatrix`` — device-side pytree in padded ELL layout used by the *solve*
    phase. Static shapes make every solver jittable; gathers vectorize on the
    VPU and block variants feed the MXU.
  * ``DenseOperator`` — small (coarse-level) operators stored dense so SpMV is
    a single MXU matmul; replaces the reference's host/dense fallbacks.

The precision "mode" system (reference: base/include/amgx_config.h:101-147,
10 template-instantiated modes like dDDI/dDFI/dFFI) becomes two dtype
parameters (matrix dtype, vector dtype).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Precision modes
# ---------------------------------------------------------------------------

_PRECISION = {"D": np.float64, "F": np.float32, "B": jnp.bfloat16,
              "Z": np.complex128, "C": np.complex64}


def mode_dtypes(mode: str) -> Tuple[Any, Any]:
    """Map an AMGX mode string to (vector_dtype, matrix_dtype).

    Reference: amgx_config.h AMGX_mode packing (memspace, vecPrec, matPrec,
    indPrec). The memspace letter is ignored (everything is a jax array) and
    indices are always int32.
    """
    m = mode.replace("16", "")
    if len(m) != 4:
        raise ValueError(f"Bad mode '{mode}'")
    vec, mat = m[1], m[2]
    if vec not in _PRECISION or mat not in _PRECISION:
        raise ValueError(f"Bad mode '{mode}'")
    return _PRECISION[vec], _PRECISION[mat]


# ---------------------------------------------------------------------------
# Host CSR container (setup phase)
# ---------------------------------------------------------------------------

class CSRMatrix:
    """Host CSR (optionally blocked) matrix.

    Blocked matrices store ``data`` with shape (nnz, bx, by) where (bx, by) is
    the block size; scalar matrices use shape (nnz,). Mirrors the reference's
    block-CSR with ROW_MAJOR values (matrix.h:88-111); the external-DIAG
    storage property is supported via the ``diag_data`` side array.
    """

    def __init__(self, n_rows: int, n_cols: int,
                 indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                 block_dim: Tuple[int, int] = (1, 1),
                 diag_data: Optional[np.ndarray] = None):
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.data = np.asarray(data)
        self.block_dim = (int(block_dim[0]), int(block_dim[1]))
        self.diag_data = diag_data  # (n_rows,) or (n_rows, bx, by) or None
        if self.indptr.shape[0] != self.n_rows + 1:
            raise ValueError("indptr length must be n_rows+1")
        bx, by = self.block_dim
        if bx > 1 or by > 1:
            if self.data.ndim != 3 or self.data.shape[1:] != (bx, by):
                raise ValueError(
                    f"block data must have shape (nnz,{bx},{by})")
        # string-keyed side-channel parameters (reference: auxdata.h)
        self.aux: Dict[str, Any] = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_coo(cls, n_rows: int, n_cols: int, rows: np.ndarray,
                 cols: np.ndarray, vals: np.ndarray,
                 block_dim: Tuple[int, int] = (1, 1),
                 sum_duplicates: bool = True) -> "CSRMatrix":
        """COO -> sorted CSR. ``sum_duplicates=False`` is a caller promise
        that no (row, col) pair repeats (permutations, disjoint
        assemblies) — both the native and numpy paths may then still merge
        any duplicates that do appear, so the promise must hold."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        # presorted fast path: strictly increasing (row, col) keys mean no
        # sort and no duplicate merge — common for CSR-derived sub-
        # selections (D2's strong-entry splits, transfer assemblies)
        if rows.size:
            key = rows * np.int64(n_cols) + cols
            if key.size == 1 or bool(np.all(key[1:] > key[:-1])):
                indptr = np.zeros(n_rows + 1, dtype=np.int64)
                np.cumsum(np.bincount(rows, minlength=n_rows),
                          out=indptr[1:])
                return cls(n_rows, n_cols, indptr,
                           cols.astype(np.int32), vals,
                           block_dim=block_dim)
        if (vals.dtype in (np.float32, np.float64)
                and rows.size and n_rows > 1024):
            from .native import lib as _nl
            nl = _nl()
            if nl is not None:
                bx, by = block_dim
                out = nl.coo_to_csr(n_rows, rows, cols,
                                    vals.reshape(rows.size, bx * by),
                                    bx * by)
                if out is not None:
                    indptr, out_cols, out_vals = out
                    out_vals = out_vals.astype(vals.dtype, copy=False)
                    if (bx, by) != (1, 1):
                        out_vals = out_vals.reshape(-1, bx, by)
                    else:
                        out_vals = out_vals.reshape(-1)
                    return cls(n_rows, n_cols, indptr, out_cols, out_vals,
                               block_dim=block_dim)
        # single stable sort on the combined (row, col) key — one pass
        # instead of lexsort's two plus np.unique's third
        key = rows * np.int64(n_cols) + cols
        order = np.argsort(key, kind="stable")
        key, vals = key[order], vals[order]
        # duplicates always merge (the native path has no keep-duplicates
        # mode, so the numpy fallback matches it for uniform behavior;
        # sum_duplicates=False is the caller's no-duplicates promise)
        if key.size:
            newgrp = np.empty(key.size, np.bool_)
            newgrp[0] = True
            np.not_equal(key[1:], key[:-1], out=newgrp[1:])
            if not newgrp.all():
                first = np.nonzero(newgrp)[0]
                vals = np.add.reduceat(vals, first, axis=0)
                key = key[first]
        rows = key // n_cols
        cols = key - rows * n_cols
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(n_rows, n_cols, indptr, cols.astype(np.int32), vals,
                   block_dim=block_dim)

    @classmethod
    def from_scipy(cls, m) -> "CSRMatrix":
        m = m.tocsr()
        return cls(m.shape[0], m.shape[1], m.indptr, m.indices, m.data)

    @classmethod
    def from_dense(cls, a: np.ndarray, tol: float = 0.0) -> "CSRMatrix":
        a = np.asarray(a)
        rows, cols = np.nonzero(np.abs(a) > tol)
        return cls.from_coo(a.shape[0], a.shape[1], rows, cols, a[rows, cols])

    # -- conversions ---------------------------------------------------------

    def fold_diagonal(self) -> "CSRMatrix":
        """Return an equivalent matrix with the external diagonal (DIAG
        property) merged into the CSR structure; self when there is none."""
        if self.diag_data is None:
            return self
        n = self.n_rows
        rows = np.concatenate([np.repeat(np.arange(n), self.row_nnz()),
                               np.arange(n)])
        cols = np.concatenate([self.indices.astype(np.int64),
                               np.arange(n)])
        vals = np.concatenate([self.data, np.asarray(self.diag_data)],
                              axis=0)
        return CSRMatrix.from_coo(n, self.n_cols, rows, cols, vals,
                                  block_dim=self.block_dim)

    def to_scipy(self):
        """Scipy CSR of the FULL operator (external diagonal included)."""
        import scipy.sparse as sp
        m = self.fold_diagonal()
        if m.block_dim != (1, 1):
            return sp.bsr_matrix(
                (m.data, m.indices, m.indptr),
                shape=(m.n_rows * m.block_dim[0],
                       m.n_cols * m.block_dim[1])).tocsr()
        return sp.csr_matrix((m.data, m.indices, m.indptr),
                             shape=(m.n_rows, m.n_cols))

    def to_dense(self) -> np.ndarray:
        bx, by = self.block_dim
        if (bx, by) == (1, 1):
            out = np.zeros((self.n_rows, self.n_cols), dtype=self.data.dtype)
            for i in range(self.n_rows):
                s, e = self.indptr[i], self.indptr[i + 1]
                out[i, self.indices[s:e]] += self.data[s:e]
            if self.diag_data is not None:
                out[np.arange(self.n_rows), np.arange(self.n_rows)] += \
                    self.diag_data
            return out
        out = np.zeros((self.n_rows * bx, self.n_cols * by),
                       dtype=self.data.dtype)
        for i in range(self.n_rows):
            s, e = self.indptr[i], self.indptr[i + 1]
            for k in range(s, e):
                j = self.indices[k]
                out[i * bx:(i + 1) * bx, j * by:(j + 1) * by] += self.data[k]
        if self.diag_data is not None:
            for i in range(self.n_rows):
                out[i * bx:(i + 1) * bx, i * by:(i + 1) * by] += \
                    self.diag_data[i]
        return out

    # -- properties ----------------------------------------------------------

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.data.dtype

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.indptr)

    def diagonal(self) -> np.ndarray:
        """Extract the (block) diagonal; accounts for external-diag storage."""
        if self.diag_data is not None:
            return np.array(self.diag_data)
        bx, by = self.block_dim
        if (bx, by) == (1, 1):
            d = np.zeros(self.n_rows, dtype=self.data.dtype)
        else:
            d = np.zeros((self.n_rows, bx, by), dtype=self.data.dtype)
        rows = np.repeat(np.arange(self.n_rows), self.row_nnz())
        hit = self.indices == rows
        d[rows[hit]] = self.data[hit]
        return d

    def transpose(self) -> "CSRMatrix":
        """CSR transpose (reference: base/src/transpose.cu:164)."""
        nnz = self.nnz
        rows = np.repeat(np.arange(self.n_rows, dtype=np.int64),
                         self.row_nnz())
        cols = self.indices.astype(np.int64)
        data = self.data
        if self.block_dim != (1, 1):
            data = np.swapaxes(data, 1, 2)
        m = CSRMatrix.from_coo(self.n_cols, self.n_rows, cols, rows, data,
                               block_dim=(self.block_dim[1], self.block_dim[0]),
                               sum_duplicates=False)
        return m

    def sort_rows(self) -> None:
        """Sort column indices within each row (reference: base/src/sort.cu)."""
        for i in range(self.n_rows):
            s, e = self.indptr[i], self.indptr[i + 1]
            order = np.argsort(self.indices[s:e], kind="stable")
            self.indices[s:e] = self.indices[s:e][order]
            self.data[s:e] = self.data[s:e][order]

    def __repr__(self) -> str:
        return (f"CSRMatrix({self.n_rows}x{self.n_cols}, nnz={self.nnz}, "
                f"block={self.block_dim}, dtype={self.data.dtype})")


# ---------------------------------------------------------------------------
# Device operators (solve phase)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class EllMatrix:
    """Padded-ELL device matrix: the TPU-native SpMV operand.

    ``cols``: (n_pad, width) int32 — padded entries point at column 0.
    ``vals``: (n_pad, width) for scalar or (n_pad, width, bx, by) for blocked
    matrices — padded entries are zero, so gathers stay branch-free.
    ``n_rows``/``n_cols`` are the logical (unpadded) dimensions. Rows are
    padded to a multiple of 8 to match the f32 VPU sublane tile.
    """

    def __init__(self, cols, vals, n_rows: int, n_cols: int,
                 block_dim: Tuple[int, int] = (1, 1), nnz: int = 0):
        self.cols = cols
        self.vals = vals
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.block_dim = (int(block_dim[0]), int(block_dim[1]))
        self.nnz = int(nnz)

    # pytree protocol — static: shapes & metadata, dynamic: arrays
    def tree_flatten(self):
        return ((self.cols, self.vals),
                (self.n_rows, self.n_cols, self.block_dim, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals = children
        n_rows, n_cols, block_dim, nnz = aux
        return cls(cols, vals, n_rows, n_cols, block_dim, nnz)

    @property
    def width(self) -> int:
        return self.cols.shape[1]

    @property
    def n_pad(self) -> int:
        return self.cols.shape[0]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    def apply(self, x):
        from .ops.spmv import ell_spmv
        return ell_spmv(self, x)

    def __repr__(self):
        return (f"EllMatrix({self.n_rows}x{self.n_cols}, width={self.width}, "
                f"block={self.block_dim}, dtype={self.vals.dtype})")


@jax.tree_util.register_pytree_node_class
class DenseOperator:
    """Coarse-level operator stored dense; apply() is one MXU matmul."""

    def __init__(self, a, n_rows: int, n_cols: int,
                 block_dim: Tuple[int, int] = (1, 1)):
        self.a = a            # (n_rows*bx, n_cols*by) padded to tile
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.block_dim = (int(block_dim[0]), int(block_dim[1]))

    def tree_flatten(self):
        return ((self.a,), (self.n_rows, self.n_cols, self.block_dim))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.a.dtype

    @property
    def n_pad(self) -> int:
        return self.a.shape[0] // self.block_dim[0]

    def apply(self, x):
        flat = x.reshape(-1)
        y = self.a @ flat
        return y.reshape(x.shape)

    def __repr__(self):
        return f"DenseOperator({self.n_rows}x{self.n_cols})"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def csr_to_ell(csr: CSRMatrix, dtype=None, width_multiple: int = 1,
               row_pad: int = 8) -> EllMatrix:
    """Convert host CSR to device padded ELL.

    Padded row slots use column 0 / value 0 (safe: 0*x[0] = 0). When the
    matrix stores an external diagonal (DIAG property), the diagonal is folded
    back into the ELL structure so ``apply`` is the plain y = A x.
    """
    rn = csr.row_nnz()
    has_diag = csr.diag_data is not None
    width = int(rn.max()) + (1 if has_diag else 0) if csr.n_rows else 1
    width = max(1, _round_up(width, width_multiple))
    n_pad = max(row_pad, _round_up(csr.n_rows, row_pad))
    dtype = dtype or csr.data.dtype
    bx, by = csr.block_dim
    cols = np.zeros((n_pad, width), dtype=np.int32)
    if (bx, by) == (1, 1):
        vals = np.zeros((n_pad, width), dtype=dtype)
    else:
        vals = np.zeros((n_pad, width, bx, by), dtype=dtype)
    # vectorized CSR->ELL scatter
    if csr.nnz:
        rows = np.repeat(np.arange(csr.n_rows), rn)
        slot = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], rn)
        cols[rows, slot] = csr.indices
        vals[rows, slot] = csr.data.astype(dtype)
    if has_diag:
        r = np.arange(csr.n_rows)
        cols[r, rn] = r
        vals[r, rn] = csr.diag_data.astype(dtype)
    # one batched transfer: each eager device_put costs a full tunnel
    # round trip (~46 ms) regardless of size
    cols_d, vals_d = jax.device_put((cols, vals))
    out = EllMatrix(cols_d, vals_d,
                    csr.n_rows, csr.n_cols, csr.block_dim,
                    nnz=csr.nnz + (csr.n_rows if has_diag else 0))
    if (bx, by) == (1, 1) and csr.nnz:
        from .ops.value_update import attach_plan, csr_structure_sig
        rows = np.repeat(np.arange(csr.n_rows), rn)
        slot = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], rn)
        flat = rows * width + slot
        if has_diag:
            r = np.arange(csr.n_rows)
            flat = np.concatenate([flat, r * width + rn])
        attach_plan(out, "ell", csr_structure_sig(csr, dtype), flat,
                    n_pad * width)
    return out


def csr_to_dense_op(csr: CSRMatrix, dtype=None, tile: int = 8) -> DenseOperator:
    dtype = dtype or csr.data.dtype
    bx, by = csr.block_dim
    dense = csr.to_dense().astype(dtype)
    m = _round_up(max(1, csr.n_rows * bx), tile)
    n = _round_up(max(1, csr.n_cols * by), tile)
    out = np.zeros((m, n), dtype=dtype)
    out[:dense.shape[0], :dense.shape[1]] = dense
    op = DenseOperator(jnp.asarray(out), csr.n_rows, csr.n_cols,
                       csr.block_dim)
    if (bx, by) == (1, 1) and csr.diag_data is None and csr.nnz:
        from .ops.value_update import attach_plan, csr_structure_sig
        rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
        flat = rows * n + csr.indices
        attach_plan(op, "dense", csr_structure_sig(csr, dtype), flat,
                    m * n)
    return op


# ---------------------------------------------------------------------------
# Public Matrix handle
# ---------------------------------------------------------------------------

def _complex_mode(mode: str, data) -> str:
    """Promote a real mode string to its complex twin when the uploaded
    data is complex (a convenience over the reference, where the mode is
    fixed at create time and complex data in a dDDI matrix is a user
    error): dDDI -> dZZI, dFFI -> dCCI."""
    dt = np.asarray(data).dtype
    if not np.issubdtype(dt, np.complexfloating):
        return mode
    m = mode.replace("16", "")
    if len(m) == 4 and m[2] not in ("Z", "C"):
        z = "C" if dt == np.complex64 else "Z"
        return m[0] + z + z + m[3]
    return mode


class Matrix:
    """Public matrix handle mirroring the AMGX matrix object lifecycle
    (reference: AMGX_matrix_create/upload_all, amgx_c.cu:2955).

    Holds the host CSR plus a lazily built device operator; carries the
    attachments the reference hangs off Matrix: coloring, distributed
    manager, aux parameters.
    """

    def __init__(self, csr: Optional[CSRMatrix] = None, mode: str = "dDDI"):
        self.mode = _complex_mode(mode, csr.data) if csr is not None \
            else mode
        self.csr = csr
        self._device_op = None
        self.coloring = None           # MatrixColoring attachment
        self.manager = None            # DistributedManager attachment
        self.initialized = csr is not None

    # -- upload API (reference: AMGX_matrix_upload_all) ----------------------

    def upload(self, n: int, nnz: int, indptr, indices, data,
               diag_data=None, block_dims: Tuple[int, int] = (1, 1)) -> None:
        bx, by = block_dims
        data = np.asarray(data)
        if (bx, by) != (1, 1):
            data = data.reshape(nnz, bx, by)
        self.csr = CSRMatrix(n, n, np.asarray(indptr), np.asarray(indices),
                             data, block_dim=(bx, by),
                             diag_data=None if diag_data is None
                             else np.asarray(diag_data).reshape(
                                 (n, bx, by) if (bx, by) != (1, 1) else (n,)))
        self.mode = _complex_mode(self.mode, data)
        self._device_op = None
        self.initialized = True

    def replace_coefficients(self, data, diag_data=None) -> None:
        """Reference: AMGX_matrix_replace_coefficients (amgx_c.h:304-309) —
        same sparsity, new values; device operator is rebuilt lazily and the
        attached solver may reuse its hierarchy structure."""
        data = np.asarray(data)
        if self.csr.block_dim != (1, 1):
            data = data.reshape(self.csr.data.shape)
        self.csr.data = data.astype(self.csr.data.dtype, copy=False)
        if diag_data is not None:
            self.csr.diag_data = np.asarray(diag_data).reshape(
                np.shape(self.csr.diag_data))
        # same sparsity: the old device op donates its layout (static
        # index/metadata arrays) so the rebuild is a value-only device
        # scatter instead of a full host pack + re-upload
        self._donor_op = self._device_op
        self._device_op = None

    # -- device form ----------------------------------------------------------

    def device_op(self, dense_threshold: int = 0, spmv_impl: str = "AUTO",
                  donor=None):
        """Build/cache the device operator, choosing the fastest layout:
        dense (MXU) below the threshold, DIA (banded shift-FMA / Pallas) for
        stencil-structured matrices, padded-ELL gather otherwise
        (reference: the cuSPARSE-vs-custom kernel dispatch in multiply.cu).

        ``donor`` (or a stashed one from replace_coefficients): an op
        built for the SAME sparsity whose layout can be value-updated on
        device — a time-stepping resetup then uploads ~4 B/nnz instead of
        the full layout (reference: replace_coefficients reuses device
        structure, matrix.cu)."""
        if self._device_op is None:
            cand = donor if donor is not None \
                else getattr(self, "_donor_op", None)
            if cand is not None:
                _, mat_dt = mode_dtypes(self.mode)
                from .ops.value_update import try_value_update
                upd = try_value_update(cand, self.csr, mat_dt)
                if upd is not None:
                    self._device_op = upd
                self._donor_op = None
        if self._device_op is None:
            _, mat_dt = mode_dtypes(self.mode)
            bx, _ = self.csr.block_dim
            if dense_threshold and self.csr.n_rows * bx <= dense_threshold:
                self._device_op = csr_to_dense_op(self.csr, dtype=mat_dt)
            elif spmv_impl in ("AUTO", "PALLAS"):
                # fastest-first: DIA (stencil shift-FMA) -> tile-aligned
                # band strips (MXU) -> lane-binned gather (general
                # sparsity, TPU; covers BSR via scalar expansion and
                # complex via two value planes) -> padded-ELL fallback
                op = None
                if (bx, bx) == (1, 1):
                    from .ops.spmv import csr_to_dia
                    from .ops.band import csr_to_band
                    op = csr_to_dia(self.csr, dtype=mat_dt)
                    if op is None:
                        op = csr_to_band(self.csr, dtype=mat_dt)
                if op is None and jax.default_backend() == "tpu":
                    from .ops.gather_spmv import csr_to_gather
                    op = csr_to_gather(self.csr, dtype=mat_dt)
                self._device_op = op if op is not None else \
                    csr_to_ell(self.csr, dtype=mat_dt)
            else:
                self._device_op = csr_to_ell(self.csr, dtype=mat_dt)
        return self._device_op

    @property
    def n_rows(self):
        return self.csr.n_rows

    @property
    def shape(self):
        return self.csr.shape

    @property
    def block_dim(self):
        return self.csr.block_dim

    def __repr__(self):
        return f"Matrix(mode={self.mode}, csr={self.csr!r})"
