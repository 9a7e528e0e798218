"""NVAMG binary system IO — on-disk compatible with the reference.

Implements the reference's binary format byte-for-byte
(base/src/matrix_io.cu writeSystemBinary:270-397, reader
core/src/readers.cu ReadNVAMGBinary::read):

    "%%NVAMGBinary\\n"                                   14 bytes
    uint32[9]: is_mtx, is_rhs, is_soln, matrix_format,
               has_diag, block_dimx, block_dimy, num_rows, num_nz
    int32  row_offsets[num_rows + 1]
    int32  col_indices[num_nz]
    f64/c128 values[bx * by * (num_nz + has_diag * num_rows)]
             (external-diag blocks appended after the nnz blocks)
    f64/c128 rhs[num_rows * bx]        if is_rhs
    f64/c128 sol[num_rows * bx]        if is_soln

matrix_format: 0 = CSR, 1 = COO (write/read CSR only, like the
reference reader), +16 (matrix.h COMPLEX prop) for complex values.
Values are stored in the "uptype" — double / complex double — whatever
the in-memory precision (writeSystemBinary tempv). Legacy files written
by earlier versions of this package (magic "AMGXTPUB") are still read.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from ..matrix import CSRMatrix

_NVAMG_MAGIC = b"%%NVAMGBinary\n"
_LEGACY_MAGIC = b"AMGXTPUB"
_FMT_COO = 1
_FMT_COMPLEX = 16          # matrix.h:51 COMPLEX prop value


def write_system_binary(path: str, m: CSRMatrix,
                        rhs: Optional[np.ndarray] = None,
                        sol: Optional[np.ndarray] = None) -> None:
    bx, by = m.block_dim
    is_complex = np.iscomplexobj(m.data)
    vdt = "<c16" if is_complex else "<f8"
    fmt = _FMT_COMPLEX if is_complex else 0
    with open(path, "wb") as f:
        f.write(_NVAMG_MAGIC)
        f.write(struct.pack(
            "<9I", 1, int(rhs is not None), int(sol is not None), fmt,
            int(m.diag_data is not None), bx, by, m.n_rows, m.nnz))
        f.write(np.asarray(m.indptr, "<i4").tobytes())
        f.write(np.asarray(m.indices, "<i4").tobytes())
        f.write(np.asarray(m.data, vdt).tobytes())
        if m.diag_data is not None:
            f.write(np.asarray(m.diag_data, vdt).tobytes())
        if rhs is not None:
            f.write(np.asarray(rhs, vdt).tobytes())
        if sol is not None:
            f.write(np.asarray(sol, vdt).tobytes())


def _read_legacy(f) -> Tuple[CSRMatrix, Optional[np.ndarray],
                             Optional[np.ndarray]]:
    version, flags, n_rows, n_cols, nnz, bx, by = struct.unpack(
        "<iiqqqii", f.read(struct.calcsize("<iiqqqii")))
    if version != 1:
        raise ValueError(f"unsupported legacy binary version {version}")
    indptr = np.frombuffer(f.read(8 * (n_rows + 1)), "<i8")
    indices = np.frombuffer(f.read(4 * nnz), "<i4")
    nvals = nnz * bx * by
    data = np.frombuffer(f.read(8 * nvals), "<f8")
    if (bx, by) != (1, 1):
        data = data.reshape(nnz, bx, by)
    diag = None
    if flags & 4:
        diag = np.frombuffer(f.read(8 * n_rows * bx * by), "<f8")
        if (bx, by) != (1, 1):
            diag = diag.reshape(n_rows, bx, by)
    m = CSRMatrix(n_rows, n_cols, indptr.copy(), indices.copy(),
                  data.copy(), block_dim=(bx, by),
                  diag_data=None if diag is None else diag.copy())
    nb = n_rows * bx
    rhs = sol = None
    if flags & 1:
        rhs = np.frombuffer(f.read(8 * nb), "<f8").copy()
    if flags & 2:
        sol = np.frombuffer(f.read(8 * nb), "<f8").copy()
    return m, rhs, sol


def read_system_binary(path: str) -> Tuple[CSRMatrix,
                                           Optional[np.ndarray],
                                           Optional[np.ndarray]]:
    with open(path, "rb") as f:
        magic = f.read(len(_NVAMG_MAGIC))
        if magic[:8] == _LEGACY_MAGIC:
            f.seek(8)
            return _read_legacy(f)
        if magic != _NVAMG_MAGIC:
            raise ValueError(f"{path}: not an NVAMG binary system file")
        (_is_mtx, is_rhs, is_soln, fmt, has_diag, bx, by, n_rows,
         nnz) = struct.unpack("<9I", f.read(36))
        if fmt & _FMT_COO:
            # reference reader: readers.cu "COO matrix binary format is
            # not supported for reading"
            raise ValueError(f"{path}: COO binary format not supported")
        vdt = "<c16" if fmt & _FMT_COMPLEX else "<f8"
        vsz = 16 if fmt & _FMT_COMPLEX else 8
        indptr = np.frombuffer(f.read(4 * (n_rows + 1)), "<i4")
        indices = np.frombuffer(f.read(4 * nnz), "<i4")
        bsz = bx * by
        data = np.frombuffer(f.read(vsz * nnz * bsz), vdt)
        if (bx, by) != (1, 1):
            data = data.reshape(nnz, bx, by)
        diag = None
        if has_diag:
            diag = np.frombuffer(f.read(vsz * n_rows * bsz), vdt)
            if (bx, by) != (1, 1):
                diag = diag.reshape(n_rows, bx, by)
        m = CSRMatrix(n_rows, n_rows, indptr.astype(np.int64),
                      indices.copy(), data.copy(), block_dim=(bx, by),
                      diag_data=None if diag is None else diag.copy())
        nb = n_rows * bx
        rhs = sol = None
        if is_rhs:
            rhs = np.frombuffer(f.read(vsz * nb), vdt).copy()
        if is_soln:
            sol = np.frombuffer(f.read(vsz * nb), vdt).copy()
        return m, rhs, sol
