"""Binary system IO.

Replaces the reference's NVAMG binary reader/writer (base/src/matrix_io.cu
ReadNVAMGBinary / binary writer registered in core.cu:571-575): a compact
header + raw little-endian arrays, round-tripping matrix (+ optional
external diagonal, block dims) with embedded rhs/solution. The on-disk
layout is our own (the reference's is CUDA-struct-packed); semantics match.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from ..matrix import CSRMatrix

_MAGIC = b"AMGXTPUB"
_VERSION = 1


def write_system_binary(path: str, m: CSRMatrix,
                        rhs: Optional[np.ndarray] = None,
                        sol: Optional[np.ndarray] = None) -> None:
    bx, by = m.block_dim
    flags = ((1 if rhs is not None else 0)
             | (2 if sol is not None else 0)
             | (4 if m.diag_data is not None else 0))
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<iiqqqii", _VERSION, flags, m.n_rows,
                            m.n_cols, m.nnz, bx, by))
        f.write(np.asarray(m.indptr, "<i8").tobytes())
        f.write(np.asarray(m.indices, "<i4").tobytes())
        f.write(np.asarray(m.data, "<f8").tobytes())
        if m.diag_data is not None:
            f.write(np.asarray(m.diag_data, "<f8").tobytes())
        if rhs is not None:
            f.write(np.asarray(rhs, "<f8").tobytes())
        if sol is not None:
            f.write(np.asarray(sol, "<f8").tobytes())


def read_system_binary(path: str) -> Tuple[CSRMatrix,
                                           Optional[np.ndarray],
                                           Optional[np.ndarray]]:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an amgx_tpu binary system file")
        version, flags, n_rows, n_cols, nnz, bx, by = struct.unpack(
            "<iiqqqii", f.read(struct.calcsize("<iiqqqii")))
        if version != _VERSION:
            raise ValueError(f"{path}: unsupported version {version}")
        indptr = np.frombuffer(f.read(8 * (n_rows + 1)), "<i8")
        indices = np.frombuffer(f.read(4 * nnz), "<i4")
        nvals = nnz * bx * by
        data = np.frombuffer(f.read(8 * nvals), "<f8")
        if (bx, by) != (1, 1):
            data = data.reshape(nnz, bx, by)
        diag = None
        if flags & 4:
            nd = n_rows * bx * by
            diag = np.frombuffer(f.read(8 * nd), "<f8")
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
