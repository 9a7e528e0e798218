"""MatrixMarket IO with the reference's %%NVAMG extensions.

Replaces base/src/matrix_io.cu (readers/writers registered in
core.cu:571-575). Supports:
  * standard coordinate real/pattern/symmetric files,
  * the %%NVAMG extension line declaring embedded rhs / solution vectors and
    block sizes / external diagonal (matrix_io.cu ReadNVAMGFormat),
  * round-tripping matrix + rhs + solution via write_system/read_system
    (reference: AMGX_write_system / AMGX_read_system, amgx_c.h:441-473).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..matrix import CSRMatrix


def read_matrix_market(path: str):
    """Returns (CSRMatrix, rhs or None, sol or None)."""
    with open(path) as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        tokens = header.split()
        fmt = tokens[2] if len(tokens) > 2 else "coordinate"
        field = tokens[3] if len(tokens) > 3 else "real"
        symmetry = tokens[4] if len(tokens) > 4 else "general"
        nv_flags = []
        block_dims = (1, 1)
        line = f.readline()
        while line and (line.startswith("%") or not line.strip()):
            if line.startswith("%%NVAMG") or line.startswith("%%AMGX"):
                nv_flags = line.split()[1:]
            line = f.readline()
        sizes = line.split()
        if fmt == "array":
            raise ValueError("array-format MatrixMarket not supported")
        n_rows, n_cols, nnz = int(sizes[0]), int(sizes[1]), int(sizes[2])
        has_rhs = "rhs" in nv_flags
        has_sol = "solution" in nv_flags or "sol" in nv_flags
        for flag in nv_flags:
            if flag.startswith("blockdim"):
                parts = flag.split("=")[1].split("x")
                block_dims = (int(parts[0]), int(parts[1]))
        is_complex = field == "complex"
        rows = np.empty(nnz, np.int64)
        cols = np.empty(nnz, np.int64)
        vals = np.empty(nnz, np.complex128 if is_complex else np.float64)
        pattern = field == "pattern"
        k = 0
        rest = []
        for line in f:
            s = line.split()
            if not s or s[0].startswith("%"):
                continue
            if k < nnz:
                rows[k] = int(s[0]) - 1
                cols[k] = int(s[1]) - 1
                vals[k] = (1.0 if pattern else
                           complex(float(s[2]), float(s[3]))
                           if is_complex else float(s[2]))
                k += 1
            else:
                # trailing embedded vectors (rhs/solution) start here
                rest.extend(float(t) for t in s)
        if k != nnz:
            raise ValueError(f"{path}: expected {nnz} entries, found {k}")
        rhs = sol = None
        nb = n_rows * block_dims[0]
        if is_complex:
            # embedded complex vectors: two floats (re im) per entry
            rest = list(np.asarray(rest[:len(rest) // 2 * 2],
                                   np.float64).reshape(-1, 2)
                        .view(np.complex128).ravel())
        if has_rhs:
            rhs = np.array(rest[:nb])
            rest = rest[nb:]
        if has_sol:
            sol = np.array(rest[:nb])
        if symmetry in ("symmetric", "skew-symmetric", "hermitian"):
            off = rows != cols
            sgn = -1.0 if symmetry == "skew-symmetric" else 1.0
            mirrored = vals[off]
            if symmetry == "hermitian":
                mirrored = np.conj(mirrored)
            rows = np.concatenate([rows, cols[off]])
            cols2 = np.concatenate([cols, rows[:nnz][off]])
            vals = np.concatenate([vals, sgn * mirrored])
            cols = cols2
        if block_dims != (1, 1):
            bx, by = block_dims
            # scalar entries are per block element: rows/cols are in scalar
            # numbering; regroup into blocks
            brows, bcols = rows // bx, cols // by
            ii, jj = rows % bx, cols % by
            order = np.lexsort((jj, ii, bcols, brows))
            key = brows * n_cols + bcols
            uniq, inv = np.unique(key[order], return_inverse=True)
            data = np.zeros((uniq.size, bx, by), vals.dtype)
            data[inv, ii[order], jj[order]] = vals[order]
            m = CSRMatrix.from_coo(n_rows // bx, n_cols // by,
                                   uniq // n_cols, uniq % n_cols, data,
                                   block_dim=block_dims, sum_duplicates=False)
            return m, rhs, sol
        m = CSRMatrix.from_coo(n_rows, n_cols, rows, cols, vals)
        return m, rhs, sol


def write_matrix_market(path: str, m: CSRMatrix,
                        rhs: Optional[np.ndarray] = None,
                        sol: Optional[np.ndarray] = None) -> None:
    m = m.fold_diagonal()    # DIAG property is in-memory storage detail
    bx, by = m.block_dim
    is_complex = np.iscomplexobj(m.data)

    def _num(v) -> str:
        if is_complex:
            v = complex(v)
            return f"{v.real!r} {v.imag!r}"
        return repr(float(v))

    with open(path, "w") as f:
        f.write(f"%%MatrixMarket matrix coordinate "
                f"{'complex' if is_complex else 'real'} general\n")
        flags = []
        if rhs is not None:
            flags.append("rhs")
        if sol is not None:
            flags.append("solution")
        if (bx, by) != (1, 1):
            flags.append(f"blockdim={bx}x{by}")
        if flags:
            f.write("%%NVAMG " + " ".join(flags) + "\n")
        if (bx, by) == (1, 1):
            f.write(f"{m.n_rows} {m.n_cols} {m.nnz}\n")
            rows = np.repeat(np.arange(m.n_rows), m.row_nnz())
            for i, j, v in zip(rows, m.indices, m.data):
                f.write(f"{i + 1} {j + 1} {_num(v)}\n")
        else:
            f.write(f"{m.n_rows * bx} {m.n_cols * by} {m.nnz * bx * by}\n")
            rows = np.repeat(np.arange(m.n_rows), m.row_nnz())
            for k, (i, j) in enumerate(zip(rows, m.indices)):
                for ii in range(bx):
                    for jj in range(by):
                        f.write(f"{i * bx + ii + 1} {j * by + jj + 1} "
                                f"{_num(m.data[k, ii, jj])}\n")
        for vec in (rhs, sol):
            if vec is not None:
                for v in np.asarray(vec).ravel():
                    f.write(f"{_num(v)}\n")


def read_system(path: str, complex_conversion: int = 0):
    """AMGX_read_system equivalent: returns (matrix, rhs, sol); absent
    vectors are returned as None. The format is sniffed from the file
    header (the reference's reader registry dispatches MatrixMarket vs
    NVAMG binary the same way, matrix_io.cu:118). A non-zero
    ``complex_conversion`` rewrites a complex system as its K1..K4 real
    equivalent (core.cu:381, readers.cu:244-476)."""
    with open(path, "rb") as f:
        head = f.read(14)
    if head[:8] == b"AMGXTPUB" or head == b"%%NVAMGBinary\n":
        from .binary import read_system_binary
        m, rhs, sol = read_system_binary(path)
    else:
        m, rhs, sol = read_matrix_market(path)
    if complex_conversion and np.iscomplexobj(m.data):
        from .complex_conversion import convert_complex_system
        m, rhs, sol = convert_complex_system(m.fold_diagonal(), rhs, sol,
                                             complex_conversion)
    return m, rhs, sol


def write_system(path: str, m: CSRMatrix, rhs=None, sol=None) -> None:
    write_matrix_market(path, m, rhs, sol)
