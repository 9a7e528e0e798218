"""Matrix structure/spectral diagnostics.

Replaces core/include/matrix_analysis.h / core/src/matrix_analysis.cu: quick
host-side structure and conditioning reports used when debugging solver
behavior on a new system.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .matrix import CSRMatrix


def analyze(csr: CSRMatrix, spectral: bool = False) -> Dict:
    n = csr.n_rows
    rn = csr.row_nnz()
    data = csr.data if csr.block_dim == (1, 1) else \
        np.linalg.norm(csr.data, axis=(1, 2))
    rows = np.repeat(np.arange(n), rn)
    diag_mask = csr.indices == rows
    diag = np.zeros(n)
    diag[rows[diag_mask]] = data[diag_mask]
    offsum = np.zeros(n)
    np.add.at(offsum, rows[~diag_mask], np.abs(data[~diag_mask]))
    report = {
        "n_rows": n,
        "nnz": csr.nnz,
        "block_dim": csr.block_dim,
        "avg_nnz_per_row": float(rn.mean()) if n else 0.0,
        "max_nnz_per_row": int(rn.max()) if n else 0,
        "min_nnz_per_row": int(rn.min()) if n else 0,
        "empty_rows": int((rn == 0).sum()),
        "zero_diagonal_rows": int((diag == 0).sum()),
        "diagonally_dominant_rows": int((np.abs(diag) >= offsum).sum()),
        "bandwidth": int(np.abs(csr.indices - rows).max()) if csr.nnz
        else 0,
        "symmetric_pattern": _symmetric_pattern(csr),
        "value_range": (float(np.abs(data).min(initial=0.0)),
                        float(np.abs(data).max(initial=0.0))),
    }
    if spectral and n <= 2000:
        dense = csr.to_dense()
        sym = np.allclose(dense, dense.T, rtol=1e-10)
        report["symmetric_values"] = bool(sym)
        ev = np.linalg.eigvalsh(dense) if sym else np.linalg.eigvals(dense)
        report["eig_min"] = float(np.min(np.real(ev)))
        report["eig_max"] = float(np.max(np.real(ev)))
        small = max(abs(report["eig_min"]), 1e-300)
        report["cond_estimate"] = abs(report["eig_max"]) / small
    return report


def _symmetric_pattern(csr: CSRMatrix) -> bool:
    import scipy.sparse as sp
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    a = sp.csr_matrix((np.ones(csr.nnz), (rows, csr.indices)),
                      shape=csr.shape)
    return bool((a != a.T).nnz == 0) if csr.n_rows == csr.n_cols else False


def analysis_string(csr: CSRMatrix, spectral: bool = False) -> str:
    rep = analyze(csr, spectral)
    lines = ["Matrix analysis:"]
    for k, v in rep.items():
        lines.append(f"  {k:<26s} {v}")
    return "\n".join(lines)
