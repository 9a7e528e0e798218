"""NVAMG binary format + complex IO + K1..K4 complex_conversion tests.

Byte-level parity with the reference's on-disk binary layout
(matrix_io.cu writeSystemBinary:270-397, readers.cu ReadNVAMGBinary) and
the equivalent-real-formulation conversions (readers.cu:244-476).
"""

import struct

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.io import (read_system, write_system_binary,
                         read_system_binary, write_matrix_market,
                         read_matrix_market, convert_complex_system)


def _rand_complex_csr(rng, n=24, density=0.2):
    dense = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    mask = rng.random((n, n)) < density
    np.fill_diagonal(mask, True)
    dense = dense * mask
    dense += np.diag(np.full(n, 4.0 + 0j))     # keep it nonsingular
    import scipy.sparse as sp
    s = sp.csr_matrix(dense)
    return CSRMatrix(n, n, s.indptr.astype(np.int64),
                     s.indices.astype(np.int64), s.data), dense


def test_nvamg_binary_header_layout(tmp_path, rng):
    """The written file must be the reference's exact byte layout."""
    a = amgx.gallery.poisson5pt(6, 6)
    rhs = rng.standard_normal(a.n_rows)
    p = str(tmp_path / "s.bin")
    write_system_binary(p, a, rhs)
    raw = open(p, "rb").read()
    assert raw[:14] == b"%%NVAMGBinary\n"
    flags = struct.unpack("<9I", raw[14:50])
    # is_mtx, is_rhs, is_soln, fmt(CSR=0), diag, bx, by, rows, nnz
    assert flags == (1, 1, 0, 0, 0, 1, 1, a.n_rows, a.nnz)
    off = 50
    indptr = np.frombuffer(raw[off:off + 4 * (a.n_rows + 1)], "<i4")
    assert np.array_equal(indptr, a.indptr)
    off += 4 * (a.n_rows + 1) + 4 * a.nnz
    vals = np.frombuffer(raw[off:off + 8 * a.nnz], "<f8")
    assert np.allclose(vals, a.data)
    off += 8 * a.nnz
    assert np.allclose(np.frombuffer(raw[off:off + 8 * a.n_rows], "<f8"),
                       rhs)
    assert len(raw) == off + 8 * a.n_rows


def test_nvamg_binary_roundtrip_sniffed(tmp_path, rng):
    a = amgx.gallery.poisson7pt(5, 5, 5)
    rhs = rng.standard_normal(a.n_rows)
    sol = rng.standard_normal(a.n_rows)
    p = str(tmp_path / "s.bin")
    write_system_binary(p, a, rhs, sol)
    m2, r2, s2 = read_system(p)     # header-sniffed dispatch
    assert np.allclose(m2.to_dense(), a.to_dense())
    assert np.allclose(r2, rhs) and np.allclose(s2, sol)


def test_nvamg_binary_complex_and_diag(tmp_path, rng):
    m, dense = _rand_complex_csr(rng, n=16)
    p = str(tmp_path / "c.bin")
    rhs = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    write_system_binary(p, m, rhs)
    raw = open(p, "rb").read()
    fmt = struct.unpack("<9I", raw[14:50])[3]
    assert fmt == 16                # matrix.h COMPLEX prop flag
    m2, r2, _ = read_system_binary(p)
    assert np.iscomplexobj(m2.data)
    assert np.allclose(m2.to_dense(), dense)
    assert np.allclose(r2, rhs)
    # external diagonal appended after nnz values (writer :351)
    a = amgx.gallery.poisson5pt(4, 4)
    a.diag_data = rng.standard_normal(a.n_rows)
    pd = str(tmp_path / "d.bin")
    write_system_binary(pd, a)
    a2, _, _ = read_system_binary(pd)
    assert a2.diag_data is not None
    assert np.allclose(a2.to_dense(), a.to_dense())


def test_matrix_market_complex_roundtrip(tmp_path, rng):
    m, dense = _rand_complex_csr(rng, n=12)
    rhs = rng.standard_normal(12) + 1j * rng.standard_normal(12)
    p = str(tmp_path / "c.mtx")
    write_matrix_market(p, m, rhs)
    head = open(p).readline()
    assert "complex" in head
    m2, r2, _ = read_matrix_market(p)
    assert np.allclose(m2.to_dense(), dense)
    assert np.allclose(r2, rhs)


@pytest.mark.parametrize("mode", [1, 2, 3, 4, 221, 222, 223, 224])
def test_complex_conversion_solution_maps(mode, rng):
    """If A x = b in complex arithmetic, the converted real system must
    satisfy A_real x_real = b_real with the mode's embeddings
    (readers.cu:286-366, 508-620)."""
    m, dense = _rand_complex_csr(rng, n=18)
    x = rng.standard_normal(18) + 1j * rng.standard_normal(18)
    b = dense @ x
    mr, br, xr = convert_complex_system(m, b, x, mode)
    if mode > 220:
        assert mr.block_dim == (2, 2) and mr.n_rows == 18
    else:
        assert mr.block_dim == (1, 1) and mr.n_rows == 36
    d = mr.to_dense()
    assert np.allclose(d @ xr, br, atol=1e-12)
    # the ERF must be nonsingular iff A is
    assert np.linalg.matrix_rank(d) == d.shape[0]


def test_complex_conversion_via_capi(tmp_path, rng):
    """Reference flow: complex file + real mode + complex_conversion=1 ->
    solve the ERF, recover the complex solution from the stacked halves."""
    from amgx_tpu import capi
    m, dense = _rand_complex_csr(rng, n=20)
    # hermitian positive definite so PCG applies: A^H A + I
    hpd = dense.conj().T @ dense + 2.0 * np.eye(20)
    import scipy.sparse as sp
    s = sp.csr_matrix(hpd)
    mc = CSRMatrix(20, 20, s.indptr.astype(np.int64),
                   s.indices.astype(np.int64), s.data)
    xtrue = rng.standard_normal(20) + 1j * rng.standard_normal(20)
    b = hpd @ xtrue
    p = str(tmp_path / "sys.mtx")
    write_matrix_market(p, mc, b)
    _, cfg = capi.AMGX_config_create(
        "config_version=2, solver=GMRES, max_iters=400, tolerance=1e-10, "
        "convergence=RELATIVE_INI, monitor_residual=1, "
        "complex_conversion=1, gmres_n_restart=60")
    _, rsrc = capi.AMGX_resources_create_simple(cfg)
    _, mh = capi.AMGX_matrix_create(rsrc, "dDDI")
    _, bh = capi.AMGX_vector_create(rsrc, "dDDI")
    _, xh = capi.AMGX_vector_create(rsrc, "dDDI")
    capi.AMGX_read_system(mh, bh, xh, p)
    assert mh.csr.n_rows == 40 and not np.iscomplexobj(mh.csr.data)
    _, sh = capi.AMGX_solver_create(rsrc, "dDDI", cfg)
    capi.AMGX_solver_setup(sh, mh)
    capi.AMGX_solver_solve_with_0_initial_guess(sh, bh, xh)
    _, xflat = capi.AMGX_vector_download(xh)
    xc = xflat[:20] + 1j * xflat[20:]        # K1: x = (Re x, Im x)
    assert np.linalg.norm(hpd @ xc - b) / np.linalg.norm(b) < 1e-7
