"""Matrix container tests (mirrors base/tests/matrix_tests.cu,
vector_tests.cu, generated_matrix_io.cu)."""

import numpy as np
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix, csr_to_ell, csr_to_dense_op
from amgx_tpu.ops.spmv import csr_to_dia


def _rand_csr(rng, n=37, density=0.2):
    dense = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    np.fill_diagonal(dense, rng.standard_normal(n) + 5)
    return CSRMatrix.from_dense(dense), dense


def test_from_coo_sums_duplicates():
    m = CSRMatrix.from_coo(2, 2, [0, 0, 1], [1, 1, 0], [1.0, 2.0, 5.0])
    assert m.nnz == 2
    assert m.to_dense()[0, 1] == 3.0


def test_csr_scipy_roundtrip(rng):
    m, dense = _rand_csr(rng)
    assert np.allclose(m.to_scipy().toarray(), dense)
    m2 = CSRMatrix.from_scipy(m.to_scipy())
    assert np.allclose(m2.to_dense(), dense)


def test_transpose(rng):
    m, dense = _rand_csr(rng)
    assert np.allclose(m.transpose().to_dense(), dense.T)


def test_block_transpose(rng):
    data = rng.standard_normal((3, 2, 2))
    m = CSRMatrix.from_coo(2, 2, [0, 0, 1], [0, 1, 1], data,
                           block_dim=(2, 2))
    t = m.transpose()
    assert np.allclose(t.to_dense(), m.to_dense().T)


def test_ell_roundtrip(rng):
    m, dense = _rand_csr(rng)
    ell = csr_to_ell(m)
    x = rng.standard_normal(ell.n_pad)
    x[m.n_rows:] = 0
    import jax.numpy as jnp
    y = np.asarray(ell.apply(jnp.asarray(x)))
    assert np.allclose(y[:m.n_rows], dense @ x[:m.n_rows])
    assert np.all(y[m.n_rows:] == 0)          # padding invariant


def test_external_diag():
    # DIAG property: diagonal stored separately (matrix.h DIAG prop)
    m = CSRMatrix(2, 2, [0, 1, 2], [1, 0], np.array([2.0, 3.0]),
                  diag_data=np.array([7.0, 8.0]))
    assert np.allclose(m.to_dense(), [[7, 2], [3, 8]])
    assert np.allclose(m.diagonal(), [7, 8])
    ell = csr_to_ell(m)
    import jax.numpy as jnp
    y = np.asarray(ell.apply(jnp.asarray(np.array([1.0, 1.0] + [0] * 6))))
    assert np.allclose(y[:2], [9.0, 11.0])


def test_dia_conversion():
    a = amgx.gallery.poisson5pt(8, 8)
    dia = csr_to_dia(a)
    assert dia is not None
    assert len(dia.offsets) == 5
    import jax.numpy as jnp
    x = np.zeros(dia.n_pad)
    x[:64] = np.arange(64)
    y = np.asarray(dia.apply(jnp.asarray(x)))
    assert np.allclose(y[:64], a.to_scipy() @ x[:64])


def test_dense_op(rng):
    m, dense = _rand_csr(rng, n=10)
    op = csr_to_dense_op(m)
    import jax.numpy as jnp
    x = np.zeros(op.a.shape[0])
    x[:10] = rng.standard_normal(10)
    y = np.asarray(op.apply(jnp.asarray(x)))
    assert np.allclose(y[:10], dense @ x[:10])


def test_mode_dtypes():
    from amgx_tpu.matrix import mode_dtypes
    v, m = mode_dtypes("dDDI")
    assert v == np.float64 and m == np.float64
    v, m = mode_dtypes("dDFI")
    assert v == np.float64 and m == np.float32
    v, m = mode_dtypes("dFFI")
    assert v == np.float32 and m == np.float32


def test_matrix_market_roundtrip(tmp_path, rng):
    m, dense = _rand_csr(rng, n=12)
    rhs = rng.standard_normal(12)
    sol = rng.standard_normal(12)
    p = str(tmp_path / "sys.mtx")
    amgx.io.write_system(p, m, rhs, sol)
    m2, rhs2, sol2 = amgx.io.read_system(p)
    assert np.allclose(m2.to_dense(), dense)
    assert np.allclose(rhs2, rhs)
    assert np.allclose(sol2, sol)


def test_matrix_market_symmetric(tmp_path):
    p = tmp_path / "sym.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real symmetric\n"
                 "3 3 4\n1 1 2.0\n2 1 -1.0\n2 2 2.0\n3 3 1.0\n")
    m, _, _ = amgx.io.read_system(str(p))
    d = m.to_dense()
    assert np.allclose(d, d.T)
    assert d[0, 1] == -1.0 and d[1, 0] == -1.0


def test_upload_replace_lifecycle():
    a = amgx.gallery.poisson5pt(4, 4)
    m = amgx.Matrix(mode="dDDI")
    m.upload(a.n_rows, a.nnz, a.indptr, a.indices, a.data)
    assert m.initialized
    op1 = m.device_op()
    m.replace_coefficients(a.data * 3.0)
    op2 = m.device_op()
    assert op2 is not op1
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op1.n_pad))
    assert np.allclose(np.asarray(op2.apply(x)),
                       3.0 * np.asarray(op1.apply(x)))


def test_binary_io_roundtrip(tmp_path, rng):
    from amgx_tpu.io import read_system_binary, write_system_binary
    m, dense = _rand_csr(rng, n=20)
    rhs = rng.standard_normal(20)
    sol = rng.standard_normal(20)
    p = str(tmp_path / "sys.bin")
    write_system_binary(p, m, rhs, sol)
    m2, rhs2, sol2 = read_system_binary(p)
    assert np.allclose(m2.to_dense(), dense)
    assert np.allclose(rhs2, rhs) and np.allclose(sol2, sol)
    # block + external diag
    data = rng.standard_normal((3, 2, 2))
    mb = CSRMatrix.from_coo(2, 2, [0, 0, 1], [0, 1, 1], data,
                            block_dim=(2, 2))
    mb.diag_data = rng.standard_normal((2, 2, 2))
    write_system_binary(p, mb)
    mb2, _, _ = read_system_binary(p)
    assert np.allclose(mb2.to_dense(), mb.to_dense())


def test_matrix_analysis():
    from amgx_tpu.matrix_analysis import analyze, analysis_string
    import amgx_tpu as amgx
    a = amgx.gallery.poisson5pt(8, 8)
    rep = analyze(a, spectral=True)
    assert rep["n_rows"] == 64
    assert rep["symmetric_pattern"]
    assert rep["zero_diagonal_rows"] == 0
    assert rep["eig_min"] > 0          # SPD
    assert "Matrix analysis" in analysis_string(a)


def test_diag_property_solves_true_operator():
    """A DIAG-property matrix (external diagonal side array, matrix.h:44)
    must solve the FULL operator through every layout — the DIA layout
    used to drop the external diagonal silently (the solve converged on
    the diagless system)."""
    import amgx_tpu as amgx
    base = amgx.gallery.poisson5pt(10, 10)
    n = base.n_rows
    rows = np.repeat(np.arange(n), base.row_nnz())
    offd = base.indices != rows
    od = CSRMatrix.from_coo(n, n, rows[offd],
                            base.indices[offd].astype(np.int64),
                            base.data[offd])
    a = CSRMatrix(n, n, od.indptr, od.indices, od.data,
                  diag_data=base.diagonal())
    # to_scipy includes the external diagonal
    assert np.abs((a.to_scipy() - base.to_scipy()).toarray()).max() == 0
    # the DIA layout folds it
    from amgx_tpu.ops.spmv import csr_to_dia
    dia = csr_to_dia(a)
    assert dia is not None
    import jax.numpy as jnp
    v = np.random.default_rng(0).standard_normal(n)
    vp = jnp.asarray(np.pad(v, (0, dia.n_pad - n)))
    from amgx_tpu.ops.spmv import dia_spmv
    y = np.asarray(dia_spmv(dia, vp))[:n]
    assert np.allclose(y, base.to_scipy() @ v)
    # end-to-end: DILU-preconditioned solve converges on the true system
    cfg = amgx.AMGConfig(
        "config_version=2, solver=FGMRES, preconditioner=MULTICOLOR_DILU, "
        "max_iters=100, tolerance=1e-9, convergence=RELATIVE_INI, "
        "monitor_residual=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(a))
    b = np.ones(n)
    x, st = s.solve(b)
    rel = np.linalg.norm(b - base.to_scipy() @ s.extract_vector(x))
    assert st == 0 and rel < 1e-7 and s.last_iters < 40
