"""Kernel golden tests vs scipy (mirrors base/tests/csr_multiply.cu,
matrix_vector_multiply_tests.cu, norm_tests.cu, truncate_count_test.cu)."""

import numpy as np
import jax.numpy as jnp
import pytest

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix, csr_to_ell
from amgx_tpu.ops import blas
from amgx_tpu.ops.spgemm import (csr_spgemm, galerkin_product, csr_add,
                                 aggregation_galerkin, sparsity_ilu1)


def _rand_csr(rng, n, m=None, density=0.15):
    m = m or n
    dense = rng.standard_normal((n, m)) * (rng.random((n, m)) < density)
    return CSRMatrix.from_dense(dense), dense


def test_spgemm_vs_scipy(rng):
    a, da = _rand_csr(rng, 40, 30)
    b, db = _rand_csr(rng, 30, 50)
    c = csr_spgemm(a, b)
    assert np.allclose(c.to_dense(), da @ db)


def test_spgemm_empty():
    a = CSRMatrix.from_coo(3, 3, [], [], np.zeros(0))
    b = CSRMatrix.from_coo(3, 3, [0], [0], [1.0])
    c = csr_spgemm(a, b)
    assert c.nnz == 0


def test_galerkin_product(rng):
    a, da = _rand_csr(rng, 20)
    p, dp = _rand_csr(rng, 20, 8, density=0.3)
    r = p.transpose()
    rap = galerkin_product(r, a, p)
    assert np.allclose(rap.to_dense(), dp.T @ da @ dp)


def test_aggregation_galerkin(rng):
    a, da = _rand_csr(rng, 12)
    agg = np.array([0, 0, 1, 1, 2, 2, 0, 1, 2, 3, 3, 3])
    ac = aggregation_galerkin(a, agg, 4)
    # reference: Ac[I,J] = sum over members
    q = np.zeros((12, 4))
    q[np.arange(12), agg] = 1.0
    assert np.allclose(ac.to_dense(), q.T @ da @ q)


def test_csr_add(rng):
    a, da = _rand_csr(rng, 15)
    b, db = _rand_csr(rng, 15)
    assert np.allclose(csr_add(a, b).to_dense(), da + db)


def test_sparsity_ilu1():
    a = amgx.gallery.poisson5pt(5, 5)
    ext = sparsity_ilu1(a)
    # ILU(1) pattern includes A's pattern with original values
    assert ext.nnz >= a.nnz
    sub = ext.to_dense()
    assert np.allclose(sub[np.abs(a.to_dense()) > 0],
                       a.to_dense()[np.abs(a.to_dense()) > 0])


def test_norms():
    x = jnp.asarray(np.array([3.0, -4.0, 0.0, 0.0]))
    assert np.isclose(float(blas.nrm2(x)), 5.0)
    assert np.isclose(float(blas.nrm1(x)), 7.0)
    assert np.isclose(float(blas.nrmmax(x)), 4.0)
    assert np.isclose(float(blas.get_norm(x, "L2")), 5.0)


def test_block_norms():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0]))
    n = blas.get_norm(x, "L2", block_dim=2, use_scalar=False)
    assert np.allclose(np.asarray(n), [np.sqrt(10.0), np.sqrt(20.0)])


def test_block_spmv(rng):
    data = rng.standard_normal((4, 3, 3))
    m = CSRMatrix.from_coo(3, 3, [0, 0, 1, 2], [0, 2, 1, 2], data,
                           block_dim=(3, 3))
    ell = csr_to_ell(m)
    x = np.zeros(ell.n_pad * 3)
    x[:9] = rng.standard_normal(9)
    y = np.asarray(ell.apply(jnp.asarray(x)))
    assert np.allclose(y[:9], m.to_dense() @ x[:9])


def test_spmv_large_random(rng):
    a, da = _rand_csr(rng, 200, density=0.05)
    ell = csr_to_ell(a)
    x = np.zeros(ell.n_pad)
    x[:200] = rng.standard_normal(200)
    y = np.asarray(ell.apply(jnp.asarray(x)))
    assert np.allclose(y[:200], da @ x[:200])


def test_truncate_interpolation():
    from amgx_tpu.amg.classical import truncate_interpolation
    p = CSRMatrix.from_coo(2, 3, [0, 0, 0, 1], [0, 1, 2, 0],
                           [1.0, 0.01, 0.5, 1.0])
    t = truncate_interpolation(p, factor=0.1)
    assert t.nnz == 3
    # row sums preserved
    assert np.allclose(t.to_dense().sum(axis=1), p.to_dense().sum(axis=1))
    t2 = truncate_interpolation(p, max_elements=1)
    assert np.all(t2.row_nnz() <= 1)
    assert np.allclose(t2.to_dense().sum(axis=1), p.to_dense().sum(axis=1))


def test_gaussian_elimination_small():
    """Tiny dense solve path (reference: base/src/gaussian_elimination.cu
    used by Cycle_Base::solveExactly)."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((6, 6)) + 6 * np.eye(6)
    csr = CSRMatrix.from_dense(a)
    cfg = amgx.AMGConfig("solver=DENSE_LU_SOLVER, max_iters=1")
    s = amgx.SolverFactory.allocate(cfg)
    s.setup(amgx.Matrix(csr))
    b = rng.standard_normal(6)
    x, st = s.solve(b)
    assert np.allclose(a @ s.extract_vector(x), b, atol=1e-10)


def test_band_pallas_interpret_matches_reference(rng):
    """Round-5 band kernel (DMA-windowed VPU form) under Pallas interpret
    mode: exercises the exact kernel program (scalar-prefetched bases,
    per-tile window DMA, group batching) without TPU hardware, across
    width/tile-count combinations including non-pow2 widths and tile
    counts not divisible by the group size."""
    from amgx_tpu.ops.band import csr_to_band, band_spmv_pallas
    from amgx_tpu.matrix import CSRMatrix

    def banded(n, offs):
        rows, cols, vals = [], [], []
        for off in offs:
            i = np.arange(max(0, -off), min(n, n - off))
            rows.append(i)
            cols.append(i + off)
            vals.append(rng.standard_normal(i.shape).astype(np.float32))
        return CSRMatrix.from_coo(n, n, np.concatenate(rows),
                                  np.concatenate(cols),
                                  np.concatenate(vals))

    for n, offs in ((4096, (-150, -1, 0, 1, 90)),       # W=512, g=8
                    (1111, (-40, 0, 40)),               # odd n
                    (2048, (-700, -1, 0, 1, 700))):     # wide W, g small
        m = banded(n, offs)
        bm = csr_to_band(m, dtype=np.float32)
        assert bm is not None, (n, offs)
        x = rng.standard_normal(bm.x_pad).astype(np.float32)
        y = np.asarray(band_spmv_pallas(bm, jnp.asarray(x),
                                        interpret=True))[:n]
        want = m.to_scipy() @ x[:n]
        err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
        assert err < 1e-6, (n, offs, err)


def test_layout_ladder_fuzz(rng):
    """Randomized correctness sweep: every layout the ladder can pick
    (DIA/band/ELL/dense/G5-reference-path) against scipy, plus a value
    update through each attached plan — 40 random structures."""
    import scipy.sparse as sp
    from amgx_tpu.matrix import csr_to_ell, csr_to_dense_op
    from amgx_tpu.ops.spmv import csr_to_dia
    from amgx_tpu.ops.band import csr_to_band
    from amgx_tpu.ops.gather_spmv import csr_to_gather
    from amgx_tpu.ops.value_update import try_value_update

    def rand_csr(trial):
        n = int(rng.integers(24, 700))
        kind = trial % 4
        if kind == 0:                      # banded, few offsets
            offs = sorted(set(int(o) for o in
                              rng.integers(-n // 3, n // 3, 4)) | {0})
            rows, cols = [], []
            for off in offs:
                i = np.arange(max(0, -off), min(n, n - off))
                rows.append(i)
                cols.append(i + off)
            rows = np.concatenate(rows)
            cols = np.concatenate(cols)
        elif kind == 1:                    # random sparse
            nnz = int(rng.integers(n, 6 * n))
            rows = rng.integers(0, n, nnz)
            cols = rng.integers(0, n, nnz)
        elif kind == 2:                    # diagonal-heavy + noise
            rows = np.concatenate([np.arange(n),
                                   rng.integers(0, n, 2 * n)])
            cols = np.concatenate([np.arange(n),
                                   rng.integers(0, n, 2 * n)])
        else:                              # dense-ish small
            n = int(rng.integers(8, 60))
            rows = np.repeat(np.arange(n), n // 2)
            cols = rng.integers(0, n, rows.size)
        vals = rng.standard_normal(rows.shape[0])
        vals[vals == 0] = 1.0
        m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        m.data[m.data == 0] = 1.0          # value-update plans need no
        return CSRMatrix(n, n, m.indptr, m.indices, m.data)  # stored 0s

    builders = [("dia", csr_to_dia), ("band", csr_to_band),
                ("ell", csr_to_ell), ("dense", csr_to_dense_op),
                ("g5", lambda c, dtype: csr_to_gather(c, dtype=dtype,
                                                      allow_empty=True))]
    for trial in range(40):
        csr = rand_csr(trial)
        x = rng.standard_normal(csr.n_rows)
        want = csr.to_scipy() @ x
        for name, build in builders:
            op = build(csr, dtype=np.float64)
            if op is None:
                continue
            pad_len = max(csr.n_rows,
                          getattr(op, "x_pad", 0) or 0,
                          getattr(op, "n_pad", 0) or 0)
            xin = jnp.asarray(np.pad(x, (0, pad_len - csr.n_rows)))
            y = np.asarray(op.apply(xin))[:csr.n_rows]
            np.testing.assert_allclose(y, want, rtol=1e-9, atol=1e-9,
                                       err_msg=f"{name} trial {trial}")
            if getattr(op, "_vu", None) is not None:
                c2 = CSRMatrix(csr.n_rows, csr.n_cols, csr.indptr,
                               csr.indices, csr.data * 1.3 + 0.01)
                upd = try_value_update(op, c2, np.float64)
                if upd is not None:
                    y2 = np.asarray(upd.apply(xin))[:csr.n_rows]
                    np.testing.assert_allclose(
                        y2, c2.to_scipy() @ x, rtol=1e-9, atol=1e-9,
                        err_msg=f"{name} update trial {trial}")
