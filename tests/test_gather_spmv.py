"""Lane-binned gather SpMV format (ops/gather_spmv.py): correctness of the
setup-time packing and the gather algebra against scipy, on the CPU
reference path (identical index arrays drive the TPU Pallas kernel)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.ops.gather_spmv import (GatherMatrix, csr_to_gather,
                                      _pack_pairs_python)


def _random_csr(n, m, nnz_per_row, rng, dtype=np.float64):
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, m, rows.shape[0])
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    a.sum_duplicates()
    return CSRMatrix(n, m, a.indptr, a.indices, a.data)


def _check(csr, rng, **kw):
    gm = csr_to_gather(csr, **kw)
    assert gm is not None
    x = rng.standard_normal(csr.n_cols)
    y = np.asarray(gm.apply(jnp.asarray(x[: csr.n_cols])))
    ref = csr.to_scipy() @ x
    np.testing.assert_allclose(y[: csr.n_rows], ref, rtol=1e-9, atol=1e-9)
    return gm


def test_small_random(rng):
    csr = _random_csr(500, 500, 5, rng)
    gm = _check(csr, rng, W=8, S_p=8, D=8)
    assert gm.slots >= csr.nnz


def test_permuted_poisson(rng):
    """The VERDICT target case: randomly permuted Poisson (no reordering
    can help) must run through the gather format."""
    a = amgx.gallery.poisson7pt(12, 12, 12)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    csr = CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices, s.data)
    gm = _check(csr, rng, W=16, S_p=16, D=16)
    # padding efficiency must stay sane on the scattered case
    assert gm.slots <= 4 * csr.nnz


def test_rectangular(rng):
    csr = _random_csr(300, 900, 4, rng)
    _check(csr, rng, W=8, S_p=8, D=8)


def test_multi_panel_multi_window(rng):
    csr = _random_csr(3000, 3000, 6, rng)
    gm = _check(csr, rng, W=8, S_p=8, D=8)
    assert gm.n_panels > 1 and gm.n_windows > 1


def test_rows_with_no_nnz(rng):
    rows = np.array([0, 0, 5, 9])
    cols = np.array([1, 7, 3, 9])
    vals = np.array([1.0, 2.0, -1.5, 4.0])
    a = sp.coo_matrix((vals, (rows, cols)), shape=(10, 10)).tocsr()
    csr = CSRMatrix(10, 10, a.indptr, a.indices, a.data)
    _check(csr, np.random.default_rng(1), W=8, S_p=8, D=8)


def test_heavy_row_guard(rng):
    """A single dense row forces per-lane depth ~ its degree. Round 5
    contract: the packer NEVER abandons to the scalarized ELL gather —
    the waste guard escalates to taller panels and finally accepts the
    waste (a padded G5 still runs ~50x faster than ELL). retune=False
    keeps the strict-guard behavior for geometry probes."""
    n = 256
    rows = np.concatenate([np.zeros(n, np.int64), np.arange(n)])
    cols = np.concatenate([np.arange(n), np.arange(n)])
    vals = rng.standard_normal(2 * n)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    csr = CSRMatrix(n, n, a.indptr, a.indices, a.data)
    assert csr_to_gather(csr, W=8, S_p=8, D=8, retune=False) is None
    # the default (retuning) path must pack — and pack correctly
    gm = csr_to_gather(csr, W=8, S_p=8, D=8)
    assert gm is not None
    x = rng.standard_normal(n)
    y = np.asarray(gm.apply(jnp.asarray(x)))
    np.testing.assert_allclose(y[:n], csr.to_scipy() @ x,
                               rtol=1e-9, atol=1e-9)


def test_packer_native_matches_python(rng):
    from amgx_tpu import native
    lib = native.lib()
    if lib is None or not getattr(lib, "_has_gather_pack", False):
        pytest.skip("native lib not built")
    nedges = 5000
    rl = rng.integers(0, 128, nedges).astype(np.int32)
    cl = rng.integers(0, 128, nedges).astype(np.int32)
    pair_ptr = np.array([0, 2000, 5000], np.int64)
    s_n = lib.gather_pack(pair_ptr, rl, cl)
    s_p = _pack_pairs_python(pair_ptr, rl, cl)
    # constraint: within a (pair, slot) no duplicated row-lane or col-lane
    for s in (s_n, s_p):
        for a, b in [(0, 2000), (2000, 5000)]:
            key_r = s[a:b].astype(np.int64) * 128 + rl[a:b]
            key_c = s[a:b].astype(np.int64) * 128 + cl[a:b]
            assert len(np.unique(key_r)) == b - a
            assert len(np.unique(key_c)) == b - a
    # the native packer orders edges by lane degree (descending) before
    # first-fit, which keeps depth at/near the max-lane-degree lower bound;
    # it must never be worse than the python arbitrary-order first-fit
    for a, b in [(0, 2000), (2000, 5000)]:
        delta = max(np.bincount(rl[a:b], minlength=128).max(),
                    np.bincount(cl[a:b], minlength=128).max())
        assert s_n[a:b].max() + 1 <= s_p[a:b].max() + 1
        assert s_n[a:b].max() + 1 <= 2 * delta


def test_packing_efficiency_scattered(rng):
    """Two-pointer greedy stays near the max-degree lower bound."""
    csr = _random_csr(4096, 4096, 8, rng)
    gm = csr_to_gather(csr, W=32, S_p=32, D=8)
    assert gm is not None
    assert gm.slots <= 3.0 * csr.nnz, gm


def test_pallas_interpret_matches(rng):
    """The Pallas kernel (interpret mode) computes the same thing as the
    reference jnp path."""
    csr = _random_csr(600, 600, 5, rng, dtype=np.float32)
    gm = csr_to_gather(csr, dtype=np.float32, W=8, S_p=8, D=8)
    x = rng.standard_normal(600).astype(np.float32)
    x2 = gm._pad_x(jnp.asarray(x))
    y_ref = np.asarray(gm._apply_ref(x2)).reshape(-1)
    y_pal = np.asarray(gm._apply_pallas(x2, interpret=True)).reshape(-1)
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=2e-5)
    ref = csr.to_scipy() @ x
    np.testing.assert_allclose(y_ref[:600], ref, rtol=2e-4, atol=2e-4)


def test_pallas_interpret_multichunk_carry(rng):
    """Qc > 1 exercises the rev-3 cross-chunk EN carry column, multiple
    panels exercise the acc reset/flush flags, and several supersteps per
    panel exercise cross-step acc accumulation."""
    csr = _random_csr(70000, 70000, 6, rng, dtype=np.float32)
    gm = csr_to_gather(csr, dtype=np.float32, W=16, S_p=256, G=2)
    assert gm.Qc == 2 and gm.n_panels >= 2 and gm.n_steps > gm.n_panels
    x = rng.standard_normal(70000).astype(np.float32)
    x2 = gm._pad_x(jnp.asarray(x))
    y_ref = np.asarray(gm._apply_ref(x2)).reshape(-1)
    y_pal = np.asarray(gm._apply_pallas(x2, interpret=True)).reshape(-1)
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-4, atol=2e-4)
    ref = csr.to_scipy() @ x
    np.testing.assert_allclose(y_ref[:70000], ref, rtol=2e-3, atol=2e-3)


def test_pad_gather_skip_steps(rng):
    """pad_gather appends skip-flagged supersteps; the padded operator
    computes the identical product (distributed shape-uniformity path)."""
    from amgx_tpu.ops.gather_spmv import pad_gather
    csr = _random_csr(2000, 2000, 5, rng, dtype=np.float32)
    gm = csr_to_gather(csr, dtype=np.float32, W=8, S_p=8, D=8)
    gp = pad_gather(gm, gm.n_steps + 3)
    assert gp.n_steps == gm.n_steps + 3
    x = rng.standard_normal(2000).astype(np.float32)
    x2 = gp._pad_x(jnp.asarray(x))
    y_ref = np.asarray(gm._apply_ref(gm._pad_x(jnp.asarray(x))))
    y_pad = np.asarray(gp._apply_pallas(x2, interpret=True))
    np.testing.assert_allclose(y_pad.reshape(-1)[:2000],
                               y_ref.reshape(-1)[:2000],
                               rtol=2e-5, atol=2e-5)


def test_bsr_scalar_expansion(rng):
    """BSR packs via scalar expansion (reference covers bxb blocks
    natively, multiply.cu:1056-1262); n_rows/n_pad follow the block-unit
    device-op contract (vec_len = n_pad * bx)."""
    import amgx_tpu as amgx
    base = amgx.gallery.poisson5pt(16, 16)
    coup = rng.standard_normal((4, 4)) * 0.2 + np.eye(4)
    data = np.einsum("k,ij->kij", base.data, coup)
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(4, 4))
    gm = csr_to_gather(a)
    assert gm is not None and gm.block_dim == (4, 4)
    assert gm.n_rows == base.n_rows
    x = rng.standard_normal(a.n_rows * 4)
    vl = gm.n_pad * gm.block_dim[0]
    y = np.asarray(gm.apply(jnp.asarray(np.pad(x, (0, vl - x.size)))))
    ref = a.to_scipy() @ x
    np.testing.assert_allclose(y[:ref.size], ref, rtol=1e-12, atol=1e-12)


def test_bsr_diag_property(rng):
    import amgx_tpu as amgx
    base = amgx.gallery.poisson5pt(12, 12)
    data = np.einsum("k,ij->kij", base.data, np.eye(3))
    dd = np.einsum("k,ij->kij", np.full(base.n_rows, 4.0), np.eye(3))
    a = CSRMatrix(base.n_rows, base.n_cols, base.indptr, base.indices,
                  data, block_dim=(3, 3), diag_data=dd)
    gm = csr_to_gather(a)
    x = rng.standard_normal(a.n_rows * 3)
    vl = gm.n_pad * gm.block_dim[0]
    y = np.asarray(gm.apply(jnp.asarray(np.pad(x, (0, vl - x.size)))))
    ref = a.to_scipy() @ x
    np.testing.assert_allclose(y[:ref.size], ref, rtol=1e-12, atol=1e-12)


def test_complex_two_plane(rng):
    """Complex packs as two real planes sharing every index array
    (GatherComplexMatrix); Mosaic has no complex lowering."""
    from amgx_tpu.ops.gather_spmv import GatherComplexMatrix
    import amgx_tpu as amgx
    base = amgx.gallery.poisson5pt(16, 16)
    n = base.n_rows
    dc = base.data * (1.0 + 0.3j) \
        + 1j * rng.standard_normal(base.data.size) * 0.1
    a = CSRMatrix(n, n, base.indptr, base.indices, dc)
    gc = csr_to_gather(a)
    assert isinstance(gc, GatherComplexMatrix)
    # index arrays are literally shared (no duplicated metadata in HBM)
    assert gc.re.hl is gc.im.hl and gc.re.bmeta is gc.im.bmeta
    xc = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    yc = np.asarray(gc.apply(jnp.asarray(np.pad(xc, (0, gc.n_pad - n)))))
    ref = a.to_scipy() @ xc
    np.testing.assert_allclose(yc[:n], ref, rtol=1e-12, atol=1e-12)
