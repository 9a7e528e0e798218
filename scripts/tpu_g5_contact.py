"""First-contact validation of the G5 lane-binned gather SpMV kernel on
real Mosaic (VERDICT r2 item 1). Run stages separately so a Mosaic crash
identifies the stage:

  python scripts/tpu_g5_contact.py small    # 600x600 random, correctness
  python scripts/tpu_g5_contact.py poisson  # 24^3 permuted poisson, correctness
  python scripts/tpu_g5_contact.py perf     # 96^3 permuted poisson, GB/s
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.ops.gather_spmv import csr_to_gather


def _random_csr(n, m, nnz_per_row, rng, dtype=np.float32):
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rng.integers(0, m, rows.shape[0])
    vals = rng.standard_normal(rows.shape[0]).astype(dtype)
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    a.sum_duplicates()
    return CSRMatrix(n, m, a.indptr, a.indices, a.data)


def _permuted_poisson(side, rng, dtype=np.float32):
    a = amgx.gallery.poisson7pt(side, side, side)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    return CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices,
                     s.data.astype(dtype))


def check(gm, csr, x, label):
    x2 = gm._pad_x(jnp.asarray(x))
    t0 = time.perf_counter()
    y = np.asarray(jax.jit(gm._apply_pallas)(x2)).reshape(-1)
    t1 = time.perf_counter()
    ref = csr.to_scipy() @ x
    err = np.max(np.abs(y[: csr.n_rows] - ref)) / max(1e-30,
                                                      np.max(np.abs(ref)))
    print(f"[{label}] compile+run {t1-t0:.1f}s rel_err={err:.3e}", flush=True)
    assert err < 5e-5, f"MISMATCH {err}"
    print(f"[{label}] PASS", flush=True)
    return y


def perf(gm, csr, x, iters=50):
    x2 = gm._pad_x(jnp.asarray(x))
    nxr = x2.shape[0]

    def body(i, xc):
        y = gm._apply_pallas(xc)
        return xc * 0 + y[:nxr] if y.shape[0] >= nxr else \
            xc * 0 + jnp.pad(y, ((0, nxr - y.shape[0]), (0, 0)))

    fn = jax.jit(lambda x2: jax.lax.fori_loop(0, iters, body, x2))
    # warm up (compile)
    fn(x2).block_until_ready()
    t0 = time.perf_counter()
    fn(x2).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    itemsize = np.dtype(gm.dtype).itemsize
    # HBM traffic model: vals + int8 hi/lane per slot, sort/boundary planes,
    # one x window read per (panel, window) pair, y write
    bytes_slots = gm.slots * (itemsize + 2)
    bytes_aux = gm.src.size + gm.sten.size * 2
    wid = np.asarray(gm.step_wid)
    n_fetches = 1 + int(np.sum(wid[1:] != wid[:-1]))  # Pallas dedups repeats
    bytes_x = n_fetches * gm.W * 128 * itemsize
    bytes_xy = bytes_x + csr.n_rows * itemsize
    gbps = (bytes_slots + bytes_aux + bytes_xy) / dt / 1e9
    gnnz = csr.nnz / dt / 1e9
    print(f"[perf] n={csr.n_rows} nnz={csr.nnz} slots={gm.slots} "
          f"time/SpMV={dt*1e6:.1f}us eff_GB/s={gbps:.1f} Gnnz/s={gnnz:.2f}",
          flush=True)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "small"
    rng = np.random.default_rng(7)
    print("devices:", jax.devices(), flush=True)
    if stage == "small":
        csr = _random_csr(600, 600, 5, rng)
        gm = csr_to_gather(csr, dtype=np.float32, W=8, S_p=8, D=8)
        x = rng.standard_normal(600).astype(np.float32)
        check(gm, csr, x, "small-random-600")
    elif stage == "poisson":
        csr = _permuted_poisson(24, rng)
        gm = csr_to_gather(csr, dtype=np.float32)
        print("gm:", gm, flush=True)
        x = rng.standard_normal(csr.n_cols).astype(np.float32)
        check(gm, csr, x, "poisson24-permuted")
    elif stage == "perf":
        side = int(sys.argv[2]) if len(sys.argv) > 2 else 96
        csr = _permuted_poisson(side, rng)
        t0 = time.perf_counter()
        gm = csr_to_gather(csr, dtype=np.float32)
        print(f"pack {time.perf_counter()-t0:.1f}s  gm: {gm}", flush=True)
        x = rng.standard_normal(csr.n_cols).astype(np.float32)
        check(gm, csr, x, f"poisson{side}-permuted")
        perf(gm, csr, x)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
