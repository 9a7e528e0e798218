"""Chip verification of the round-5 band kernel: correctness via
csr_to_band at several widths + slope-timed bandwidth (BENCH_NOTES)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.ops.band import (csr_to_band, band_spmv_pallas, band_spmv,
                               rcm_permutation, permute_square)

print("devices:", jax.devices())
rng = np.random.default_rng(0)


def slope_time(g, inner=6, reps=4):
    for k in (inner, 3 * inner):
        float(g(k))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(inner))
        t1 = time.perf_counter()
        float(g(3 * inner))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (2 * inner))
    return max(float(np.median(slopes)), 1e-12)


def banded_matrix(n, offs):
    rows, cols, vals = [], [], []
    for off in offs:
        i = np.arange(max(0, -off), min(n, n - off))
        rows.append(i)
        cols.append(i + off)
        vals.append(rng.standard_normal(i.shape).astype(np.float32))
    return CSRMatrix.from_coo(n, n, np.concatenate(rows),
                              np.concatenate(cols),
                              np.concatenate(vals))


cases = [
    ("poisson5pt 40x40 scrambled+RCM", None),
    ("band n=65536 offs +-{1,40,80}", (65536, (-80, -40, -1, 0, 1, 40, 80))),
    ("band n=131072 offs {-120,-1,0,1,250} (W=512)",
     (131072, (-120, -1, 0, 1, 250))),
    ("band n=65536 offs +-{1,200}", (65536, (-200, -1, 0, 1, 200))),
    ("band n=131072 offs +-{1,400}", (131072, (-400, -1, 0, 1, 400))),
    ("band n=65536 offs +-{1,900}", (65536, (-900, -1, 0, 1, 900))),
    ("band n=32768 offs +-{1,1500}", (32768, (-1500, -1, 0, 1, 1500))),
]
for name, spec in cases:
    if spec is None:
        a = amgx.gallery.poisson5pt(40, 40)
        a = permute_square(a, rng.permutation(a.n_rows))
        p = rcm_permutation(a)
        a = permute_square(a, p)
    else:
        a = banded_matrix(*spec)
    bm = csr_to_band(a, dtype=np.float32)
    if bm is None:
        print(f"{name}: csr_to_band declined")
        continue
    x = rng.standard_normal(bm.x_pad).astype(np.float32)
    xj = jnp.asarray(x)
    y = np.asarray(jax.jit(band_spmv_pallas)(bm, xj))[:a.n_rows]
    want = a.to_scipy() @ x[:a.n_rows].astype(np.float64)
    err = np.abs(y - want).max() / (np.abs(want).max() + 1e-30)
    # slope-timed bandwidth on the strips bytes
    T = bm.tiles

    @jax.jit
    def g_(k, s, xc):
        import amgx_tpu.ops.band as B
        bm2 = B.BandMatrix(s, bm.base, bm.n_rows, bm.n_cols, bm.nnz,
                           bm.x_pad)
        def body(_, xv):
            yv = band_spmv_pallas(bm2, xv)
            return xv.at[:yv.shape[0]].add(1e-30 * yv)
        xf = jax.lax.fori_loop(0, k, body, xc)
        return jnp.sum(xf)

    g = lambda k: g_(k, bm.strips, xj)
    dt = slope_time(g)
    gb = bm.strips.nbytes / dt / 1e9
    print(f"{name}: W={bm.width} tiles={T} err={err:.2e} "
          f"t={dt*1e6:.1f}us strips_bw={gb:.1f} GB/s")
