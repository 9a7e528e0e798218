"""Sweep G5 geometry knobs on the TPU at 96^3 permuted Poisson."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import amgx_tpu as amgx
from amgx_tpu.matrix import CSRMatrix
from amgx_tpu.ops.gather_spmv import csr_to_gather

side = int(sys.argv[1]); combos = eval(sys.argv[2])  # [(W,S_p,D), ...]
rng = np.random.default_rng(7)
a = amgx.gallery.poisson7pt(side, side, side)
perm = rng.permutation(a.n_rows)
s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
csr = CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices,
                s.data.astype(np.float32))
x = rng.standard_normal(csr.n_cols).astype(np.float32)
ref = s @ x
for (W, S_p, D) in combos:
    t0 = time.perf_counter()
    gm = csr_to_gather(csr, dtype=np.float32, W=W, S_p=S_p, D=D)
    tp = time.perf_counter() - t0
    if gm is None:
        print(f"W={W} S_p={S_p} D={D}: None", flush=True)
        continue
    x2 = gm._pad_x(jnp.asarray(x))
    nxr = x2.shape[0]
    def body(i, xc):
        y = gm._apply_pallas(xc)
        return xc * 0 + (y[:nxr] if y.shape[0] >= nxr else
                         jnp.pad(y, ((0, nxr - y.shape[0]), (0, 0))))
    iters = 30
    fn = jax.jit(lambda xx: jax.lax.fori_loop(0, iters, body, xx))
    tc0 = time.perf_counter()
    y1 = np.asarray(jax.jit(gm._apply_pallas)(x2)).reshape(-1)
    tc = time.perf_counter() - tc0
    err = np.max(np.abs(y1[:csr.n_rows] - ref)) / np.max(np.abs(ref))
    fn(x2).block_until_ready()
    t0 = time.perf_counter(); fn(x2).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    steps = int(gm.step_flags.shape[0])
    print(f"W={W} S_p={S_p} D={D}: eff={gm.nnz/gm.slots:.2f} steps={steps} "
          f"pack={tp:.1f}s compile={tc:.0f}s err={err:.1e} "
          f"t={dt*1e6:.0f}us {csr.nnz/dt/1e9:.2f} Gnnz/s", flush=True)
