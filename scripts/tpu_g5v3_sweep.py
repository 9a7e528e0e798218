"""Sweep G5 rev-3 geometry (D, G, W, S_p) on the real TPU at 96^3
permuted Poisson; prints one JSON line per combo."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import amgx_tpu as amgx
    from amgx_tpu.matrix import CSRMatrix
    from amgx_tpu.ops.gather_spmv import csr_to_gather

    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
    rng = np.random.default_rng(0)
    perm = rng.permutation(a.n_rows)
    s = a.to_scipy().tocsr()[perm][:, perm].tocsr()
    csr = CSRMatrix(a.n_rows, a.n_rows, s.indptr, s.indices,
                    s.data.astype(np.float32))
    scale = np.asarray(0.12, np.float32)

    def slope(g, inner=20, reps=3):
        for k in (inner, 3 * inner):
            float(g(k))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(inner))
            t1 = time.perf_counter()
            float(g(3 * inner))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * inner))
        return max(best, 1e-12)

    combos = []
    for d in (8, 16, 32, 64):
        for gg in (4, 8, 16):
            combos.append((64, 512, d, gg))
    combos += [(128, 512, None, None), (64, 256, None, None),
               (64, 1024, None, None), (64, 512, None, None)]
    for (w, sp, d, gg) in combos:
        try:
            t0 = time.perf_counter()
            gm = csr_to_gather(csr, dtype=np.float32, W=w, S_p=sp,
                               D=d, G=gg)
            pack_t = time.perf_counter() - t0
            if gm is None:
                print(json.dumps({"W": w, "S_p": sp, "D": d, "G": gg,
                                  "error": "pack None"}), flush=True)
                continue
            x = jnp.asarray(rng.standard_normal(csr.n_rows)
                            .astype(np.float32))
            f = jax.jit(lambda op, v, k: jnp.sum(jax.lax.fori_loop(
                0, k, lambda i, u: op.apply(u) * scale, v)),
                static_argnums=2)
            best = slope(lambda k: f(gm, x, k))
            nbytes = csr.nnz * 8 + 2 * csr.n_rows * 4
            print(json.dumps({
                "W": gm.W, "S_p": gm.S_p, "D": gm.D, "G": gm.G,
                "steps": int(gm.n_steps), "slots_nnz":
                round(gm.slots / csr.nnz, 3),
                "time_us": round(best * 1e6, 1),
                "eff_gbps": round(nbytes / best / 1e9, 1),
                "pack_s": round(pack_t, 2)}), flush=True)
        except Exception as e:                         # noqa: BLE001
            print(json.dumps({"W": w, "S_p": sp, "D": d, "G": gg,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
