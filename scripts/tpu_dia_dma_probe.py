"""DIA kernel A/B: 3-slab BlockSpec x reads (x traffic ~3x) vs a DMA'd
x window per step (x traffic ~1x). 7-pt Poisson at 128^3, slope-timed."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
from jax.experimental import pallas as pl                    # noqa: E402
from jax.experimental.pallas import tpu as pltpu             # noqa: E402

import amgx_tpu as amgx                                      # noqa: E402
from amgx_tpu.ops.spmv import csr_to_dia, dia_spmv_pallas2d  # noqa: E402

print("devices:", jax.devices())


def slope_time(g, inner=30, reps=4):
    for k in (inner, 3 * inner):
        float(g(k))
    sl = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(inner))
        t1 = time.perf_counter()
        float(g(3 * inner))
        t2 = time.perf_counter()
        sl.append(((t2 - t1) - (t1 - t0)) / (2 * inner))
    return max(float(np.median(sl)), 1e-12)


def dia_spmv_pallas2d_dma(a, x, chunk_rows: int = 512):
    offsets = a.offsets
    n = a.n_pad
    R = n // 128
    chunk_rows = min(chunk_rows, R)
    assert R % chunk_rows == 0
    r_k = [o // 128 for o in offsets]
    s_k = [o % 128 for o in offsets]
    lo = min(min(r_k), 0)
    hi = max(max(r_k) + 1, 0)
    hl, hh = -lo, hi
    x2 = x.reshape(R, 128)
    bands2 = a.bands.reshape(len(offsets), R, 128)
    n_chunks = R // chunk_rows
    win = chunk_rows + hl + hh
    win = -(-win // 8) * 8                   # 8-sublane DMA/scratch quantum
    xp = jnp.pad(x2, ((hl, win - chunk_rows - hl), (0, 0)))

    def kernel(x_hbm, bands_ref, y_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * np.int32(chunk_rows), win), :], xwin, sem)
        cp.start()
        cp.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, 128), 1)
        acc = jnp.zeros((chunk_rows, 128), x_hbm.dtype)
        for k, (r, s) in enumerate(zip(r_k, s_k)):
            base = hl + r
            blk_a = xwin[base:base + chunk_rows, :]
            if s == 0:
                sh = blk_a
            else:
                blk_b = xwin[base + 1:base + 1 + chunk_rows, :]
                sh32 = jnp.asarray(128 - s, jnp.int32)
                rot_a = pltpu.roll(blk_a, sh32, axis=1)
                rot_b = pltpu.roll(blk_b, sh32, axis=1)
                sh = jnp.where(lane < 128 - s, rot_a, rot_b)
            acc = acc + bands_ref[k] * sh
        y_ref[:, :] = acc

    y = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((len(offsets), chunk_rows, 128),
                         lambda i: (np.int32(0), i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_rows, 128),
                               lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((win, 128), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(xp, bands2)
    return y.reshape(-1)


n_side = 128
a = amgx.gallery.poisson7pt(n_side, n_side, n_side, dtype=np.float32)
dia = csr_to_dia(a, dtype=np.float32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(dia.n_pad).astype(np.float32))
nbytes = (len(dia.offsets) + 2) * dia.n_pad * 4
scale = np.asarray(0.12, np.float32)

# correctness of the DMA variant
y1 = np.asarray(jax.jit(lambda o, v: dia_spmv_pallas2d_dma(o, v))(dia, x))
y0 = np.asarray(jax.jit(lambda o, v: dia_spmv_pallas2d(o, v))(dia, x))
print("max |dma - blockspec|:", float(np.abs(y1 - y0).max()))

for name, fn in (("blockspec", dia_spmv_pallas2d),
                 ("dma      ", dia_spmv_pallas2d_dma)):
    for chunk in (256, 512, 1024):
        f = jax.jit(lambda op, v, k, fn=fn, c=chunk: jnp.sum(
            jax.lax.fori_loop(0, k, lambda i, u: fn(op, u, c) * scale, v)),
            static_argnums=2)
        try:
            dt = slope_time(lambda k: f(dia, x, k))
            print(f"{name} chunk={chunk:5d}: t={dt*1e6:7.1f}us "
                  f"eff={nbytes/dt/1e9:6.1f} GB/s")
        except Exception as e:
            print(f"{name} chunk={chunk}: FAIL {str(e)[:120]}")
