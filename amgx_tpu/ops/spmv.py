"""Sparse matrix-vector products.

TPU-native replacement for the reference SpMV stack (base/src/multiply.cu,
base/src/amgx_cusparse.cu). Three execution paths, picked per-operator:

  * ``dia_spmv`` — DIA (banded) layout for stencil-like matrices: each band is
    a shifted elementwise multiply-add, pure VPU traffic with **no gather**.
    This is the speed-of-light path for Poisson-type operators and is also
    provided as a Pallas kernel.
  * ``ell_spmv`` — padded-ELL gather path for general sparsity (XLA gather).
  * ``DenseOperator.apply`` — one MXU matmul for small/coarse operators.

The reference's distributed latency-hiding split (interior SpMV overlapped
with halo exchange, multiply.cu:113-197) lives in ``amgx_tpu.distributed``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matrix import CSRMatrix, EllMatrix, DenseOperator


# ---------------------------------------------------------------------------
# ELL path (general sparsity)
# ---------------------------------------------------------------------------

def ell_spmv(a: EllMatrix, x):
    """y = A @ x for padded-ELL A.

    Scalar: x (n_pad,), y (n_pad,). Blocked (bx,by): x (n_pad*by,) flat,
    y (n_pad*bx,) flat — matching AMGX's interleaved block vectors
    (vector.h block_dim).
    """
    bx, by = a.block_dim
    if (bx, by) == (1, 1):
        gathered = x[a.cols]                      # (n_pad, w)
        return jnp.sum(a.vals * gathered, axis=1)
    xb = x.reshape(-1, by)                        # (n_pad, by)
    gathered = xb[a.cols]                         # (n_pad, w, by)
    # mixed-precision modes (dDFI): accumulate in the promoted dtype
    y = jnp.einsum("nwij,nwj->ni", a.vals, gathered,
                   preferred_element_type=jnp.result_type(a.vals, x))
    return y.reshape(-1)


# ---------------------------------------------------------------------------
# DIA path (banded / stencil matrices) — no gather at all
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class DiaMatrix:
    """Banded device matrix: ``offsets`` static python ints, ``bands`` shaped
    (num_bands, n_pad). y[i] = sum_k bands[k, i] * x[i + offsets[k]].

    Band values out of range are stored as zero, so shifts can wrap safely.
    The TPU-idiomatic format for Poisson/stencil operators.
    """

    def __init__(self, offsets, bands, n_rows: int, n_cols: int, nnz: int = 0):
        self.offsets = tuple(int(o) for o in offsets)
        self.bands = bands
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.block_dim = (1, 1)
        self.nnz = int(nnz)

    def tree_flatten(self):
        return ((self.bands,), (self.offsets, self.n_rows, self.n_cols,
                                self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, n_rows, n_cols, nnz = aux
        return cls(offsets, children[0], n_rows, n_cols, nnz)

    @property
    def n_pad(self):
        return self.bands.shape[1]

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.bands.dtype

    def apply(self, x):
        # the Pallas tiled kernel needs a TPU backend, 128-aligned rows and
        # a <=32-bit dtype (Mosaic has no f64 lowering — dDDI modes run the
        # XLA shift-FMA form, emulated-f64 on TPU); everywhere else the
        # shift-FMA XLA form is used
        if jax.default_backend() == "tpu" and self.n_pad % 128 == 0 and \
                self.bands.dtype.itemsize <= 4 and x.dtype.itemsize <= 4:
            return dia_spmv_pallas2d(self, x)
        return dia_spmv(self, x)

    def __repr__(self):
        return (f"DiaMatrix({self.n_rows}x{self.n_cols}, "
                f"bands={len(self.offsets)}, dtype={self.bands.dtype})")


def dia_spmv(a: DiaMatrix, x):
    """Shift-and-FMA SpMV. jnp.roll is a cheap lane rotation on TPU; band
    values at out-of-range positions are zero so wrapped lanes contribute 0."""
    y = jnp.zeros_like(x)
    for k, off in enumerate(a.offsets):
        y = y + a.bands[k] * jnp.roll(x, -off)
    return y


def csr_to_dia(csr: CSRMatrix, dtype=None, max_bands: int = 32,
               row_pad: Optional[int] = None) -> Optional[DiaMatrix]:
    """Convert CSR to DIA if the matrix is banded with few distinct offsets.
    Returns None when the matrix is not DIA-friendly."""
    if csr.block_dim != (1, 1) or csr.nnz == 0:
        return None
    csr0 = csr                     # raw handle for the value-update plan
    csr = csr.fold_diagonal()      # DIAG property: diagonal is a band too
    rows = np.repeat(np.arange(csr.n_rows, dtype=np.int64), csr.row_nnz())
    offs = csr.indices.astype(np.int64) - rows
    uniq = np.unique(offs)
    if uniq.size > max_bands:
        return None
    if row_pad is None:
        # 2-D Pallas tiles want 128-row multiples; small matrices stay lean
        row_pad = 128 if max(csr.n_rows, csr.n_cols) >= 128 else 8
    n_pad = max(row_pad, ((max(csr.n_rows, csr.n_cols) + row_pad - 1)
                          // row_pad) * row_pad)
    dtype = dtype or csr.data.dtype
    bands = np.zeros((uniq.size, n_pad), dtype=dtype)
    band_of = np.searchsorted(uniq, offs)
    bands[band_of, rows] = csr.data.astype(dtype)
    out = DiaMatrix(uniq.tolist(), jnp.asarray(bands),
                    csr.n_rows, csr.n_cols, nnz=csr.nnz)
    from .value_update import attach_plan, csr_structure_sig
    attach_plan(out, "dia", csr_structure_sig(csr0, dtype),
                band_of * n_pad + rows, uniq.size * n_pad)
    return out


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def dia_spmv_pallas(a: DiaMatrix, x, chunk: int = 65536):
    """Pallas DIA SpMV: each grid step processes ``chunk`` rows. The band
    windows of x overlap by ``halo`` on both sides, so x stays unblocked in
    HBM and each step DMAs its window into VMEM scratch once, then performs
    one shifted FMA per band (pure VPU). Bandwidth-bound by design."""
    n = a.n_pad
    offsets = a.offsets
    halo = max(abs(o) for o in offsets) if offsets else 0
    chunk = min(chunk, n)
    if n % chunk != 0 or halo > chunk:
        return dia_spmv(a, x)    # fallback for awkward shapes
    n_chunks = n // chunk
    win = chunk + 2 * halo
    # pad x with halo zeros on both sides so windows never go out of bounds;
    # window i covers xp[i*chunk : i*chunk + win]
    xp = jnp.pad(x, (halo, halo))

    def kernel(x_hbm, bands_ref, y_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * chunk, win)], xwin, sem)
        cp.start()
        cp.wait()
        acc = jnp.zeros((chunk,), x_hbm.dtype)
        for k, off in enumerate(offsets):
            acc = acc + bands_ref[k, :] * xwin[pl.ds(halo + off, chunk)]
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((len(offsets), chunk), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        scratch_shapes=[pltpu.VMEM((win,), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(xp, a.bands)
    return y


def dia_spmv_pallas2d(a: DiaMatrix, x, chunk_rows: int = 512,
                      interpret: bool = False):
    """2-D tiled Pallas DIA SpMV — the speed-of-light path.

    The flat vector is viewed as (R, 128) so every VPU op runs on full
    (8,128) tiles (a 1-D layout uses one sublane => ~8x slower). A shift by
    offset k decomposes into a static row shift r = k//128 plus a lane
    rotation s = k%128 implemented as a two-slice concat. Each grid step
    DMAs one x window (chunk + halo rows) from HBM into VMEM once and
    applies every band from VMEM, so x traffic is ~1x instead of
    num_bands x.
    """
    offsets = a.offsets
    if not offsets:
        return jnp.zeros_like(x)
    n = a.n_pad
    if n % 128 != 0:
        return dia_spmv(a, x)
    if a.bands.dtype.itemsize > 4 or x.dtype.itemsize > 4:
        return dia_spmv(a, x)      # Mosaic has no 64-bit lowering
    R = n // 128
    chunk_rows = min(chunk_rows, R)
    if R % chunk_rows != 0 or chunk_rows % 8 != 0:
        # Mosaic block sublanes must be a multiple of 8 (or the full dim):
        # largest 8-multiple chunk dividing R, else the XLA form
        chunk_rows = 0
        for c in (512, 256, 128, 64, 32, 16, 8):
            if c <= R and R % c == 0:
                chunk_rows = c
                break
        if chunk_rows == 0:
            return dia_spmv(a, x)
    r_k = [o // 128 for o in offsets]
    s_k = [o % 128 for o in offsets]
    lo = min(min(r_k), 0)
    hi = max(max(r_k) + 1, 0)
    halo_lo, halo_hi = -lo, hi
    x2 = x.reshape(R, 128)
    bands2 = a.bands.reshape(len(offsets), R, 128)
    n_chunks = R // chunk_rows

    if halo_lo > chunk_rows or halo_hi > chunk_rows:
        return dia_spmv(a, x)   # halo must fit in one neighbouring block

    def kernel(xprev, xcur, xnext, bands_ref, y_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, 128), 1)
        # window = [prev | cur | next] rows; cur starts at chunk_rows
        xwin = jnp.concatenate([xprev[:], xcur[:], xnext[:]], axis=0)
        acc = jnp.zeros((chunk_rows, 128), xcur.dtype)
        for k, (r, s) in enumerate(zip(r_k, s_k)):
            base = chunk_rows + r
            blk_a = xwin[base:base + chunk_rows, :]
            if s == 0:
                sh = blk_a
            else:
                # lane rotation: result[:, l] = A[:, l+s] (l < 128-s)
                #                               B[:, l+s-128] otherwise
                blk_b = xwin[base + 1:base + 1 + chunk_rows, :]
                # int32 shift: under jax_enable_x64 a python int weak-types
                # to i64 and Mosaic rejects the i64 dynamic_rotate operand
                sh32 = jnp.asarray(128 - s, jnp.int32)
                rot_a = pltpu.roll(blk_a, sh32, axis=1)
                rot_b = pltpu.roll(blk_b, sh32, axis=1)
                sh = jnp.where(lane < 128 - s, rot_a, rot_b)
            acc = acc + bands_ref[k] * sh
        y_ref[:, :] = acc

    # pad one chunk of rows on each side so blocks i, i+1, i+2 of the padded
    # array are the prev/cur/next windows of logical chunk i
    xp3 = jnp.pad(x2, ((chunk_rows, chunk_rows), (0, 0)))
    xblock = lambda off: pl.BlockSpec(
        (chunk_rows, 128), lambda i, off=off: (i + np.int32(off), np.int32(0)),
        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            xblock(0), xblock(1), xblock(2),
            pl.BlockSpec((len(offsets), chunk_rows, 128),
                         lambda i: (np.int32(0), i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_rows, 128), lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), x.dtype),
        interpret=interpret,
    )(xp3, xp3, xp3, bands2)
    return y.reshape(-1)


def multiply(op, x):
    """y = A x for any device operator (reference: base/src/multiply.cu:75)."""
    return op.apply(x)


def residual(op, b, x):
    """r = b - A x (reference: axmb kernels used by cycles/solvers)."""
    return b - op.apply(x)
