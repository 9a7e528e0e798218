"""Tile-aligned banded-strip matrices: the MXU path for general sparsity.

TPU gathers scalarize (~7 ns/element), so the padded-ELL path is slow for
irregular matrices (AMG coarse operators). After an RCM (reverse
Cuthill-McKee) reordering most mesh-derived operators become *banded*: every
row's nonzeros fall inside a window. This format stores, per tile of
``tile_rows`` rows, the dense strip covering the tile's column span at a
128-aligned base:

    strips (T, tile_rows, W)   dense values, zeros outside the pattern
    base   (T,)                128-aligned window start per tile

and SpMV becomes one (tile_rows x W) @ (W,) matmul per tile — pure MXU work,
no gathers. Replaces the role of the reference's cuSPARSE general-CSR path
for banded-under-RCM matrices; the ELL gather path remains the fallback for
truly unstructured sparsity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matrix import CSRMatrix


@jax.tree_util.register_pytree_node_class
class BandMatrix:
    def __init__(self, strips, base, n_rows: int, n_cols: int, nnz: int,
                 x_pad: int):
        self.strips = strips          # (T, tile_rows, W)
        self.base = base              # (T,) int32, 128-aligned
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.block_dim = (1, 1)
        self.nnz = int(nnz)
        self.x_pad = int(x_pad)       # padded input length the bases assume

    def tree_flatten(self):
        return ((self.strips, self.base),
                (self.n_rows, self.n_cols, self.nnz, self.x_pad))

    @classmethod
    def tree_unflatten(cls, aux, children):
        strips, base = children
        return cls(strips, base, *aux)

    @property
    def tiles(self):
        return self.strips.shape[0]

    @property
    def tile_rows(self):
        return self.strips.shape[1]

    @property
    def width(self):
        return self.strips.shape[2]

    @property
    def n_pad(self):
        return self.tiles * self.tile_rows

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.strips.dtype

    def apply(self, x):
        in_len = x.shape[0]
        if in_len < self.x_pad:
            x = jnp.pad(x, (0, self.x_pad - in_len))
        xw = x[:self.x_pad]
        # Mosaic has no 64-bit lowering: dDDI runs the XLA matmul form
        if jax.default_backend() == "tpu" and \
                self.strips.dtype.itemsize <= 4 and x.dtype.itemsize <= 4:
            y = band_spmv_pallas(self, xw)
        else:
            y = band_spmv(self, xw)
        # output length follows the caller's row padding convention
        out_len = in_len if self.n_cols == self.n_rows else self.n_pad
        if y.shape[0] < out_len:
            y = jnp.pad(y, (0, out_len - y.shape[0]))
        return y[:out_len] if y.shape[0] > out_len else y

    def __repr__(self):
        return (f"BandMatrix({self.n_rows}x{self.n_cols}, tiles="
                f"{self.tiles}x{self.tile_rows}, W={self.width})")


def band_spmv(a: BandMatrix, x):
    """XLA form: per-tile dynamic-slice windows + batched matvec."""
    def tile(strip, b):
        xw = jax.lax.dynamic_slice(x, (b,), (a.width,))
        return strip @ xw
    y = jax.vmap(tile)(a.strips, a.base)          # (T, tile_rows)
    return y.reshape(-1)


def band_group(width: int) -> int:
    """Tiles per grid step: keep the strips block at <= 4096*128 lanes
    (2 MB f32) so double-buffered VMEM stays small."""
    return max(1, min(8, 4096 // width))


def band_read_rows(width: int) -> int:
    """(128-lane) rows of x DMA'd per window: the scratch reshape
    (kr,128)->(1,kr*128) is chip-verified only for kr in {8} u 8Z, so the
    read window rounds up to 1024-element multiples and the kernel slices
    to the true width (the over-read is tiny next to strips traffic)."""
    return 8 * ((width + 1023) // 1024)


def band_spmv_pallas(a: BandMatrix, x, interpret: bool = False):
    """Pallas form: per tile, the x window is DMA'd from HBM into VMEM
    scratch at the scalar-prefetched 128-aligned tile base (dynamic row
    offsets are fine for the DMA engine — measured on v5e), and the product
    runs as a VPU broadcast-multiply + lane reduction, which is f32-exact
    (no bf16 MXU passes). G tiles share a grid step so their DMAs overlap
    and the strips block is large enough to stream at HBM speed
    (chip-measured ~570-950 GB/s for W in {128..4096}; see BENCH_NOTES
    round 5)."""
    t_rows, w = a.tile_rows, a.width
    if w % 128:
        return band_spmv(a, x)
    kr = band_read_rows(w)                    # scratch rows per window
    g = band_group(w)
    while a.tiles % g:                        # g must divide the tile count
        g //= 2
    steps = a.tiles // g
    x2 = x.reshape(-1, 128)

    def kernel(r0_ref, strips_ref, x_hbm, y_ref, xwin, sems):
        i = pl.program_id(0)
        cps = []
        for j in range(g):
            # np.int32 everywhere: python ints weak-type to i64 under
            # jax_enable_x64 and Mosaic rejects i64 memref indices
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(r0_ref[i * np.int32(g) + np.int32(j)], kr), :],
                xwin.at[np.int32(j)], sems.at[np.int32(j)])
            cp.start()
            cps.append(cp)
        for j in range(g):
            cps[j].wait()
            xw = xwin[j].reshape(1, kr * 128)[:, :w]
            y_ref[0, j, :] = jnp.sum(strips_ref[0, j] * xw, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            # np.int32(0): bare python 0 in an index map traces as i64
            # under jax_enable_x64, which the TPU backend cannot legalize
            pl.BlockSpec((1, g, t_rows, w),
                         lambda i, b: (i, np.int32(0), np.int32(0),
                                       np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, g, t_rows),
                               lambda i, b: (i, np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g, kr, 128), x.dtype),
                        pltpu.SemaphoreType.DMA((g,))],
    )
    y = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((steps, g, t_rows), x.dtype),
        interpret=interpret,
    )(a.base // 128, a.strips.reshape(steps, g, t_rows, w), x2)
    return y.reshape(-1)


def csr_to_band(csr: CSRMatrix, tile_rows: int = 128,
                max_width: int = 4096,
                max_bytes: int = 512 * 1024 * 1024,
                dtype=None) -> Optional[BandMatrix]:
    """Build the tile-aligned band format if the (given) row ordering is
    banded enough; returns None otherwise. Callers wanting bandedness
    should RCM-permute first (see rcm_permutation)."""
    if csr.block_dim != (1, 1) or csr.n_rows == 0:
        return None
    dtype = dtype or csr.data.dtype
    n = csr.n_rows
    tiles = -(-n // tile_rows)
    rn = csr.row_nnz()
    rows = np.repeat(np.arange(n), rn)
    cols = csr.indices.astype(np.int64)
    tile_of = rows // tile_rows
    # per-tile column spans via reduceat over CSR-contiguous tile ranges
    # (np.minimum.at is unbuffered — it alone cost ~50 ms per attempt)
    t_start = csr.indptr[np.minimum(np.arange(tiles) * tile_rows, n)]
    t_end = csr.indptr[np.minimum((np.arange(tiles) + 1) * tile_rows, n)]
    lo = np.zeros(tiles, np.int64)
    hi = np.zeros(tiles, np.int64)
    if csr.nnz:
        valid = t_start < t_end
        if t_start[-1] >= csr.nnz:
            # rare tail-empty tiles: reduceat segments may start at index
            # nnz; pad with a repeat of cols[-1], which cannot change any
            # valid tile's min/max
            cols_src = np.append(cols, cols[-1])
        else:
            cols_src = cols
        lo_red = np.minimum.reduceat(cols_src, t_start)
        hi_red = np.maximum.reduceat(cols_src, t_start)
        lo[valid] = lo_red[valid]
        hi[valid] = hi_red[valid]
    # bases align down to 128 (one (·,128)-row of the x view); the width
    # must cover every tile's [base, hi] range and is 128-granular (the
    # DMA read window rounds up separately — band_read_rows)
    base = (lo // 128) * 128
    need = int((hi - base).max()) + 1 if csr.nnz else 1
    w = ((need + 127) // 128) * 128
    if w > max_width:
        return None
    # pad the tile count to the kernel's per-step group size
    g = band_group(w)
    tiles = ((tiles + g - 1) // g) * g
    if tiles * tile_rows * w * np.dtype(dtype).itemsize > max_bytes:
        return None
    if len(base) < tiles:
        base = np.concatenate([base, np.zeros(tiles - len(base), base.dtype)])
    strips = np.zeros((tiles, tile_rows, w), dtype)
    r_in_tile = rows % tile_rows
    off = cols - base[tile_of]
    strips[tile_of, r_in_tile, off] = csr.data.astype(dtype)
    if csr.diag_data is not None:
        d = np.arange(n)
        dt = d // tile_rows
        strips[dt, d % tile_rows, d - base[dt]] += \
            csr.diag_data.astype(dtype)
    x_pad = int(base.max()) + band_read_rows(w) * 128
    x_pad = max(x_pad, ((csr.n_cols + 127) // 128) * 128)
    strips_d, base_d = jax.device_put((strips, base.astype(np.int32)))
    out = BandMatrix(strips_d, base_d,
                     n, csr.n_cols, csr.nnz, x_pad)
    if csr.diag_data is None and csr.nnz:
        # value-update plan (time stepping): diag-carrying matrices ADD
        # into possibly-occupied strip slots, which a set-scatter cannot
        # reproduce — those rebuild instead
        from .value_update import attach_plan, csr_structure_sig
        flat = (tile_of * tile_rows + r_in_tile) * w + off
        attach_plan(out, "band", csr_structure_sig(csr, dtype), flat,
                    tiles * tile_rows * w)
    return out


def tile_halfwidth(rows: np.ndarray, cols: np.ndarray, n: int,
                   tile_rows: int = 128) -> int:
    """Half-window hw the band-strip format would need for this ordering
    (the per-tile column span, rounded up to lane blocks) — a cheap
    estimator that avoids building the strips. ``rows`` must be
    nondecreasing (CSR order), which every caller provides."""
    if rows.size == 0:
        return 128
    tiles = -(-n // tile_rows)
    # rows are sorted -> per-tile ranges are contiguous: reduceat beats
    # the unbuffered np.minimum.at by ~20x
    starts = np.searchsorted(rows, np.arange(tiles) * tile_rows)
    ends = np.append(starts[1:], rows.size)
    valid = starts < ends
    # sentinel pad (as in csr_to_band): segments may start at index
    # size for empty tail tiles; the repeat of cols[-1] cannot change a
    # valid tile's min/max
    cols_src = np.append(cols, cols[-1]) if starts[-1] >= cols.size \
        else cols
    lo_red = np.minimum.reduceat(cols_src, starts)
    hi_red = np.maximum.reduceat(cols_src, starts)
    span = int((hi_red[valid] - lo_red[valid]).max()) + 1 \
        if valid.any() else 1
    return max(128, ((span + 127) // 128) * 128)


def rcm_permutation(csr: CSRMatrix) -> np.ndarray:
    """Reverse Cuthill-McKee ordering (bandwidth reduction)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    n = csr.n_rows
    # build from the existing CSR arrays (no COO re-sort); RCM reads
    # structure only, so the summed duplicate values of a + a.T are fine
    a = sp.csr_matrix((np.ones(csr.nnz), csr.indices, csr.indptr),
                      shape=(n, max(n, csr.n_cols)))
    if a.shape[1] != n:
        a = a[:, :n]
    sym = (a + a.T).tocsr()
    return np.asarray(reverse_cuthill_mckee(sym, symmetric_mode=True))


def permute_square(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """A' = A[perm][:, perm] (rows and columns renumbered)."""
    rank = np.empty_like(perm)
    rank[perm] = np.arange(len(perm))
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    out = CSRMatrix.from_coo(csr.n_rows, csr.n_cols, rank[rows],
                             rank[csr.indices], csr.data,
                             block_dim=csr.block_dim, sum_duplicates=False)
    if csr.diag_data is not None:
        out.diag_data = csr.diag_data[perm]
    return out


def permute_cols(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    rank = np.empty_like(perm)
    rank[perm] = np.arange(len(perm))
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    return CSRMatrix.from_coo(csr.n_rows, csr.n_cols, rows,
                              rank[csr.indices], csr.data,
                              block_dim=csr.block_dim, sum_duplicates=False)


def permute_rows(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    rank = np.empty_like(perm)
    rank[perm] = np.arange(len(perm))
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    return CSRMatrix.from_coo(csr.n_rows, csr.n_cols, rank[rows],
                              csr.indices, csr.data,
                              block_dim=csr.block_dim, sum_duplicates=False)
