"""General-sparsity SpMV: the lane-binned gather format ("G5", rev 3).

TPU-native replacement for the reference's arbitrary-sparsity CSR SpMV
(base/src/multiply.cu:1056-1262, base/src/amgx_cusparse.cu:84-160).

XLA's 1-D gather scalarizes on TPU (~7 ns/element), so the padded-ELL
fallback runs at ~0.15% of HBM speed of light.  Mosaic exposes exactly two
fast dynamic-indexing primitives (measured on v5e, first-contact round 3):

  * ``dynamic_gather`` along lanes (axis=-1): any number of sublane rows,
    each row shuffled within its own 128 lanes;
  * ``dynamic_gather`` along sublanes (axis=0): SINGLE source vreg only
    ("Multiple source vregs along gather dimension" otherwise), i.e. an
    (8, 128) source gathered by an (8, 128) index plane.

plus static circular shifts (``pltpu.roll``) and (128, 128) transposes.
This module re-formulates CSR SpMV so every dynamic access is one of
those.

Setup partitions rows into *panels* (S_p x 128 rows) and columns into
*windows* (W x 128 cols); windows group into *x-groups* small enough to
sit resident in VMEM.  Within each (panel, window) pair, edges pack into
depth-D tiles under one constraint per tile row: distinct column-lanes
(gather sources) and distinct row-lanes (contribution slots) — greedy
bipartite edge colouring in descending-lane-degree order (native kernel,
csrc/amgx_host.cpp), which lands exactly on the max-lane-degree depth
lower bound on shuffled input.

Rev-3 kernel = one *superstep* per grid step covering G staging blocks
(G*128 tile rows), the round-3 fix for per-grid-step overhead (~350 ns)
dominating runtime:

  per superstep (skippable for distributed shape-padding):
    pass A (all G*tpp tiles; x read from the step's RESIDENT x-group at
            the tile's window offset — scalar-prefetched dynamic slice)
      hs, hv = hi & 7, hi >> 3
      u      = select_v(hv==v, take_along_axis(x_grp[woff+v], hs, 0))
      stag   = take_along_axis(u, lane, 1) * vals
    pass B (per block jb of the superstep)
      srt    = take_along_axis(transpose(stag_jb), src, 1)
      P      = lane_cumsum(srt)                       # log-step rolls
      per q-chunk:  e  = where(EN>=0, P[EN], 0)       # ONE gather
                    s0 = roll(e, 1) with cross-chunk carry column
                    acc[:, chunk] += e - s0

``EN`` is rev 3's single running byte plane: EN(l, q) = (# slots in lane
l with destination <= q) - 1, forward-filled from -1 — it replaces rev
2's two seg-boundary byte planes (st/en), halving segment metadata and
the extraction gathers.  src (rank -> staging row) and EN ride one int8
"bmeta" stream, (B, 128 + Qc*128, 128) per block.  No scatter is ever
needed; blocks accumulate into a (128, S_p) VMEM accumulator transposed
into the panel's y rows once per panel.

HBM traffic per stored slot: vals (4 B / 2 B bf16) + hl (2 B) + src (1 B)
+ EN (Qc B) + one x-group read per (panel, group) run.

Round 5: the efficiency guard no longer abandons scattered operators to
the ~1 GB/s ELL gather — it escalates to taller panels (bigger bins fill
better) and finally accepts the waste (csr_to_gather retune path), so
the layout ladder never falls through for nnz > 128. Chip-verified on a
fully-random 1M x 1M deg-8 operator: slots/nnz 1.51, 121 GB/s effective.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x-group VMEM budget (bytes of f32 x per resident group); the rest of
# the superstep working set (G blocks in, stag, acc, y block) stays well
# under v5e's ~16 MB VMEM at the default G
_XCAP_BYTES = 4 * 2 ** 20
# per-grid-step overhead expressed in HBM-byte equivalents
# (measured on the rev-3 superstep kernel; steps are fat, so this mostly
# breaks ties toward fewer, fuller supersteps)
_STEP_OVERHEAD_BYTES = 150_000
# cumsum on the MXU (srt @ triu ones) vs the VPU roll scan; toggled off
# via env for A/B measurement
import os as _os  # noqa: E402
_MXU_SCAN = _os.environ.get("AMGX_G5_MXU_SCAN", "1") != "0"
# Round-5 kernel-ceiling study (chip-bisected at 96^3-permuted, W=128,
# S_p=512, 553 us total): staging pass A ~115 us, transpose+src-sort
# ~155 us, MXU cumsum ~85 us, EN extraction ~235 us, DMA/step floor
# ~70 us. The kernel is VPU-issue-bound: every candidate cut was
# measured or op-counted to a dead end —
#   * MXU transpose (dot with I, HIGHEST): exact, but MXU time simply
#     serializes with the VPU chain (546 vs 530 us) — no overlap win;
#   * full-width (128, Qc*128) extraction: Mosaic's gather lowering
#     requires index shape == operand shape, and vreg accounting shows
#     wide ops cost exactly as many vreg-cycles as the per-chunk loop;
#   * monotone (per-lane dest-sorted) packing to delete the sort+
#     transpose: prototyped (scripts/proto_monotone_pack.py) — global
#     cursors collapse fill to 2% (window-purity x 128-lane cursor
#     cascade), and bin-pure blocks pay ~28% padding, a net loss;
#   * slots/nnz sits on the max-lane-degree packing lower bound
#     (round-3 analysis), so fill gains require different bin geometry,
#     which the S_p/W sweep already optimizes.
# Conclusion: ~120 GB/s effective at 96^3-permuted is within ~20% of
# this formulation's VPU-bound ceiling; TPU has no hardware gather, so
# arbitrary-sparsity SpMV pays ~45 vreg-cycles per 1024 slots where a
# GPU pays a native gather. The geometry default below (S_p=384) is the
# measured optimum of the extraction-vs-refetch tradeoff.


def _take2d(a, idx, axis):
    """2-D take_along_axis that stays 32-bit inside Mosaic kernels.

    jnp.take_along_axis promotes index arrays to int64 whenever
    jax_enable_x64 is on (lax_utils.int_dtype_for_dim falls back to the
    default int dtype), and Mosaic has no 64-bit lowering — the kernel
    would die in convert_element_type. Build the exact lax.gather the
    Mosaic rule pattern-matches (lowering.py _gather_lowering_rule ->
    tpu.dynamic_gather) with int32 indices directly."""
    if axis == 0:
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,),
            start_index_map=(0,), operand_batching_dims=(1,),
            start_indices_batching_dims=(1,))
    else:
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,),
            start_index_map=(1,), operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))
    return jax.lax.gather(
        a, idx.astype(jnp.int32)[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _lane_cumsum(x):
    """Axis-1 inclusive cumsum as a log-step Hillis-Steele scan — Mosaic
    has no lowering for the cumsum primitive, but roll + masked add
    lowers (first-contact probe) and costs log2(128) vector adds."""
    n = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        # int32 shift: python ints weak-type to i64 under jax_enable_x64
        # and Mosaic rejects i64 dynamic_rotate operands
        r = pltpu.roll(x, jnp.asarray(s, jnp.int32), 1)
        x = x + jnp.where(idx >= s, r, jnp.zeros_like(x))
        s *= 2
    return x


def _pack_pairs_python(pair_ptr, rl, cl):
    """First-fit slot assignment (python fallback; the native C++ version
    in csrc/amgx_host.cpp is used for large matrices).

    Per-lane occupancy bitmasks; each edge takes the lowest tile row free
    in both its row-lane and its column-lane — greedy bipartite edge
    colouring, depth ~ max lane degree for shuffled input."""
    s_out = np.empty(rl.shape[0], np.int32)
    for p in range(pair_ptr.shape[0] - 1):
        a, b = pair_ptr[p], pair_ptr[p + 1]
        used_r = [0] * 128
        used_c = [0] * 128
        rle, cle = rl[a:b].tolist(), cl[a:b].tolist()
        for i in range(b - a):
            r, c = rle[i], cle[i]
            u = used_r[r] | used_c[c]
            s = (~u & (u + 1)).bit_length() - 1   # lowest clear bit
            s_out[a + i] = s
            bit = 1 << s
            used_r[r] |= bit
            used_c[c] |= bit
    return s_out


@jax.tree_util.register_pytree_node_class
class GatherMatrix:
    """General-sparsity device operator in the lane-binned gather format."""

    ARRAY_FIELDS = ("vals", "hl", "bmeta", "step_flags", "step_pid",
                    "step_gid", "tile_wid", "tile_window", "block_panel")

    def __init__(self, arrays, meta):
        for k, v in arrays.items():
            setattr(self, k, v)
        self.meta = dict(meta)
        for k, v in self.meta.items():
            setattr(self, k, v)
        # BSR operators pack their scalar expansion; n_rows/n_cols stay in
        # BLOCK units (the device-op contract EllMatrix uses) while the
        # kernel arrays live in the expanded scalar space
        self.block_dim = tuple(self.meta.get("block_dim", (1, 1)))

    def tree_flatten(self):
        return (tuple(getattr(self, k) for k in self.ARRAY_FIELDS),
                tuple(sorted(self.meta.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(dict(zip(cls.ARRAY_FIELDS, children)), dict(aux))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def n_pad(self):
        """Padded vector length in BLOCK rows (device-op contract shared
        with DiaMatrix/BandMatrix/EllMatrix: vec_len = n_pad *
        block_dim[0]): apply() accepts any length and pads internally, so
        this is the canonical round-up."""
        bx, by = self.block_dim
        scalar_pad = -(-max(self.n_rows * bx, self.n_cols * by) // 128) \
            * 128
        return -(-scalar_pad // bx)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_blocks(self):
        return self.bmeta.shape[0]

    @property
    def n_steps(self):
        return self.step_flags.shape[0]

    def __repr__(self):
        return (f"GatherMatrix({self.n_rows}x{self.n_cols}, nnz={self.nnz},"
                f" slots={self.slots},"
                f" eff={self.nnz / max(1, self.slots):.2f},"
                f" tiles={self.vals.shape[0]}, blocks={self.n_blocks},"
                f" steps={self.n_steps}, W={self.W}, S_p={self.S_p},"
                f" D={self.D}, G={self.G}, groups={self.n_groups},"
                f" dtype={self.vals.dtype})")

    # -- application ---------------------------------------------------------

    def _pad_x(self, x):
        need = self.n_groups * self.wpg * self.W * 128
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        return x[:need]

    def _use_pallas(self, x):
        # Mosaic has no 64-bit lowering: dDDI falls to the (XLA) reference
        # path, emulated-f64 on TPU
        return jax.default_backend() == "tpu" and \
            self.vals.dtype.itemsize <= 4 and x.dtype.itemsize <= 4

    def apply(self, x):
        L = x.shape[0]
        x1 = self._pad_x(x)
        if self._use_pallas(x):
            y = self._apply_pallas(x1)
        else:
            y = self._apply_ref(x1)
        y = y.reshape(-1)
        if y.shape[0] < L:
            y = jnp.pad(y, (0, L - y.shape[0]))
        return y[:L]

    def apply_rect(self, x):
        """Rectangular apply: ``x`` covers the column space (>= n_cols
        entries, e.g. a shard's [owned | halo] extended vector); returns
        exactly n_rows outputs. ``apply`` above keeps the square
        length-preserving contract the single-chip solvers rely on."""
        x1 = self._pad_x(x)
        y = (self._apply_pallas(x1) if self._use_pallas(x)
             else self._apply_ref(x1)).reshape(-1)
        n = self.n_rows * self.block_dim[0]      # scalar output rows
        if y.shape[0] < n:
            y = jnp.pad(y, (0, n - y.shape[0]))
        return y[:n]

    def _decode_bmeta(self):
        """bmeta (B, R, 128) int8 -> src (B, 128, 128) i32 and the running
        EN plane (B, 128 lanes, Sq) i32 (sign-extended)."""
        Qc = self.Qc
        bm = self.bmeta.astype(jnp.int32)        # sign-extends int8
        src = bm[:, :128]
        nb = bm.shape[0]
        en = bm[:, 128:].reshape(nb, Qc, 128, 128)
        en = jnp.swapaxes(en, 1, 2).reshape(nb, 128, Qc * 128)
        return src, en

    def _apply_ref(self, x1):
        """Reference path (pure jnp; also the CPU execution path). Performs
        the identical gather algebra, fully vectorized over tiles and
        blocks, so the packed arrays are validated by every CPU test."""
        W, S_p, Qc = self.W, self.S_p, self.Qc
        n_panels = self.n_panels
        dt = x1.dtype
        x2w = x1.reshape(-1, 128)[: self.n_windows * W].reshape(
            self.n_windows, W, 128)
        tw = self.tile_window
        hl = self.hl.astype(jnp.int32)
        hi = hl >> 8                                       # indexed by cl
        lane = hl & 255                                    # indexed by rl
        xw = x2w[tw]                                       # (T, W, 128)
        u = jnp.take_along_axis(xw, hi, axis=1)            # (T, D, 128)
        t = jnp.take_along_axis(u, lane, axis=2)
        contrib = t * self.vals[...].astype(dt)
        # tiles are contiguous in padded block order by construction
        src, en = self._decode_bmeta()
        n_blocks = src.shape[0]
        stag = contrib.reshape(n_blocks, 128, 128)
        stagT = jnp.swapaxes(stag, 1, 2)                   # (B, lane, row)
        srt = jnp.take_along_axis(stagT, src, axis=2)
        P = jnp.cumsum(srt, axis=2)
        e = jnp.where(en >= 0,
                      jnp.take_along_axis(P, jnp.maximum(en, 0), axis=2),
                      jnp.zeros((n_blocks, 128, Qc * 128), P.dtype))
        s0 = jnp.concatenate(
            [jnp.zeros((n_blocks, 128, 1), e.dtype), e[..., :-1]], axis=2)
        c = e - s0                                         # (B, lane, q)
        acc = jax.ops.segment_sum(c, self.block_panel,
                                  num_segments=n_panels)
        # (p, lane, q) -> (p, q, lane) -> rows
        y = jnp.swapaxes(acc, 1, 2)
        return y[:, :S_p].reshape(n_panels * S_p, 128)

    def _apply_pallas(self, x1, interpret: bool = False):
        W, D, S_p, Qc, G = self.W, self.D, self.S_p, self.Qc, self.G
        wpg, n_groups = self.wpg, self.n_groups
        n_steps = int(self.step_flags.shape[0])
        tpp = 128 // D
        nv = W // 8
        R = 128 + Qc * 128
        dt = x1.dtype
        x3 = x1.reshape(n_groups, wpg * W, 128)

        def kernel(flags, pid, gid, wid, x_ref, vals_ref, hl_ref, bm_ref,
                   y_ref, stag, acc):
            s = pl.program_id(0)
            f = flags[s]
            live = (f & 4) == 0

            @pl.when(live)
            def _():
                # ---- pass A: stage all G*tpp tiles of the superstep
                def tile_body(t, carry):
                    w = wid[s * (G * tpp) + t]
                    xoff = w * W

                    def chunk(j, c2):
                        hlj = hl_ref[t, pl.ds(j * 8, 8)].astype(jnp.int32)
                        hij = hlj >> 8
                        hs = hij & 7
                        if nv == 1:
                            u = _take2d(
                                x_ref[0, pl.ds(xoff, 8)], hs, axis=0)
                        else:
                            hv = hij >> 3
                            u = jnp.zeros((8, 128), dt)
                            for v in range(nv):
                                g = _take2d(
                                    x_ref[0, pl.ds(xoff + v * 8, 8)],
                                    hs, axis=0)
                                u = jnp.where(hv == v, g, u)
                        lj = hlj & 255
                        tt = _take2d(u, lj, axis=1)
                        stag[pl.ds(t * D + j * 8, 8)] = \
                            tt * vals_ref[t, pl.ds(j * 8, 8)].astype(dt)
                        return c2

                    # static chunk unroll (measured ~2.3x over the rolled
                    # fori at D=64; roll only to bound program size)
                    if D <= 64:
                        for j in range(D // 8):
                            chunk(j, 0)
                    else:
                        jax.lax.fori_loop(0, D // 8, chunk, 0)
                    return carry

                # static tile unroll while the program stays small —
                # dynamic-slice bookkeeping per rolled iteration costs
                # real VPU time on top of every chunk
                if G * tpp <= 32:
                    for t in range(G * tpp):
                        tile_body(t, 0)
                else:
                    jax.lax.fori_loop(0, G * tpp, tile_body, 0)

                # ---- pass B: reduce each block into the panel acc
                first = (f & 1) != 0
                idx0 = jax.lax.broadcasted_iota(
                    jnp.int32, (128, 128), 1) == 0
                # MXU cumsum: P = srt @ upper-triangular ones — one
                # (128,128,128) f32 matmul on the MXU instead of the
                # 7-step roll scan on the VPU (the scan costs ~336
                # vreg-cycles per block and pass B is VPU-bound)
                ir = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                ic = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                triu = (ir <= ic).astype(dt)
                for jb in range(G):
                    src = bm_ref[jb, 0:128].astype(jnp.int32)
                    stagT = jnp.swapaxes(
                        stag[jb * 128:(jb + 1) * 128], 0, 1)
                    srt = _take2d(stagT, src, axis=1)
                    if _MXU_SCAN:
                        # HIGHEST: 3-pass bf16 decomposition ~ f32 exact;
                        # DEFAULT would silently run one bf16 pass
                        # (measured 2e-3 relative error on the cumsum)
                        P = jax.lax.dot_general(
                            srt, triu, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32).astype(dt)
                    else:
                        P = _lane_cumsum(srt)
                    carry = jnp.zeros((128, 128), dt)
                    for qc in range(Qc):
                        ENq = bm_ref[jb, 128 + qc * 128:
                                     128 + (qc + 1) * 128].astype(jnp.int32)
                        e = jnp.where(
                            ENq >= 0,
                            _take2d(P, jnp.maximum(ENq, 0), axis=1),
                            jnp.zeros_like(P))
                        er = pltpu.roll(e, jnp.asarray(1, jnp.int32), 1)
                        s0 = jnp.where(idx0, carry, er)
                        c = e - s0
                        prev = acc[:, qc * 128:(qc + 1) * 128]
                        if jb == 0:
                            prev = jnp.where(first, jnp.zeros_like(c),
                                             prev)
                        acc[:, qc * 128:(qc + 1) * 128] = prev + c
                        carry = er

            @pl.when(jnp.logical_and(live, (f & 2) != 0))
            def _():
                for qc in range(Qc):
                    yq = jnp.swapaxes(acc[:, qc * 128:(qc + 1) * 128],
                                      0, 1)
                    lo = qc * 128
                    if lo >= S_p:
                        continue
                    h = min(128, S_p - lo)
                    y_ref[lo:lo + h] = yq[:h]

        # index-map constants must be typed: bare python 0 traces as i64
        # under jax_enable_x64 and Mosaic can't legalize an i64-returning
        # transform func
        z = np.int32(0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, wpg * W, 128),
                             lambda i, fl, pid, gid, wid: (gid[i], z, z)),
                pl.BlockSpec((G * tpp, D, 128),
                             lambda i, *_: (i, z, z)),
                pl.BlockSpec((G * tpp, D, 128),
                             lambda i, *_: (i, z, z)),
                pl.BlockSpec((G, R, 128),
                             lambda i, *_: (i, z, z)),
            ],
            out_specs=pl.BlockSpec((S_p, 128),
                                   lambda i, fl, pid, *_: (pid[i], z)),
            scratch_shapes=[pltpu.VMEM((G * 128, 128), dt),
                            pltpu.VMEM((128, Qc * 128), dt)],
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((self.n_panels * S_p, 128), dt),
            interpret=interpret,
        )(self.step_flags, self.step_pid, self.step_gid, self.tile_wid,
          x3, self.vals, self.hl, self.bmeta)
        return y


@jax.tree_util.register_pytree_node_class
class GatherComplexMatrix:
    """Complex operator as two real G5 planes sharing every index array:
    y = (Ar xr - Ai xi) + i (Ar xi + Ai xr). Mosaic has no complex
    lowering, so the planes run the real kernel four times (reference:
    complex modes instantiate the same SpMV over cuComplex,
    multiply.cu)."""

    def __init__(self, re: GatherMatrix, im: GatherMatrix):
        self.re = re
        self.im = im
        self.block_dim = re.block_dim

    def tree_flatten(self):
        return ((self.re, self.im), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_rows(self):
        return self.re.n_rows

    @property
    def n_cols(self):
        return self.re.n_cols

    @property
    def n_pad(self):
        return self.re.n_pad

    @property
    def nnz(self):
        return self.re.nnz

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return jnp.result_type(self.re.vals.dtype, 1j)

    def apply(self, x):
        xr, xi = jnp.real(x), jnp.imag(x)
        yr = self.re.apply(xr) - self.im.apply(xi)
        yi = self.re.apply(xi) + self.im.apply(xr)
        return yr + 1j * yi


def _scalar_expand(csr):
    """BSR -> scalar COO expansion matching the interleaved block-vector
    layout (row i*bx+a, col j*by+b); the external block diagonal folds in.
    The reference's SpMV covers bxb blocks natively
    (multiply.cu:1056-1262); on TPU the scalar expansion keeps the G5
    kernel's lane algebra unchanged at identical HBM traffic per value."""
    from ..matrix import CSRMatrix
    bx, by = csr.block_dim
    rn = csr.row_nnz()
    rows_b = np.repeat(np.arange(csr.n_rows, dtype=np.int64), rn)
    cols_b = csr.indices.astype(np.int64)
    data = np.asarray(csr.data).reshape(-1, bx, by)
    ar = np.arange(bx, dtype=np.int64)
    ac = np.arange(by, dtype=np.int64)
    zero = np.zeros((1, bx, by), np.int64)
    rows_s = (rows_b[:, None, None] * bx + ar[None, :, None] + zero).ravel()
    cols_s = (cols_b[:, None, None] * by + ac[None, None, :] + zero).ravel()
    vals_s = data.ravel()
    if csr.diag_data is not None:
        dd = np.asarray(csr.diag_data).reshape(-1, bx, by)
        ib = np.arange(csr.n_rows, dtype=np.int64)
        rows_s = np.concatenate([rows_s, (ib[:, None, None] * bx
                                          + ar[None, :, None]
                                          + zero).ravel()])
        cols_s = np.concatenate([cols_s, (ib[:, None, None] * by
                                          + ac[None, None, :]
                                          + zero).ravel()])
        vals_s = np.concatenate([vals_s, dd.ravel()])
    return CSRMatrix.from_coo(csr.n_rows * bx, csr.n_cols * by,
                              rows_s, cols_s, vals_s)


def pad_gather(gm: GatherMatrix, steps_target: int) -> GatherMatrix:
    """Pad a pack to ``steps_target`` supersteps (tiles/blocks implied:
    T = steps*G*tpp, B = steps*G).

    Cross-shard shape uniformity for the stacked distributed form: the
    SPMD program is identical on every shard, so all shards' arrays must
    share shapes — the max steps over the mesh wins. Pad supersteps carry
    flag bit 4 (skip): the kernel does nothing for them, and their block
    indices repeat the last real step's (Pallas dedups repeated
    same-block fetches, so they cost no DMA)."""
    tpp = 128 // gm.D
    unit_t = gm.G * tpp
    cur = int(gm.step_flags.shape[0])
    if steps_target <= cur:
        return gm
    t_tgt = steps_target * unit_t
    b_tgt = steps_target * gm.G

    def pad0(a, n, fill_last=False, fill=None):
        a = np.asarray(a)
        k = n - a.shape[0]
        if k <= 0:
            return a
        if fill_last:
            tail = np.repeat(a[-1:], k, axis=0)
        elif fill is not None:
            tail = np.full((k,) + a.shape[1:], fill, a.dtype)
        else:
            tail = np.zeros((k,) + a.shape[1:], a.dtype)
        return np.concatenate([a, tail], axis=0)

    arrays = jax.device_put(dict(      # one batched transfer
        vals=pad0(gm.vals, t_tgt),
        hl=pad0(gm.hl, t_tgt),
        bmeta=pad0(gm.bmeta, b_tgt, True),
        step_flags=pad0(gm.step_flags, steps_target, fill=4),
        step_pid=pad0(gm.step_pid, steps_target, True),
        step_gid=pad0(gm.step_gid, steps_target, True),
        tile_wid=pad0(gm.tile_wid, t_tgt, True),
        tile_window=pad0(gm.tile_window, t_tgt, True),
        block_panel=pad0(gm.block_panel, b_tgt, True),
    ))
    meta = dict(gm.meta)
    meta["slots"] = t_tgt * gm.D * 128
    return GatherMatrix(arrays, meta)


def csr_to_gather(csr, dtype=None, W: int = 128, S_p: int = 384,
                  D: Optional[int] = None, G: Optional[int] = None,
                  max_efficiency_waste: float = 8.0,
                  allow_empty: bool = False,
                  retune: bool = True) -> Optional[GatherMatrix]:
    """Build the lane-binned gather format from CSR (setup-phase, host).

    W: x-window height in 128-lane sub-rows (cols per window = W*128);
    multiple of 8, at most 128 (hi indices are 7 bits and the in-kernel
    select tree is W/8-way).  S_p: panel height in 128-row groups; above
    128 it is rounded to a multiple of 128 (one q-extraction chunk each).
    D: tile depth (rows of 128 slots); must divide 128; None = adaptive.
    G: staging blocks per superstep (grid-overhead amortization); None =
    adaptive jointly with D (exact padded-slot + step-overhead model).

    Returns None only for pathological packing efficiency
    (slots/nnz > max_efficiency_waste). Block (BSR) operators pack their
    scalar expansion (interleaved block-vector layout); complex data
    packs two real value planes sharing every index array and returns a
    GatherComplexMatrix. ``allow_empty`` packs a minimal all-zero
    operator instead of returning None (the stacked distributed form
    needs every shard, including consolidated-away empty ones, to carry
    uniform arrays)."""
    blk = csr.block_dim
    n_blk, m_blk = csr.n_rows, csr.n_cols
    csr0 = csr                       # pre-expansion handle (retune path)
    if blk != (1, 1):
        csr = _scalar_expand(csr)
    if csr.nnz == 0 and not allow_empty:
        return None
    dtype = np.dtype(dtype or csr.data.dtype)
    is_c = np.iscomplexobj(csr.data) or dtype.kind == "c"
    if is_c:
        work_dt = np.complex128
        dtype = np.dtype(np.complex128) if dtype.kind != "c" else dtype
    else:
        work_dt = np.float64
    n, m = csr.n_rows, csr.n_cols

    # -- pick geometry -------------------------------------------------------
    W = max(8, min(W, 128, -(-m // 128)))
    W = -(-W // 8) * 8
    n_windows = -(-m // (W * 128))
    S_p = max(8, min(S_p, -(-n // 128)))
    if S_p > 128:
        S_p = -(-S_p // 128) * 128
    else:
        S_p = -(-S_p // 8) * 8
    n_panels = -(-n // (S_p * 128))
    Qc = max(1, -(-S_p // 128))
    wpg = max(1, min(n_windows, _XCAP_BYTES // (W * 128 * 4)))
    n_groups = -(-n_windows // wpg)

    from .. import native
    lib = native.lib()
    pre = None
    if lib is not None and getattr(lib, "_has_prepack", False) \
            and not is_c:
        # native front half: zero-filter + diag fold + index split +
        # stable pair sort + permutation apply, one parallel pass
        pre = lib.gather_prepack(
            n, csr.indptr, csr.indices, csr.data, csr.diag_data,
            S_p * 128, W * 128, n_windows, n_panels * n_windows)
    if pre is not None and pre[6] > 0:
        rl_s, cl_s, hi_s, q_s, vals_s, pair_cnt, nnz = pre
        upairs = np.flatnonzero(pair_cnt)
        ptr_dense = np.concatenate(
            [[0], np.cumsum(pair_cnt)]).astype(np.int64)
        pair_ptr = np.concatenate(
            [ptr_dense[upairs], [nnz]]).astype(np.int64)
    else:
        rows = np.repeat(np.arange(n, dtype=np.int64), csr.row_nnz())
        cols = csr.indices.astype(np.int64)
        vals = csr.data.astype(work_dt)
        if csr.diag_data is not None:
            # fold the external diagonal (DIAG prop) into the stream
            rows = np.concatenate([rows, np.arange(n, dtype=np.int64)])
            cols = np.concatenate([cols, np.arange(n, dtype=np.int64)])
            vals = np.concatenate([vals, csr.diag_data.astype(work_dt)])
        keep = vals != 0
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
        nnz = rows.shape[0]
        if nnz == 0:
            if not allow_empty:
                return None
            # one explicit zero slot: y = 0*x[0] for row 0 — a valid pack
            rows = np.zeros(1, np.int64)
            cols = np.zeros(1, np.int64)
            vals = np.zeros(1, work_dt)
            nnz = 1

        # pow2-aware index splitting (the geometry divisors are powers of
        # two for the default W/S_p; shifts beat int64 division ~5x)
        def _div(a, k):
            return a >> int(k).bit_length() - 1 if k & (k - 1) == 0 \
                else a // k

        def _mod(a, k):
            return a & (k - 1) if k & (k - 1) == 0 else a % k

        panel = _div(rows, S_p * 128)
        window = _div(cols, W * 128)
        rl = _mod(rows, 128).astype(np.int32)
        q = _div(_mod(rows, S_p * 128), 128).astype(np.int32)
        off = _mod(cols, W * 128)
        cl = _mod(off, 128).astype(np.int32)
        hi_local = _div(off, 128).astype(np.int32)
        pair = panel * n_windows + window

        order = None
        if lib is not None and getattr(lib, "_has_csort", False):
            # native path: stable O(nnz) pair sort, no shuffle — the
            # native first-fit orders edges by lane degree internally
            order = lib.counting_sort_perm(pair, n_panels * n_windows)
        if order is None:
            # fallback: panel-major pair ordering, shuffled inside each
            # pair for first-fit balance
            rng = np.random.default_rng(12345)
            shuf = rng.permutation(nnz)
            order = shuf[np.argsort(pair[shuf], kind="stable")]
        pair_s = pair[order]
        rl_s, cl_s = rl[order], cl[order]
        hi_s, q_s, vals_s = hi_local[order], q[order], vals[order]
        bnd = np.flatnonzero(np.diff(pair_s)) + 1    # pair_s is sorted
        pair_starts = np.concatenate([[0], bnd])
        upairs = pair_s[pair_starts]
        pair_ptr = np.concatenate([pair_starts, [nnz]]).astype(np.int64)

    if lib is not None and getattr(lib, "_has_gather_pack", False):
        s_slot = lib.gather_pack(pair_ptr, rl_s, cl_s)
    else:
        s_slot = _pack_pairs_python(pair_ptr, rl_s, cl_s)

    # per-pair depth -> joint (D, G) search on the exact padded-slot count
    n_up = upairs.shape[0]
    if lib is not None and getattr(lib, "_has_prepack", False):
        depth = lib.gather_seg_max(pair_ptr, s_slot)
    else:
        depth = np.maximum.reduceat(s_slot.astype(np.int64) + 1,
                                    pair_ptr[:-1])
    pair_panel = (upairs // n_windows).astype(np.int64)
    pair_group = ((upairs % n_windows) // wpg).astype(np.int64)
    sec_of_pair = pair_panel * n_groups + pair_group
    n_sec = n_panels * n_groups
    iz = 8 if is_c else np.dtype(dtype).itemsize

    def padded_tiles(Dc, Gc):
        tpp_c = 128 // Dc
        unit = Gc * tpp_c
        tiles_pp = -(-depth // Dc)
        T_sec = np.bincount(sec_of_pair, weights=tiles_pp,
                            minlength=n_sec).astype(np.int64)
        T_pad = -(-T_sec // unit) * unit
        # every panel needs >= 1 superstep (its y rows must be written)
        per_panel = T_pad.reshape(n_panels, n_groups)
        empty = per_panel.sum(axis=1) == 0
        per_panel[empty, 0] = unit
        return per_panel.reshape(-1)

    cand_D = [D] if D is not None else [8, 16, 32, 64, 128]
    # G=2 measured fastest across D on v5e (larger supersteps lose
    # intra-step DMA/compute pipelining: G=4 +34%, G=8 ~2x slower)
    cand_G = [G] if G is not None else [2]
    best = None
    for Dc in cand_D:
        if 128 % Dc:
            continue
        for Gc in cand_G:
            if G is None and Gc * (128 // Dc) > 32:
                # keep the superstep's tile loop statically unrollable and
                # its DMA small enough to pipeline against compute
                # (measured: G=8/16 supersteps run ~2x slower than G=4)
                continue
            T_pad_c = padded_tiles(Dc, Gc)
            T_tot_c = int(T_pad_c.sum())
            slots_c = T_tot_c * Dc * 128
            blocks_c = T_tot_c * Dc // 128
            steps_c = max(1, blocks_c // Gc)
            bytes_c = slots_c * (iz + 2) + \
                blocks_c * (128 + Qc * 128) * 128
            cost = bytes_c + steps_c * _STEP_OVERHEAD_BYTES
            if best is None or cost < best[0]:
                best = (cost, Dc, Gc, T_pad_c)
    if best is None:
        raise ValueError(f"tile depth {D} must divide 128")
    _, D, G, T_sec_pad = best
    tpp = 128 // D
    unit = G * tpp

    tiles_per_pair = -(-depth // D)
    tile_base = np.concatenate([[0], np.cumsum(tiles_per_pair)])
    T_real = int(tile_base[-1])
    tile_pair = np.repeat(np.arange(n_up), tiles_per_pair)
    tile_sec_real = sec_of_pair[tile_pair]
    tile_window_real = (upairs[tile_pair] % n_windows).astype(np.int64)

    T_sec = np.bincount(tile_sec_real, minlength=n_sec).astype(np.int64)
    pad_base = np.concatenate([[0], np.cumsum(T_sec_pad)]).astype(np.int64)
    real_base = np.concatenate([[0], np.cumsum(T_sec)]).astype(np.int64)
    T_tot = int(pad_base[-1])
    slots = T_tot * D * 128
    # guard on the packing's own waste; block-padding is bounded per
    # (panel, group) section. Rather than abandoning to the ~1 GB/s ELL
    # gather (round-4 "Known limit"), escalate to taller panels — bigger
    # (panel, window) bins fill better for column-scattered operators
    # (the EN plane grows with Qc, but a 10x-waste G5 still runs ~50x
    # faster than scalarized ELL). The last retry accepts any waste so
    # the layout ladder NEVER falls through for nnz > 128.
    if T_real * D * 128 > max_efficiency_waste * nnz and nnz > 128:
        if retune:
            for (s2, wst) in ((2 * S_p, max_efficiency_waste),
                              (4 * S_p, max_efficiency_waste),
                              (4 * S_p, float("inf"))):
                if s2 > 4096 and wst != float("inf"):
                    continue
                got = csr_to_gather(csr0, dtype=dtype, W=W,
                                    S_p=min(s2, 4096), D=D, G=G,
                                    max_efficiency_waste=wst,
                                    allow_empty=allow_empty,
                                    retune=False)
                if got is not None:
                    return got
        return None
    # padded tile id of each real tile (pads appended at section end)
    tile_in_sec = np.arange(T_real) - real_base[tile_sec_real]
    tile_pad_id = pad_base[tile_sec_real] + tile_in_sec
    # edge -> padded tile placement (a pair's tiles are contiguous in the
    # padded numbering, so the native kernel only needs each pair's first
    # padded tile id)
    if lib is not None and getattr(lib, "_has_prepack", False):
        tile_of_edge, row_in_tile, gb_e, rib_e = lib.gather_finish(
            pair_ptr, s_slot, tile_pad_id[tile_base[:-1]], D)
    else:
        edge_pair_idx = np.repeat(np.arange(n_up), np.diff(pair_ptr))
        tile_of_edge_real = tile_base[edge_pair_idx] + s_slot // D
        row_in_tile = (s_slot % D).astype(np.int64)
        tile_of_edge = tile_pad_id[tile_of_edge_real]
        lin = tile_of_edge * D + row_in_tile
        gb_e = lin // 128
        rib_e = (lin % 128).astype(np.int32)

    # tile metadata over the padded range
    tile_window = np.zeros(T_tot, np.int64)
    tile_window[tile_pad_id] = tile_window_real
    is_real = np.zeros(T_tot, bool)
    is_real[tile_pad_id] = True
    # pad tiles inherit the previous tile's window (their vals are zero;
    # only the x access must stay in range)
    last = np.maximum.accumulate(np.where(is_real, np.arange(T_tot), -1))
    filled = np.where(last >= 0, tile_window[np.maximum(last, 0)], 0)
    tile_window = np.where(is_real, tile_window, filled)
    sec_of_tile = np.searchsorted(pad_base[1:], np.arange(T_tot), "right")
    grp_of_tile = sec_of_tile % n_groups
    tile_wid = np.clip(tile_window - grp_of_tile * wpg, 0,
                       wpg - 1).astype(np.int32)

    B_tot = T_tot // tpp
    block_sec = sec_of_tile[np.arange(B_tot) * tpp]
    block_panel = (block_sec // n_groups).astype(np.int64)
    n_steps = B_tot // G
    step_sec = block_sec[np.arange(n_steps) * G]
    step_pid = (step_sec // n_groups).astype(np.int32)
    step_gid = (step_sec % n_groups).astype(np.int32)
    first = np.empty(n_steps, bool)
    first[0] = True
    first[1:] = step_pid[1:] != step_pid[:-1]
    last_s = np.empty(n_steps, bool)
    last_s[-1] = True
    last_s[:-1] = step_pid[1:] != step_pid[:-1]
    sflags = (first * 1 + last_s * 2).astype(np.int32)

    # -- pack tile arrays + per-block segment planes -------------------------
    post = None
    if lib is not None and getattr(lib, "_has_postpack_en", False) \
            and not is_c and np.dtype(dtype) in (np.dtype(np.float32),
                                                 np.dtype(np.float64)):
        post = lib.gather_postpack(
            T_tot, B_tot, D, Qc, tile_of_edge, row_in_tile, rl_s, cl_s,
            hi_s, np.asarray(vals_s, np.float64), gb_e, rib_e, q_s,
            dtype, en_plane=True)
    if post is not None:
        vals_a, hl_a, bmeta = post
    else:
        vals_a = np.zeros((T_tot, D, 128), dtype)
        hl_a = np.zeros((T_tot, D, 128), np.int16)
        vals_a[tile_of_edge, row_in_tile, rl_s] = vals_s.astype(dtype)
        # hi lives in the high byte at the column lane; lane in the low
        # byte at the row lane (independent positions, one int16 stream)
        np.bitwise_or.at(hl_a, (tile_of_edge, row_in_tile, cl_s),
                         (hi_s.astype(np.int16) << 8))
        np.bitwise_or.at(hl_a, (tile_of_edge, row_in_tile, rl_s),
                         cl_s.astype(np.int16))

        # per-block sort + the running EN plane
        skey = np.lexsort((q_s, rl_s, gb_e))
        gb_, l_, q_, rib_ = gb_e[skey], rl_s[skey], q_s[skey], rib_e[skey]
        grp = gb_ * 128 + l_
        new_grp = np.empty(nnz, bool)
        new_grp[0] = True
        new_grp[1:] = grp[1:] != grp[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(nnz), 0))
        rank = (np.arange(nnz) - grp_start).astype(np.int32)

        src = np.zeros((B_tot, 128, 128), np.int8)
        src[gb_, l_, rank] = rib_.astype(np.int8)
        new_seg = np.empty(nnz, bool)
        new_seg[0] = True
        new_seg[1:] = new_grp[1:] | (q_[1:] != q_[:-1])
        seg_end = np.empty(nnz, bool)
        seg_end[:-1] = new_seg[1:]
        seg_end[-1] = True
        en = np.full((B_tot, 128, Qc * 128), -1, np.int8)
        en[gb_[seg_end], l_[seg_end], q_[seg_end]] = \
            rank[seg_end].astype(np.int8)
        # running forward-fill: ranks increase with q within a lane, so a
        # running max IS the forward fill from -1
        en = np.maximum.accumulate(en, axis=2)
        en_rows = en.reshape(B_tot, 128, Qc, 128).transpose(0, 2, 1, 3) \
            .reshape(B_tot, Qc * 128, 128)
        bmeta = np.concatenate([src, en_rows], axis=1)

    # all index operands pinned to 32-bit: under jax_enable_x64
    # jnp.asarray would keep numpy's int64 and Mosaic has no 64-bit
    # lowering (the kernel would die in convert_element_type)
    # ONE batched transfer for the whole pack: every eager device_put
    # costs a full tunnel round trip (~46 ms) regardless of payload, and
    # AMG hierarchies pack one G5 per level. All index operands pinned to
    # 32-bit: under jax_enable_x64 jnp would keep numpy's int64 and
    # Mosaic has no 64-bit lowering.
    arrays = dict(
        vals=None,                       # filled per value plane below
        hl=hl_a,
        bmeta=bmeta,
        step_flags=np.asarray(sflags, np.int32),
        step_pid=np.asarray(step_pid, np.int32),
        step_gid=np.asarray(step_gid, np.int32),
        tile_wid=np.asarray(tile_wid, np.int32),
        tile_window=tile_window.astype(np.int32),
        block_panel=block_panel.astype(np.int32),
    )
    meta = dict(n_rows=n_blk, n_cols=m_blk, block_dim=tuple(blk),
                nnz=int(csr.nnz), slots=int(slots),
                W=int(W), S_p=int(S_p), D=int(D), Qc=int(Qc), G=int(G),
                n_windows=int(n_windows), n_panels=int(n_panels),
                n_groups=int(n_groups), wpg=int(wpg))
    if is_c:
        # two real planes share every index array (GatherComplexMatrix)
        plane_dt = np.float32 if dtype == np.dtype(np.complex64) \
            else np.float64
        both = jax.device_put(
            dict(arrays, vals=vals_a.real.astype(plane_dt),
                 _im_vals=vals_a.imag.astype(plane_dt)))
        im_plane = both.pop("_im_vals")
        re = GatherMatrix(both, meta)
        im = GatherMatrix(dict(both, vals=im_plane), meta)
        return GatherComplexMatrix(re, im)
    arrays["vals"] = vals_a
    out = GatherMatrix(jax.device_put(arrays), meta)

    # value-update plan (time stepping, ops/value_update): the vals plane
    # is a static scatter of the (pair-sorted) edge stream. Reconstruct
    # the edge ordering from STRUCTURE alone and validate it against the
    # actual packed stream — if it reproduces vals_s exactly, a resetup
    # can upload just the new csr values, permute on host, and scatter
    # into the existing plane on device.
    if blk == (1, 1) and not is_c and csr.nnz:
        try:
            g_rows = np.repeat(np.arange(n, dtype=np.int64),
                               csr.row_nnz())
            g_cols = csr.indices.astype(np.int64)
            g_vals = csr.data.astype(work_dt)
            if csr.diag_data is not None:
                g_rows = np.concatenate(
                    [g_rows, np.arange(n, dtype=np.int64)])
                g_cols = np.concatenate(
                    [g_cols, np.arange(n, dtype=np.int64)])
                g_vals = np.concatenate(
                    [g_vals, csr.diag_data.astype(work_dt)])
            g_keep = g_vals != 0
            if g_keep.all():                  # dropped zeros would lose
                pair_g = (g_rows // (S_p * 128)) * n_windows + \
                    g_cols // (W * 128)
                order_g = None
                if lib is not None and getattr(lib, "_has_csort", False):
                    order_g = lib.counting_sort_perm(
                        pair_g, n_panels * n_windows)
                if order_g is None:
                    rng_g = np.random.default_rng(12345)
                    shuf = rng_g.permutation(g_vals.shape[0])
                    order_g = shuf[np.argsort(pair_g[shuf],
                                              kind="stable")]
                if np.array_equal(g_vals[order_g], vals_s):
                    from .value_update import (attach_plan,
                                               csr_structure_sig)
                    slot_flat = (tile_of_edge * D + row_in_tile) * 128 \
                        + rl_s
                    attach_plan(out, "g5", csr_structure_sig(csr, dtype),
                                slot_flat, T_tot * D * 128)
                    out._vu["src"] = np.ascontiguousarray(order_g,
                                                          np.int64)
        except Exception:                     # noqa: BLE001 — plan is
            pass                              # advisory; rebuild works
    return out
