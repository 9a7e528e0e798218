"""General-sparsity SpMV: the lane-binned gather format ("G5", rev 2).

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
those:

  Setup partitions rows into *panels* (S_p x 128 rows) and columns into
  *windows* (W x 128 cols, W<=128 sub-rows of the lane-major x view).
  Within each (panel, window) pair, edges pack into depth-D tiles under
  one constraint per tile row: distinct column-lanes (gather sources) and
  distinct row-lanes (contribution slots) — greedy bipartite edge
  colouring (O(nnz), native kernel in csrc/amgx_host.cpp).

  Pass A (per tile, 8-row chunks; hi/lane travel in one int16 plane)
      hs, hv = hi & 7, hi >> 3            # window sub-row -> (vreg, sublane)
      u      = select_v(hv==v, take_along_axis(x_win[v], hs, axis=0))
      t      = take_along_axis(u, lane, axis=1)
      staging[tile rows] = t * vals       # staging: (BPB*128, 128) VMEM

  Pass B (one step per BPB 128-row staging blocks, amortizing the
  per-grid-step cost; per block:)
      stagT  = transpose(staging block)                    # lanes <-> rows
      srt    = take_along_axis(stagT, src, axis=1)         # per-lane sort by q
      P      = lane_cumsum(srt)                            # log-step rolls
      y[l,q] += P[l, en(l,q)] - (P - srt)[l, st(l,q)]      # lane gathers

  ``src`` is the static per-(block, lane) permutation grouping a block's
  contributions by destination row q; ``st``/``en`` are static per-
  (block, lane, q) segment boundaries, encoded (st+1)*128+en in two int8
  byte planes.  src and the boundary bytes ride one int8 "bmeta" stream
  (fewer per-step DMA streams = lower grid overhead).  Destinations q are
  extracted 128 per chunk so every gather source stays a single vreg
  along its gather dimension.  No scatter is ever needed; blocks
  accumulate into a (128, S_p) VMEM accumulator that is transposed into
  the panel's y rows once per panel.

HBM traffic per stored slot: vals (4 B / 2 B bf16) + hl (2 B) + src (1 B)
+ st/en (~2 B at S_p=128 per extraction chunk) plus one x window re-read
per (panel, window) pair.

Known limit: scattered matrices with m >> S_p*128*deg*W*128 leave tiles
nearly empty (the efficiency guard then returns None and the layout
ladder falls back) — very large fully-random operators need a streamed
hierarchical reduction, tracked in COMPONENTS.md.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_cumsum(x):
    """Axis-1 inclusive cumsum as a log-step Hillis-Steele scan — Mosaic
    has no lowering for the cumsum primitive, but roll + masked add
    lowers (first-contact probe) and costs log2(128) vector adds.  (An
    MXU triangular-ones matmul was considered and rejected: ~400+ cycles
    for a (128,128) f32 dot vs ~336 for the scan on v5e.)"""
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

    ARRAY_FIELDS = ("vals", "hl", "bmeta", "step_flags", "step_wid",
                    "step_tid", "step_pid", "step_soff", "step_bid",
                    "tile_window", "block_panel")

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
        return self.bmeta.shape[0] * self.BPB

    def __repr__(self):
        return (f"GatherMatrix({self.n_rows}x{self.n_cols}, nnz={self.nnz}, "
                f"slots={self.slots}, eff={self.nnz / max(1, self.slots):.2f},"
                f" tiles={self.vals.shape[0]}, blocks={self.n_blocks},"
                f" steps={self.step_flags.shape[0]}, W={self.W},"
                f" S_p={self.S_p}, D={self.D}, dtype={self.vals.dtype})")

    # -- application ---------------------------------------------------------

    def _pad_x(self, x):
        need = self.n_windows * self.W * 128
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        return x[:need].reshape(self.n_windows * self.W, 128)

    def _use_pallas(self, x):
        # Mosaic has no 64-bit lowering: dDDI falls to the (XLA) reference
        # path, emulated-f64 on TPU
        return jax.default_backend() == "tpu" and \
            self.vals.dtype.itemsize <= 4 and x.dtype.itemsize <= 4

    def apply(self, x):
        L = x.shape[0]
        x2 = self._pad_x(x)
        if self._use_pallas(x):
            y = self._apply_pallas(x2)
        else:
            y = self._apply_ref(x2)
        y = y.reshape(-1)
        if y.shape[0] < L:
            y = jnp.pad(y, (0, L - y.shape[0]))
        return y[:L]

    def apply_rect(self, x):
        """Rectangular apply: ``x`` covers the column space (>= n_cols
        entries, e.g. a shard's [owned | halo] extended vector); returns
        exactly n_rows outputs. ``apply`` above keeps the square
        length-preserving contract the single-chip solvers rely on."""
        x2 = self._pad_x(x)
        y = (self._apply_pallas(x2) if self._use_pallas(x)
             else self._apply_ref(x2)).reshape(-1)
        n = self.n_rows * self.block_dim[0]      # scalar output rows
        if y.shape[0] < n:
            y = jnp.pad(y, (0, n - y.shape[0]))
        return y[:n]

    def _decode_bmeta(self):
        """bmeta (n_bsteps, BPB*R, 128) int8 -> (src, sten) jnp views over
        all blocks: src (B, 128, 128) i32 and sten (B, Qc, 128, 128) i32."""
        Qc, BPB = self.Qc, self.BPB
        R = 128 + 2 * Qc * 128
        nb = self.bmeta.shape[0] * BPB
        bm = self.bmeta.reshape(nb, R, 128).astype(jnp.int32)
        src = bm[:, :128]
        lo = bm[:, 128:128 + Qc * 128] & 255
        hi = bm[:, 128 + Qc * 128:]
        se = (lo | (hi << 8)).reshape(nb, Qc, 128, 128)
        return src, se

    def _apply_ref(self, x2):
        """Reference path (pure jnp; also the CPU execution path). Performs
        the identical gather algebra, fully vectorized over tiles and
        blocks, so the packed arrays are validated by every CPU test."""
        W, S_p, Qc = self.W, self.S_p, self.Qc
        n_panels = self.n_panels
        dt = x2.dtype
        x2w = x2.reshape(self.n_windows, W, 128)
        tw = self.tile_window
        hl = self.hl.astype(jnp.int32)
        hi = hl >> 8                                       # indexed by cl
        lane = hl & 255                                    # indexed by rl
        xw = x2w[tw]                                       # (T, W, 128)
        u = jnp.take_along_axis(xw, hi, axis=1)            # (T, D, 128)
        t = jnp.take_along_axis(u, lane, axis=2)
        contrib = t * self.vals[...].astype(dt)
        # tiles are contiguous in padded block order by construction
        src, se = self._decode_bmeta()
        n_blocks = src.shape[0]
        stag = contrib.reshape(n_blocks, 128, 128)
        stagT = jnp.swapaxes(stag, 1, 2)                   # (B, lane, row)
        srt = jnp.take_along_axis(stagT, src, axis=2)
        P = jnp.cumsum(srt, axis=2)
        Pex = P - srt
        stp1 = se >> 7
        en = se & 127
        Pb = jnp.broadcast_to(P[:, None], (n_blocks, Qc, 128, 128))
        Pxb = jnp.broadcast_to(Pex[:, None], (n_blocks, Qc, 128, 128))
        e = jnp.take_along_axis(Pb, en, axis=3)
        s0 = jnp.take_along_axis(Pxb, jnp.maximum(stp1 - 1, 0), axis=3)
        c = jnp.where(stp1 > 0, e - s0, jnp.zeros_like(e))
        acc = jax.ops.segment_sum(c, self.block_panel,
                                  num_segments=n_panels)
        # (p, qc, lane, q) -> (p, qc, q, lane) -> rows
        y = jnp.swapaxes(acc, 2, 3).reshape(n_panels, Qc * 128, 128)
        return y[:, :S_p].reshape(n_panels * S_p, 128)

    def _apply_pallas(self, x2, interpret: bool = False):
        W, D, S_p, Qc, BPB = self.W, self.D, self.S_p, self.Qc, self.BPB
        n_steps = int(self.step_flags.shape[0])
        nv = W // 8
        R = 128 + 2 * Qc * 128
        dt = x2.dtype

        def kernel(flags, wid, tid, pid, soff, bid, x_ref, vals_ref, hl_ref,
                   bm_ref, y_ref, stag, acc):
            i = pl.program_id(0)
            f = flags[i]

            @pl.when(f == 0)
            def _():
                def chunk(j, carry):
                    hlj = hl_ref[0, pl.ds(j * 8, 8)].astype(jnp.int32)
                    hij = hlj >> 8
                    hs = hij & 7
                    if nv == 1:
                        u = jnp.take_along_axis(x_ref[:], hs, axis=0)
                    else:
                        hv = hij >> 3
                        u = jnp.zeros((8, 128), dt)
                        for v in range(nv):
                            g = jnp.take_along_axis(
                                x_ref[v * 8:(v + 1) * 8], hs, axis=0)
                            u = jnp.where(hv == v, g, u)
                    lj = hlj & 255
                    t = jnp.take_along_axis(u, lj, axis=1)
                    stag[pl.ds(soff[i] * D + j * 8, 8)] = \
                        t * vals_ref[0, pl.ds(j * 8, 8)].astype(dt)
                    return carry
                if D <= 64:
                    # static unroll measured ~15% faster than the rolled
                    # loop (no dynamic-slice bookkeeping per chunk)
                    for j in range(D // 8):
                        chunk(j, 0)
                else:
                    # rolled: keeps the Mosaic program under the remote
                    # compiler's request-size limit at large D
                    jax.lax.fori_loop(0, D // 8, chunk, 0)

            @pl.when(f > 0)
            def _():
                first = (f & 2) != 0
                for jb in range(BPB):
                    base = jb * R
                    src = bm_ref[0, base:base + 128].astype(jnp.int32)
                    stagT = jnp.swapaxes(
                        stag[jb * 128:(jb + 1) * 128], 0, 1)
                    srt = jnp.take_along_axis(stagT, src, axis=1)
                    P = _lane_cumsum(srt)
                    Pex = P - srt
                    for qc in range(Qc):
                        lo = bm_ref[0, base + 128 + qc * 128:
                                    base + 128 + (qc + 1) * 128].astype(
                            jnp.int32) & 255
                        hi = bm_ref[0, base + 128 + Qc * 128 + qc * 128:
                                    base + 128 + Qc * 128 +
                                    (qc + 1) * 128].astype(jnp.int32)
                        se = lo | (hi << 8)
                        stp1 = se >> 7
                        en = se & 127
                        e = jnp.take_along_axis(P, en, axis=1)
                        s0 = jnp.take_along_axis(
                            Pex, jnp.maximum(stp1 - 1, 0), axis=1)
                        c = jnp.where(stp1 > 0, e - s0, jnp.zeros_like(e))
                        if jb == 0:
                            prev = jnp.where(first, jnp.zeros_like(c),
                                             acc[:, qc * 128:(qc + 1) * 128])
                        else:
                            prev = acc[:, qc * 128:(qc + 1) * 128]
                        acc[:, qc * 128:(qc + 1) * 128] = prev + c

            @pl.when((f & 4) != 0)
            def _():
                for qc in range(Qc):
                    yq = jnp.swapaxes(acc[:, qc * 128:(qc + 1) * 128], 0, 1)
                    lo = qc * 128
                    if lo >= S_p:
                        continue
                    h = min(128, S_p - lo)
                    y_ref[lo:lo + h] = yq[:h]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((W, 128),
                             lambda i, fl, wid, *_: (wid[i], 0)),
                pl.BlockSpec((1, D, 128),
                             lambda i, fl, wid, tid, *_: (tid[i], 0, 0)),
                pl.BlockSpec((1, D, 128),
                             lambda i, fl, wid, tid, *_: (tid[i], 0, 0)),
                pl.BlockSpec((1, BPB * R, 128),
                             lambda i, fl, wid, tid, pid, soff, bid:
                             (bid[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((S_p, 128),
                                   lambda i, fl, wid, tid, pid, *_:
                                   (pid[i], 0)),
            scratch_shapes=[pltpu.VMEM((BPB * 128, 128), dt),
                            pltpu.VMEM((128, Qc * 128), dt)],
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((self.n_panels * S_p, 128), dt),
            interpret=interpret,
        )(self.step_flags, self.step_wid, self.step_tid, self.step_pid,
          self.step_soff, self.step_bid, x2, self.vals, self.hl, self.bmeta)
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


def pad_gather(gm: GatherMatrix, nb_target: int) -> GatherMatrix:
    """Pad a pack to ``nb_target`` B-steps (tiles/blocks/steps implied:
    T = NB*unit, B = NB*BPB, steps = NB*(unit+1)).

    Cross-shard shape uniformity for the stacked distributed form: the
    SPMD program is identical on every shard, so all shards' arrays must
    share shapes — the max NB over the mesh wins. Pad steps replicate the
    last real step's block indices (Pallas dedups repeated same-block
    fetches, so they cost no DMA) as pass-A steps with soff=0: they
    restage dead data that no B-step ever reads."""
    unit = gm.BPB * (128 // gm.D)
    nb_cur = int(gm.bmeta.shape[0])
    if nb_target <= nb_cur:
        return gm
    t_tgt = nb_target * unit
    b_tgt = nb_target * gm.BPB
    s_tgt = nb_target * (unit + 1)

    def pad0(a, n, fill_last=False):
        a = np.asarray(a)
        k = n - a.shape[0]
        if k <= 0:
            return a
        tail = np.repeat(a[-1:], k, axis=0) if fill_last else \
            np.zeros((k,) + a.shape[1:], a.dtype)
        return np.concatenate([a, tail], axis=0)

    arrays = dict(
        vals=jnp.asarray(pad0(gm.vals, t_tgt)),
        hl=jnp.asarray(pad0(gm.hl, t_tgt)),
        bmeta=jnp.asarray(pad0(gm.bmeta, nb_target)),
        step_flags=jnp.asarray(pad0(gm.step_flags, s_tgt)),
        step_wid=jnp.asarray(pad0(gm.step_wid, s_tgt, True)),
        step_tid=jnp.asarray(pad0(gm.step_tid, s_tgt, True)),
        step_pid=jnp.asarray(pad0(gm.step_pid, s_tgt, True)),
        step_soff=jnp.asarray(pad0(gm.step_soff, s_tgt)),
        step_bid=jnp.asarray(pad0(gm.step_bid, s_tgt, True)),
        tile_window=jnp.asarray(pad0(gm.tile_window, t_tgt, True)),
        block_panel=jnp.asarray(pad0(gm.block_panel, b_tgt, True)),
    )
    meta = dict(gm.meta)
    meta["slots"] = t_tgt * gm.D * 128
    return GatherMatrix(arrays, meta)


def csr_to_gather(csr, dtype=None, W: int = 64, S_p: int = 512,
                  D: Optional[int] = None, BPB: int = 2,
                  max_efficiency_waste: float = 8.0,
                  allow_empty: bool = False) -> Optional[GatherMatrix]:
    """Build the lane-binned gather format from CSR (setup-phase, host).

    W: x-window height in 128-lane sub-rows (cols per window = W*128);
    multiple of 8, at most 128 (hi indices are 7 bits and the in-kernel
    select tree is W/8-way).  S_p: panel height in 128-row groups; above
    128 it is rounded to a multiple of 128 (one q-extraction chunk each).
    D: tile depth (rows of 128 slots); must divide 128; None = adaptive.
    BPB: staging blocks reduced per B-step (amortizes grid overhead).

    Returns None only for pathological packing efficiency
    (slots/nnz > max_efficiency_waste). Block (BSR) operators pack their
    scalar expansion (interleaved block-vector layout); complex data
    packs two real value planes sharing every index array and returns a
    GatherComplexMatrix. ``allow_empty`` packs a minimal all-zero
    operator instead of returning None (the stacked distributed form
    needs every shard, including consolidated-away empty ones, to carry
    uniform arrays)."""

    import time as _t, os as _os
    _dbg = bool(_os.environ.get("AMGX_PACK_DEBUG"))
    _tm = {"last": _t.perf_counter()}
    def _tick(name):
        if _dbg:
            now = _t.perf_counter()
            print("PACK", name, round(now - _tm["last"], 3), flush=True)
            _tm["last"] = now
    blk = csr.block_dim
    n_blk, m_blk = csr.n_rows, csr.n_cols
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

    _tick('extract')
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

    # pow2-aware index splitting (the geometry divisors are powers of two
    # for the default W/S_p; shifts beat int64 division ~5x on 10M edges)
    def _div(a, k):
        return a >> int(k).bit_length() - 1 if k & (k - 1) == 0 else a // k

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

    _tick('geometry')
    from .. import native
    lib = native.lib()
    order = None
    if lib is not None and getattr(lib, "_has_csort", False):
        # native path: stable O(nnz) pair sort, no shuffle — the native
        # first-fit orders edges by lane degree internally (gather_pack)
        order = lib.counting_sort_perm(pair, n_panels * n_windows)
    if order is None:
        # fallback: panel-major pair ordering, shuffled inside each pair
        # for first-fit balance
        rng = np.random.default_rng(12345)
        shuf = rng.permutation(nnz)
        order = shuf[np.argsort(pair[shuf], kind="stable")]
    pair_s = pair[order]
    rl_s, cl_s = rl[order], cl[order]
    bnd = np.flatnonzero(np.diff(pair_s)) + 1        # pair_s is sorted
    pair_starts = np.concatenate([[0], bnd])
    upairs = pair_s[pair_starts]
    pair_ptr = np.concatenate([pair_starts, [nnz]]).astype(np.int64)

    _tick('order')
    if lib is not None and getattr(lib, "_has_gather_pack", False):
        s_slot = lib.gather_pack(pair_ptr, rl_s, cl_s)
    else:
        s_slot = _pack_pairs_python(pair_ptr, rl_s, cl_s)

    _tick('firstfit')
    # per-pair depth -> tile depth D (adaptive) -> tiles
    n_up = upairs.shape[0]
    edge_pair_idx = np.repeat(np.arange(n_up), np.diff(pair_ptr))
    depth = np.maximum.reduceat(s_slot.astype(np.int64) + 1,
                                pair_ptr[:-1])
    if D is None:
        # cost model: slot traffic + per-grid-step overhead (~350 ns/step
        # measured on v5e ~ the time 10k slot-bytes take at HBM speed)
        best = None
        for cand in (16, 32, 64, 128):
            slots_c = int(np.sum(-(-depth // cand)) * cand) * 128
            steps_c = slots_c // (cand * 128) + slots_c // (128 * 128) // BPB
            cost = slots_c + steps_c * 40000
            if best is None or cost < best[0]:
                best = (cost, cand)
        D = best[1]
    if 128 % D != 0:
        raise ValueError(f"tile depth {D} must divide 128")
    tpp = 128 // D                       # tiles per staging block
    unit = BPB * tpp                     # tiles per B-step
    tiles_per_pair = -(-depth // D)
    tile_base = np.concatenate([[0], np.cumsum(tiles_per_pair)])
    T_real = int(tile_base[-1])

    tile_of_edge_real = tile_base[edge_pair_idx] + s_slot // D
    row_in_tile = (s_slot % D).astype(np.int64)
    tile_pair = np.repeat(np.arange(n_up), tiles_per_pair)
    tile_panel_real = (upairs[tile_pair] // n_windows).astype(np.int64)
    tile_window_real = (upairs[tile_pair] % n_windows).astype(np.int64)

    # pad each panel's tile count to a multiple of the B-step unit (>= 1
    # unit even for empty panels, so every panel's y rows get written)
    T_p = np.bincount(tile_panel_real, minlength=n_panels)
    T_p_pad = np.maximum(unit, -(-T_p // unit) * unit)
    pad_base = np.concatenate([[0], np.cumsum(T_p_pad)]).astype(np.int64)
    real_base = np.concatenate([[0], np.cumsum(T_p)]).astype(np.int64)
    T_tot = int(pad_base[-1])
    slots = T_tot * D * 128
    # guard on the packing's own waste; block-padding is bounded per panel
    if T_real * D * 128 > max_efficiency_waste * nnz and nnz > 128:
        return None
    # padded tile id of each real tile (pads appended at panel end)
    tile_in_panel = np.arange(T_real) - real_base[tile_panel_real]
    tile_pad_id = pad_base[tile_panel_real] + tile_in_panel
    tile_of_edge = tile_pad_id[tile_of_edge_real]

    # tile metadata over the padded range
    tile_window = np.zeros(T_tot, np.int64)
    tile_window[tile_pad_id] = tile_window_real
    is_real = np.zeros(T_tot, bool)
    is_real[tile_pad_id] = True
    # pad tiles inherit the previous tile's window so the x stream dedups
    last = np.maximum.accumulate(np.where(is_real, np.arange(T_tot), -1))
    filled = np.where(last >= 0, tile_window[np.maximum(last, 0)], 0)
    tile_window = np.where(is_real, tile_window, filled)

    n_blocks_p = (T_p_pad // tpp).astype(np.int64)
    block_base = np.concatenate([[0], np.cumsum(n_blocks_p)]).astype(np.int64)
    B_tot = int(block_base[-1])
    block_panel = np.searchsorted(block_base[1:], np.arange(B_tot), "right")
    n_bsteps_p = n_blocks_p // BPB
    bstep_base = np.concatenate([[0],
                                 np.cumsum(n_bsteps_p)]).astype(np.int64)
    NB = int(bstep_base[-1])

    _tick('tilemeta')
    # -- pack tile arrays + per-block segment planes -------------------------
    stag_row = (tile_in_panel[tile_of_edge_real] * D + row_in_tile)
    gb_e = block_base[panel[order]] + stag_row // 128
    rib_e = (stag_row % 128).astype(np.int32)
    q_s = q[order]
    vals_s = vals[order]
    R = 128 + 2 * Qc * 128
    post = None
    if lib is not None and getattr(lib, "_has_postpack", False) \
            and not is_c and np.dtype(dtype) in (np.dtype(np.float32),
                                                 np.dtype(np.float64)):
        post = lib.gather_postpack(
            T_tot, B_tot, D, Qc, tile_of_edge, row_in_tile, rl_s, cl_s,
            hi_local[order], vals_s.astype(np.float64), gb_e, rib_e, q_s,
            dtype)
    if post is not None:
        vals_a, hl_a, bmeta = post
        bmeta = bmeta.reshape(NB, BPB * R, 128)
    else:
        vals_a = np.zeros((T_tot, D, 128), dtype)
        hl_a = np.zeros((T_tot, D, 128), np.int16)
        vals_a[tile_of_edge, row_in_tile, rl_s] = vals_s.astype(dtype)
        # hi lives in the high byte at the column lane; lane in the low
        # byte at the row lane (independent positions, one int16 stream)
        np.bitwise_or.at(hl_a, (tile_of_edge, row_in_tile, cl_s),
                         (hi_local[order] << 8).astype(np.int16))
        np.bitwise_or.at(hl_a, (tile_of_edge, row_in_tile, rl_s),
                         cl_s.astype(np.int16))

        # per-block sort + segment boundary planes
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
        sten = np.zeros((B_tot, Qc * 128, 128), np.int16)
        qs_seg = q_[new_seg]
        code = ((rank[new_seg].astype(np.int32) + 1) * 128 +
                rank[seg_end].astype(np.int32)).astype(np.int16)
        sten[gb_[new_seg], (qs_seg // 128) * 128 + l_[new_seg],
             qs_seg % 128] = code
        # fold src + sten byte planes into one int8 stream per B-step:
        # per sub-block: [src (128) | sten-lo (Qc*128) | sten-hi (Qc*128)]
        sb = sten.view(np.uint8).reshape(B_tot, Qc * 128, 128, 2)
        bmeta = np.concatenate(
            [src, sb[..., 0].view(np.int8), sb[..., 1].view(np.int8)],
            axis=1)                                        # (B_tot, R, 128)
        bmeta = bmeta.reshape(NB, BPB * R, 128)

    _tick('postpack')
    # -- step schedule: per panel, [A x unit, B] per B-step -------------------
    steps_per_unit = unit + 1
    n_steps = NB * steps_per_unit
    step = np.arange(n_steps)
    bstep_of_step = step // steps_per_unit
    pos = step % steps_per_unit
    is_b = pos == unit
    tile_id = bstep_of_step * unit + np.minimum(pos, unit - 1)
    sbid = bstep_of_step.astype(np.int32)
    spid = block_panel[bstep_of_step * BPB].astype(np.int32)
    stid = tile_id.astype(np.int32)
    swid = tile_window[tile_id].astype(np.int32)
    ssoff = np.where(is_b, 0, pos).astype(np.int32)
    first_b = bstep_base[spid] == bstep_of_step
    last_b = (bstep_base[spid] + n_bsteps_p[spid] - 1) == bstep_of_step
    sflags = np.where(is_b, 1 + 2 * first_b + 4 * last_b, 0).astype(np.int32)

    _tick('schedule')
    arrays = dict(
        vals=None,                       # filled per value plane below
        hl=jnp.asarray(hl_a),
        bmeta=jnp.asarray(bmeta),
        step_flags=jnp.asarray(sflags),
        step_wid=jnp.asarray(swid),
        step_tid=jnp.asarray(stid),
        step_pid=jnp.asarray(spid),
        step_soff=jnp.asarray(ssoff),
        step_bid=jnp.asarray(sbid),
        tile_window=jnp.asarray(tile_window.astype(np.int32)),
        block_panel=jnp.asarray(block_panel.astype(np.int32)),
    )
    meta = dict(n_rows=n_blk, n_cols=m_blk, block_dim=tuple(blk),
                nnz=int(csr.nnz), slots=int(slots),
                W=int(W), S_p=int(S_p), D=int(D), Qc=int(Qc), BPB=int(BPB),
                n_windows=int(n_windows), n_panels=int(n_panels))
    if is_c:
        # two real planes share every index array (GatherComplexMatrix)
        plane_dt = np.float32 if dtype == np.dtype(np.complex64) \
            else np.float64
        re = GatherMatrix(
            dict(arrays, vals=jnp.asarray(vals_a.real.astype(plane_dt))),
            meta)
        im = GatherMatrix(
            dict(arrays, vals=jnp.asarray(vals_a.imag.astype(plane_dt))),
            meta)
        return GatherComplexMatrix(re, im)
    arrays["vals"] = jnp.asarray(vals_a)
    return GatherMatrix(arrays, meta)
