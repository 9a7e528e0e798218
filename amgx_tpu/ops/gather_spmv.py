"""General-sparsity SpMV: the lane-binned gather format ("G5").

TPU-native replacement for the reference's arbitrary-sparsity CSR SpMV
(base/src/multiply.cu:1056-1262, base/src/amgx_cusparse.cu:84-160).

XLA's 1-D gather scalarizes on TPU (~7 ns/element), so the padded-ELL
fallback runs at ~0.15% of HBM speed of light. Mosaic's ``dynamic_gather``
(= 2-D batched ``take_along_axis``) is the one fast dynamic-indexing
primitive the hardware offers: it gathers within lanes (axis=1) or within
sublanes of a lane (axis=0). This module re-formulates CSR SpMV so that
EVERY dynamic memory access is such a take_along_axis with indices
precomputed at setup:

  Setup partitions rows into *panels* (S_p x 128 rows) and columns into
  *windows* (W x 128 cols); x is viewed as (rows, 128) so a column c lives
  at x2d[c // 128, c % 128].  Within each (panel, window) pair, nnz are
  packed into depth-D tiles subject to one constraint per tile row:
  distinct column-lanes (each is a gather source slot) and distinct
  row-lanes (each is a contribution slot) — a bipartite edge-colouring
  solved greedily with two monotone pointers per lane (O(nnz)).

  Pass A (per tile)    u      = take_along_axis(x_window, hi_idx, axis=0)
                       t      = take_along_axis(u, lane_idx, axis=1)
                       staging[tile_rows] = t * vals
  Pass B (per panel)   sorted = take_along_axis(staging, sort_idx, axis=0)
                       P      = cumsum(sorted, axis=0);  Pex = P - sorted
                       y[q,l] = P[end[q,l], l] - Pex[start[q,l], l]

  ``sort_idx`` is the static per-lane permutation that groups a panel's
  contributions by destination row; ``start``/``end`` are the static
  per-row segment boundaries.  No scatter primitive is ever needed.

HBM traffic is ~12 B per stored slot in the int32 v1 (vals + two gather
index planes amortised) plus one x window re-read per panel; the VPU cost
is ~10 elementwise/gather ops per slot, far under the memory bound, so the
kernel is bandwidth-limited by design.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ta0(op, idx):
    """take_along_axis(axis=0) harmonized to equal leading dims so Mosaic's
    same-shape dynamic_gather constraint is always met."""
    m, k = op.shape[0], idx.shape[0]
    if m == k:
        return jnp.take_along_axis(op, idx, axis=0)
    if m > k:
        pad = jnp.zeros((m - k, idx.shape[1]), idx.dtype)
        return jnp.take_along_axis(op, jnp.concatenate([idx, pad]),
                                   axis=0)[:k]
    pad = jnp.zeros((k - m, op.shape[1]), op.dtype)
    return jnp.take_along_axis(jnp.concatenate([op, pad]), idx, axis=0)


def _cumsum0(x):
    """Axis-0 inclusive cumsum as a log-step Hillis-Steele scan — Mosaic
    has no lowering for the cumsum primitive (first-contact finding), but
    roll + masked add lowers and costs log2(D_tot) vector adds."""
    n = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        r = pltpu.roll(x, s, 0)
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

    ARRAY_FIELDS = ("vals", "hi", "lane", "sort_idx", "start_idx",
                    "end_idx", "step_wid", "step_tid", "step_pid",
                    "step_soff", "step_isred")

    def __init__(self, arrays, meta):
        for k, v in arrays.items():
            setattr(self, k, v)
        self.meta = dict(meta)
        for k, v in self.meta.items():
            setattr(self, k, v)
        self.block_dim = (1, 1)

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
    def dtype(self):
        return self.vals.dtype

    def __repr__(self):
        return (f"GatherMatrix({self.n_rows}x{self.n_cols}, nnz={self.nnz}, "
                f"slots={self.slots}, eff={self.nnz / max(1, self.slots):.2f},"
                f" tiles={self.vals.shape[0]}, dtype={self.vals.dtype})")

    # -- application ---------------------------------------------------------

    def _pad_x(self, x):
        need = self.n_windows * self.W * 128
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        return x[:need].reshape(self.n_windows * self.W, 128)

    def apply(self, x):
        L = x.shape[0]
        x2 = self._pad_x(x)
        if jax.default_backend() == "tpu":
            y = self._apply_pallas(x2)
        else:
            y = self._apply_ref(x2)
        y = y.reshape(-1)
        if y.shape[0] < L:
            y = jnp.pad(y, (0, L - y.shape[0]))
        return y[:L]

    def _apply_ref(self, x2):
        """Reference path (pure jnp; also the CPU execution path). Performs
        the identical gather algebra tile-by-tile so the packed arrays are
        validated by every CPU test."""
        n_p, D_tot = self.n_panels, self.D_tot
        D = self.D
        x2w = x2.reshape(self.n_windows, self.W, 128)
        tp = self.meta["tile_panel_ptr"]
        tw = self.meta["tile_window"]
        ys = []
        for p in range(n_p):
            t0, t1 = int(tp[p]), int(tp[p + 1])
            if t1 > t0:
                xw = x2w[np.asarray(tw[t0:t1])]             # (T_p, W, 128)
                u = jnp.take_along_axis(xw, self.hi[t0:t1], axis=1)
                t = jnp.take_along_axis(u, self.lane[t0:t1], axis=2)
                contrib = (t * self.vals[t0:t1]).reshape(-1, 128)
            else:
                contrib = jnp.zeros((1, 128), self.vals.dtype)
            if contrib.shape[0] < D_tot:
                contrib = jnp.pad(contrib,
                                  ((0, D_tot - contrib.shape[0]), (0, 0)))
            srt = jnp.take_along_axis(contrib, self.sort_idx[p], axis=0)
            P = jnp.cumsum(srt, axis=0)
            Pex = P - srt
            en = self.end_idx[p]
            st = self.start_idx[p]
            e = _ta0(P, jnp.maximum(en, 0))
            s0 = _ta0(Pex, jnp.maximum(st, 0))
            ys.append(jnp.where(st >= 0, e - s0,
                                jnp.zeros_like(e)))
        return jnp.concatenate(ys, axis=0)

    def _apply_pallas(self, x2, interpret: bool = False):
        D, W, S_p, D_tot = self.D, self.W, self.S_p, self.D_tot
        n_steps = int(self.step_wid.shape[0])
        dt = self.vals.dtype

        def kernel(wid, tid, pid, soff, isred, x_ref, vals_ref, hi_ref,
                   lane_ref, sort_ref, st_ref, en_ref, y_ref, stag):
            i = pl.program_id(0)

            @pl.when(isred[i] == 0)
            def _():
                u = _ta0(x_ref[:], hi_ref[0])               # (D, 128)
                t = jnp.take_along_axis(u, lane_ref[0], axis=1)
                stag[pl.ds(soff[i] * D, D)] = t * vals_ref[0]

            @pl.when(isred[i] == 1)
            def _():
                srt = jnp.take_along_axis(stag[:], sort_ref[0], axis=0)
                P = _cumsum0(srt)
                Pex = P - srt
                e = _ta0(P, jnp.maximum(en_ref[0], 0))
                s0 = _ta0(Pex, jnp.maximum(st_ref[0], 0))
                y_ref[:] = jnp.where(st_ref[0] >= 0, e - s0,
                                     jnp.zeros_like(e))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((W, 128),
                             lambda i, wid, *_: (wid[i], 0)),
                pl.BlockSpec((1, D, 128),
                             lambda i, wid, tid, *_: (tid[i], 0, 0)),
                pl.BlockSpec((1, D, 128),
                             lambda i, wid, tid, *_: (tid[i], 0, 0)),
                pl.BlockSpec((1, D, 128),
                             lambda i, wid, tid, *_: (tid[i], 0, 0)),
                pl.BlockSpec((1, D_tot, 128),
                             lambda i, wid, tid, pid, *_: (pid[i], 0, 0)),
                pl.BlockSpec((1, S_p, 128),
                             lambda i, wid, tid, pid, *_: (pid[i], 0, 0)),
                pl.BlockSpec((1, S_p, 128),
                             lambda i, wid, tid, pid, *_: (pid[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((S_p, 128),
                                   lambda i, wid, tid, pid, *_: (pid[i], 0)),
            scratch_shapes=[pltpu.VMEM((D_tot, 128), dt)],
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((self.n_panels * S_p, 128), dt),
            interpret=interpret,
        )(self.step_wid, self.step_tid, self.step_pid, self.step_soff,
          self.step_isred, x2, self.vals, self.hi, self.lane,
          self.sort_idx, self.start_idx, self.end_idx)
        return y


def csr_to_gather(csr, dtype=None, W: int = 1024, S_p: int = 512,
                  D: int = 32, max_staging_rows: int = 4096,
                  max_efficiency_waste: float = 8.0) -> Optional[GatherMatrix]:
    # max_staging_rows bounds the per-panel staging scratch (and the
    # same-height sort_idx blocks) to ~2 MB each so the kernel stays well
    # inside the ~16 MB/core VMEM with Pallas double-buffering
    """Build the lane-binned gather format from CSR (setup-phase, host).

    Returns None for block matrices, complex data, or pathological packing
    efficiency (slots/nnz > max_efficiency_waste)."""
    if csr.block_dim != (1, 1) or csr.nnz == 0:
        return None
    if np.iscomplexobj(csr.data):
        return None
    dtype = np.dtype(dtype or csr.data.dtype)
    if dtype.kind == "c":
        return None
    n, m = csr.n_rows, csr.n_cols
    rows = np.repeat(np.arange(n, dtype=np.int64), csr.row_nnz())
    cols = csr.indices.astype(np.int64)
    vals = csr.data.astype(np.float64)
    if csr.diag_data is not None:
        # fold the external diagonal (DIAG prop) into the stream
        rows = np.concatenate([rows, np.arange(n, dtype=np.int64)])
        cols = np.concatenate([cols, np.arange(n, dtype=np.int64)])
        vals = np.concatenate([vals, csr.diag_data.astype(np.float64)])
    keep = vals != 0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    nnz = rows.shape[0]
    if nnz == 0:
        return None

    # -- pick geometry -------------------------------------------------------
    W = max(8, min(W, -(-m // 128)))
    W = -(-W // 8) * 8
    n_windows = -(-m // (W * 128))
    S_p = max(8, min(S_p, -(-n // 128)))
    S_p = -(-S_p // 8) * 8
    n_panels = -(-n // (S_p * 128))
    # keep per-panel staging below the cap: shrink panels if a panel's nnz
    # would overflow max_staging_rows * 128 slots
    while S_p > 8:
        worst = np.max(np.bincount(rows // (S_p * 128),
                                   minlength=n_panels)) if nnz else 0
        if worst * 1.6 <= max_staging_rows * 128:
            break
        S_p //= 2
        n_panels = -(-n // (S_p * 128))

    panel = rows // (S_p * 128)
    window = cols // (W * 128)
    rl = (rows % 128).astype(np.int32)
    q = ((rows % (S_p * 128)) // 128).astype(np.int32)
    off = cols % (W * 128)
    cl = (off % 128).astype(np.int32)
    hi_local = (off // 128).astype(np.int32)
    pair = panel * n_windows + window

    # panel-major pair ordering, shuffled inside each pair for balance
    rng = np.random.default_rng(12345)
    shuf = rng.permutation(nnz)
    order = shuf[np.argsort(pair[shuf], kind="stable")]
    pair_s = pair[order]
    rl_s, cl_s = rl[order], cl[order]
    upairs, pair_starts = np.unique(pair_s, return_index=True)
    pair_ptr = np.concatenate([pair_starts,
                               [nnz]]).astype(np.int64)

    from .. import native
    lib = native.lib()
    if lib is not None and getattr(lib, "_has_gather_pack", False):
        s_slot = lib.gather_pack(pair_ptr, rl_s, cl_s)
    else:
        s_slot = _pack_pairs_python(pair_ptr, rl_s, cl_s)

    # per-pair depth -> tiles
    n_up = upairs.shape[0]
    edge_pair_idx = np.repeat(np.arange(n_up),
                              np.diff(pair_ptr))
    depth = np.zeros(n_up, np.int64)
    np.maximum.at(depth, edge_pair_idx, s_slot + 1)
    tiles_per_pair = -(-depth // D)
    tile_base = np.concatenate([[0], np.cumsum(tiles_per_pair)])
    T = int(tile_base[-1])
    slots = T * D * 128
    if slots > max_efficiency_waste * nnz and nnz > 128:
        return None

    tile_of_edge = tile_base[edge_pair_idx] + s_slot // D
    row_in_tile = (s_slot % D).astype(np.int64)
    # tile -> (panel, window)
    tile_pair = np.repeat(np.arange(n_up), tiles_per_pair)
    tile_panel = (upairs[tile_pair] // n_windows).astype(np.int64)
    tile_window = (upairs[tile_pair] % n_windows).astype(np.int32)
    tile_panel_ptr = np.searchsorted(
        tile_panel, np.arange(n_panels + 1)).astype(np.int64)
    tile_in_panel = np.arange(T) - tile_panel_ptr[tile_panel]

    # -- pack tile arrays ----------------------------------------------------
    vals_a = np.zeros((T, D, 128), dtype)
    hi_a = np.zeros((T, D, 128), np.int32)
    lane_a = np.zeros((T, D, 128), np.int32)
    vals_a[tile_of_edge, row_in_tile, rl_s] = vals[order].astype(dtype)
    hi_a[tile_of_edge, row_in_tile, cl_s] = hi_local[order]
    lane_a[tile_of_edge, row_in_tile, rl_s] = cl_s

    # -- staging / sorting / boundaries --------------------------------------
    stag_row = tile_in_panel[tile_of_edge] * D + row_in_tile
    panels_of_edge = tile_panel[tile_of_edge]
    panel_rows = (tile_panel_ptr[1:] - tile_panel_ptr[:-1]) * D
    D_tot = int(max(8, panel_rows.max() if T else 8))
    D_tot = -(-D_tot // 8) * 8

    q_s, rl_e = q[order], rl_s
    skey = np.lexsort((q_s, rl_e, panels_of_edge))
    sp_, sl_, sq_, srow_ = (panels_of_edge[skey], rl_e[skey], q_s[skey],
                            stag_row[skey])
    # rank within (panel, lane)
    grp = sp_ * 128 + sl_
    new_grp = np.empty(nnz, bool)
    new_grp[0] = True
    new_grp[1:] = grp[1:] != grp[:-1]
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(nnz), 0))
    rank = np.arange(nnz) - grp_start
    sort_idx = np.zeros((n_panels, D_tot, 128), np.int32)
    sort_idx[sp_, rank, sl_] = srow_.astype(np.int32)

    # segment boundaries per (panel, q, lane): first/last rank of each run
    start_idx = np.full((n_panels, S_p, 128), -1, np.int32)
    end_idx = np.zeros((n_panels, S_p, 128), np.int32)
    new_seg = np.empty(nnz, bool)
    new_seg[0] = True
    new_seg[1:] = (grp[1:] != grp[:-1]) | (sq_[1:] != sq_[:-1])
    seg_end = np.empty(nnz, bool)
    seg_end[:-1] = new_seg[1:]
    seg_end[-1] = True
    start_idx[sp_[new_seg], sq_[new_seg], sl_[new_seg]] = \
        rank[new_seg].astype(np.int32)
    end_idx[sp_[seg_end], sq_[seg_end], sl_[seg_end]] = \
        rank[seg_end].astype(np.int32)

    # -- step schedule -------------------------------------------------------
    # per panel: its tiles (A steps), then one reduce step
    wid_steps, tid_steps, pid_steps, soff_steps, isred_steps = \
        [], [], [], [], []
    last_w, last_t = 0, 0
    for p in range(n_panels):
        t0, t1 = int(tile_panel_ptr[p]), int(tile_panel_ptr[p + 1])
        for t in range(t0, t1):
            wid_steps.append(int(tile_window[t]))
            tid_steps.append(t)
            pid_steps.append(p)
            soff_steps.append(int(tile_in_panel[t]))
            isred_steps.append(0)
            last_w, last_t = int(tile_window[t]), t
        wid_steps.append(last_w)
        tid_steps.append(last_t)
        pid_steps.append(p)
        soff_steps.append(0)
        isred_steps.append(1)

    arrays = dict(
        vals=jnp.asarray(vals_a),
        hi=jnp.asarray(hi_a),
        lane=jnp.asarray(lane_a),
        sort_idx=jnp.asarray(sort_idx),
        start_idx=jnp.asarray(start_idx),
        end_idx=jnp.asarray(end_idx),
        step_wid=jnp.asarray(np.asarray(wid_steps, np.int32)),
        step_tid=jnp.asarray(np.asarray(tid_steps, np.int32)),
        step_pid=jnp.asarray(np.asarray(pid_steps, np.int32)),
        step_soff=jnp.asarray(np.asarray(soff_steps, np.int32)),
        step_isred=jnp.asarray(np.asarray(isred_steps, np.int32)),
    )
    meta = dict(n_rows=n, n_cols=m, nnz=int(csr.nnz), slots=int(slots),
                W=int(W), S_p=int(S_p), D=int(D), D_tot=int(D_tot),
                n_windows=int(n_windows), n_panels=int(n_panels),
                tile_panel_ptr=tuple(int(v) for v in tile_panel_ptr),
                tile_window=tuple(int(v) for v in tile_window))
    return GatherMatrix(arrays, meta)
