"""Row partitioning and halo-map construction.

TPU re-design of the reference's DistributedManager / DistributedArranger
(base/src/distributed/distributed_manager.cu:1359-1731,
distributed_arranger.cu): a global CSR is row-partitioned over a 1-D device
mesh; each shard's columns are renumbered owned-local-first with halo slots
appended (renumberMatrixOneRing analog), rows are sorted interior->boundary
(ViewType row classes, vector.h:41-52), and per-neighbor boundary->local
send maps (B2L) become a packed gather table.

Because SPMD programs must be identical on every device, all per-device
quantities (local rows, halo count, boundary count, ELL width) are padded to
the max over devices and stacked on a leading device axis, sharded over the
mesh.

The exchange itself (comms.py) maps AMGX's MPI halo exchange onto XLA
collectives over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..matrix import CSRMatrix


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


@dataclass
class RowPartition:
    """Contiguous row ranges per device (reference: part_offsets /
    partition-vector upload paths, distributed_manager.cu:1144/1280)."""

    offsets: np.ndarray          # (n_dev + 1,)

    @classmethod
    def equal(cls, n_rows: int, n_dev: int) -> "RowPartition":
        base = n_rows // n_dev
        rem = n_rows % n_dev
        sizes = np.full(n_dev, base, np.int64)
        sizes[:rem] += 1
        return cls(np.concatenate([[0], np.cumsum(sizes)]))

    @classmethod
    def consolidated(cls, n_rows: int, n_dev: int, n_active: int
                     ) -> "RowPartition":
        """Rows distributed over only the first ``n_active`` devices;
        trailing devices own zero rows (the reference's coarse-level
        consolidation/gluing, amg.cu:328-391 + glue.h: root partitions
        continue, the rest idle). On TPU every shard still executes the
        SPMD program, but idle shards carry only zero padding, so halo
        tables and collective payloads shrink with the active set."""
        n_active = max(1, min(n_dev, n_active))
        inner = cls.equal(n_rows, n_active)
        pad = np.full(n_dev - n_active, n_rows, np.int64)
        return cls(np.concatenate([inner.offsets, pad]))

    @classmethod
    def from_partition_vector(cls, pv: np.ndarray, n_dev: int
                              ) -> Tuple["RowPartition", np.ndarray]:
        """Non-contiguous partition vector -> permutation to contiguous +
        offsets (reference: loadDistributedMatrix partition-vector path)."""
        pv = np.asarray(pv)
        order = np.argsort(pv, kind="stable")
        sizes = np.bincount(pv, minlength=n_dev)
        return cls(np.concatenate([[0], np.cumsum(sizes)])), order

    @property
    def n_dev(self) -> int:
        return len(self.offsets) - 1

    def size(self, d: int) -> int:
        return int(self.offsets[d + 1] - self.offsets[d])

    def owner_of(self, global_rows: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.offsets, global_rows, side="right") - 1


class DistEllMatrix:
    """Device-sharded rectangular ELL operator with halo gather maps.

    Data layout (leading axis = device, sharded over the mesh):
      cols     (D, Lr, W) int32 — local column ids; < Lc means owned column
               slot, >= Lc means halo slot (Lc + h)
      vals     (D, Lr, W)
      pack_idx (D, Bmax) int32 — owned-column slots this shard contributes
               to the exchange table (the B2L map, padded by repeating 0)
      halo_from (D, Hmax) int32 — flat index into the all-gathered
               (D*Bmax) table for each halo slot
      interior_rows (D,) int32 — rows [0, interior) reference no halo slot
               (ViewType INTERIOR), enabling comm/compute overlap
    """

    def __init__(self, cols, vals, pack_idx, halo_from, interior_rows,
                 n_rows: int, n_cols: int, row_part: RowPartition,
                 col_part: RowPartition, lr: int, lc: int, nnz: int,
                 row_perm: Optional[np.ndarray] = None,
                 col_perm: Optional[np.ndarray] = None,
                 block_dim=(1, 1)):
        self.cols = cols
        self.vals = vals
        self.pack_idx = pack_idx
        self.halo_from = halo_from
        self.interior_rows = interior_rows
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.row_part = row_part
        self.col_part = col_part
        self.lr = lr                  # padded local rows
        self.lc = lc                  # padded local (owned) cols
        self.nnz = nnz
        self.row_perm = row_perm      # global row id per (dev, local slot)
        self.col_perm = col_perm      # same for the column space (square
                                      # reordered operators share row_perm)
        self.block_dim = (int(block_dim[0]), int(block_dim[1]))

    @property
    def n_dev(self) -> int:
        return self.row_part.n_dev

    @property
    def bmax(self) -> int:
        return self.pack_idx.shape[1]

    @property
    def hmax(self) -> int:
        return self.halo_from.shape[1]

    # -- construction --------------------------------------------------------

    @classmethod
    def from_global(cls, csr: CSRMatrix, n_dev: int,
                    row_part: Optional[RowPartition] = None,
                    col_part: Optional[RowPartition] = None,
                    dtype=None, mesh: Optional[Mesh] = None,
                    axis: str = "x", sort_interior_first: bool = True
                    ) -> "DistEllMatrix":
        csr = csr.fold_diagonal()   # DIAG property: merge before sharding
        dtype = dtype or csr.data.dtype
        bx, by = csr.block_dim
        if row_part is None:
            row_part = RowPartition.equal(csr.n_rows, n_dev)
        if col_part is None:
            col_part = (row_part if csr.n_cols == csr.n_rows
                        else RowPartition.equal(csr.n_cols, n_dev))
        rn = csr.row_nnz()
        g_rows = np.repeat(np.arange(csr.n_rows, dtype=np.int64), rn)
        g_cols = csr.indices.astype(np.int64)
        blocks = []
        for d in range(n_dev):
            r0, r1 = row_part.offsets[d], row_part.offsets[d + 1]
            sel = slice(csr.indptr[r0], csr.indptr[r1])
            blocks.append((g_rows[sel] - r0, g_cols[sel], csr.data[sel]))
        return cls.from_shards(blocks, row_part, col_part, csr.n_rows,
                               csr.n_cols, dtype=dtype, mesh=mesh, axis=axis,
                               sort_interior_first=sort_interior_first,
                               block_dim=(bx, by))

    @classmethod
    def from_shards(cls, blocks, row_part: RowPartition,
                    col_part: RowPartition, n_rows: int, n_cols: int,
                    dtype=None, mesh: Optional[Mesh] = None,
                    axis: str = "x", sort_interior_first: bool = True,
                    block_dim=(1, 1)) -> "DistEllMatrix":
        """Build from per-shard row blocks — the shard-parallel setup entry
        (reference: each rank assembles from its own rows,
        distributed_manager.cu:1388 renumberMatrixOneRing). ``blocks[d]`` is
        a (local_rows, global_cols, vals) triple covering only the rows
        device d owns; no global operator is materialized.

        ``blocks[d]`` may be None in multi-process runs: each process
        passes only its addressable devices' blocks (the reference's
        rank-local storage, distributed_manager.cu:1144). Cross-process
        metadata — every device's halo column set, the global ELL width —
        moves with boundary-sized allgathers; cols/vals device arrays are
        assembled from process-local shards only (O(nnz/P) host memory
        per process)."""
        from . import multihost as mh
        bx, by = block_dim
        n_dev = row_part.n_dev
        local_devs = [d for d in range(n_dev) if blocks[d] is not None]
        partial = len(local_devs) < n_dev
        if partial and mesh is None:
            raise ValueError("partial per-shard blocks require a mesh")
        if dtype is None:
            dtype = blocks[local_devs[0]][2].dtype

        lr = _round_up(int(np.max(np.diff(row_part.offsets))), 8)
        lc = _round_up(int(np.max(np.diff(col_part.offsets))), 8)

        def stack(rows_by_dev, row_shape, dt):
            # device-array assembly from per-device host rows; partial
            # mode places only addressable shards (O(N/P) per process)
            if mesh is not None:
                return mh.put_stacked(rows_by_dev, n_dev, row_shape,
                                      np.dtype(dt), mesh, axis)
            out = np.zeros((n_dev,) + tuple(row_shape), dt)
            for d, v in rows_by_dev.items():
                out[d] = v
            return jnp.asarray(out)

        per_dev = {}
        for d in local_devs:
            r0, r1 = row_part.offsets[d], row_part.offsets[d + 1]
            rows_l, cols_g, vals = blocks[d]
            rows_l = np.asarray(rows_l, np.int64)
            cols_g = np.asarray(cols_g, np.int64)
            owner = col_part.owner_of(cols_g)
            owned = owner == d
            c0 = col_part.offsets[d]
            # halo columns: unique sorted remote (owner, global col)
            halo_g = np.unique(cols_g[~owned])
            halo_slot = {g: i for i, g in enumerate(halo_g)}
            cols_l = np.where(owned, cols_g - c0, 0)
            if halo_g.size:
                remote_slots = np.array([halo_slot[g]
                                         for g in cols_g[~owned]])
                cols_l[~owned] = lc + remote_slots
            # row classes: interior rows touch no halo column
            n_loc = r1 - r0
            has_halo = np.zeros(n_loc, bool)
            np.logical_or.at(has_halo, rows_l, ~owned)
            per_dev[d] = dict(rows_l=rows_l, cols_l=cols_l, vals=vals,
                              halo_g=halo_g, has_halo=has_halo,
                              n_loc=n_loc)

        # every device's halo column set (boundary-sized): the one piece of
        # cross-process metadata the pack/ring tables need
        if partial:
            all_halo = mh.gather_per_dev(
                n_dev, {d: per_dev[d]["halo_g"].astype(np.int64)
                        for d in local_devs})
            all_halo = [np.zeros(0, np.int64) if h is None else h
                        for h in all_halo]
        else:
            all_halo = [per_dev[d]["halo_g"] for d in range(n_dev)]

        # interior-first permutation per device (renumberMatrixOneRing).
        # The permutation relabels the row space; when the column space IS
        # the row space (square operator, same partition), owned column ids
        # and the pack (B2L) table must be relabeled identically so x-vector
        # slots stay consistent. For rectangular operators (P/R) the column
        # space belongs to another level, so rows keep natural order.
        same_space = col_part is row_part or (
            np.array_equal(col_part.offsets, row_part.offsets)
            and n_rows == n_cols)
        reorder = sort_interior_first and same_space
        if partial and reorder:
            # interior-first relabeling needs every owner's permutation to
            # relabel pack tables — rank-local callers use natural order
            # (the sharded setup always does)
            raise NotImplementedError(
                "interior-first row sorting is not supported with "
                "rank-local (partial) blocks; pass "
                "sort_interior_first=False")
        # natural order in partial mode: the permutation is implied by the
        # offsets, so no O(N) table is kept per process
        row_perm = None if partial else np.zeros((n_dev, lr), np.int64)
        ranks = {}
        for d in local_devs:
            info = per_dev[d]
            n_loc = info["n_loc"]
            if reorder:
                order = np.argsort(info["has_halo"], kind="stable")
            else:
                order = np.arange(n_loc)
            rank = np.empty(n_loc, np.int64)
            rank[order] = np.arange(n_loc)
            ranks[d] = rank
            info["rows_l"] = rank[info["rows_l"]]
            info["interior"] = int((~info["has_halo"]).sum()) \
                if reorder else 0
            if row_perm is not None:
                row_perm[d, :n_loc] = row_part.offsets[d] + order
                row_perm[d, n_loc:] = -1
            info["order"] = order
        if reorder:
            for d in local_devs:
                info = per_dev[d]
                owned_mask = info["cols_l"] < lc
                info["cols_l"][owned_mask] = \
                    ranks[d][info["cols_l"][owned_mask]]

        # boundary (B2L) tables: what each device must send
        # halo_g of device d lives on owner o at local slot (g - c0_o); the
        # owner packs those slots; we need consistent pack lists per owner
        all_g = np.concatenate(all_halo) if all_halo else \
            np.zeros(0, np.int64)
        all_o = col_part.owner_of(all_g) if all_g.size else \
            np.zeros(0, np.int64)
        pack_lists = [np.unique(all_g[all_o == o]) for o in range(n_dev)]
        bmax = _round_up(max(1, max(p.size for p in pack_lists)), 8)
        hmax = _round_up(max(1, max(h.size for h in all_halo)), 8)

        # NOTE: pack_idx indexes the *column-space* local vector of the owner
        # (through the owner's interior-first relabeling when active).
        # These tables are boundary-sized, so every process computes the
        # full set even in partial mode.
        pack_idx = np.zeros((n_dev, bmax), np.int32)
        for o in range(n_dev):
            if not pack_lists[o].size:
                continue
            slot = pack_lists[o] - col_part.offsets[o]
            if reorder:
                slot = ranks[o][slot]
            pack_idx[o, :slot.size] = slot
        halo_from = np.zeros((n_dev, hmax), np.int32)
        for d in range(n_dev):
            hg = all_halo[d]
            if not hg.size:
                continue
            owners = col_part.owner_of(hg)
            pos = np.empty(hg.size, np.int64)
            for o in np.unique(owners):
                grp = owners == o
                pos[grp] = np.searchsorted(pack_lists[o], hg[grp])
            halo_from[d, :hg.size] = owners * bmax + pos

        # neighbour (collective-permute) exchange tables: one ring per
        # shard-offset (reference: per-neighbour MPI_Isend/Irecv,
        # comms_mpi_hostbuffer_stream.cu:637-761). 1-D contiguous
        # partitions of local operators touch only a few offsets, so the
        # fine-level exchange rides |R| ppermutes with O(boundary) traffic
        # instead of an O(P*Bmax) all_gather; dense neighbourhoods
        # (|R| > 4) keep the all_gather form.
        offs_all = set()
        for d in range(n_dev):
            hg = all_halo[d]
            if hg.size:
                owners = col_part.owner_of(hg)
                offs_all.update(((owners - d) % n_dev).tolist())
        offs_all.discard(0)
        ring_offs = tuple(sorted(offs_all))
        nbr_perms = None
        pack_nbr = halo_nbr = None
        if ring_offs and len(ring_offs) <= 4 and n_dev > 1:
            # per ring r: owner o sends to receiver (o - r) mod n_dev
            pack_sets = [[np.zeros(0, np.int64)] * n_dev for _ in ring_offs]
            for k, r in enumerate(ring_offs):
                for o in range(n_dev):
                    d_recv = (o - r) % n_dev
                    hg = all_halo[d_recv]
                    if hg.size:
                        owners = col_part.owner_of(hg)
                        pack_sets[k][o] = np.unique(hg[owners == o])
            bmax_n = _round_up(max(1, max(p.size for row in pack_sets
                                          for p in row)), 8)
            pack_nbr = np.zeros((n_dev, len(ring_offs), bmax_n), np.int32)
            for k, r in enumerate(ring_offs):
                for o in range(n_dev):
                    pl_ = pack_sets[k][o]
                    if pl_.size:
                        slot = pl_ - col_part.offsets[o]
                        if reorder:
                            slot = ranks[o][slot]
                        pack_nbr[o, k, :pl_.size] = slot
            halo_nbr = np.zeros((n_dev, hmax), np.int32)
            for d in range(n_dev):
                hg = all_halo[d]
                if not hg.size:
                    continue
                owners = col_part.owner_of(hg)
                pos = np.empty(hg.size, np.int64)
                ring_of = np.empty(hg.size, np.int64)
                for k, r in enumerate(ring_offs):
                    o = (d + r) % n_dev
                    grp = owners == o
                    if grp.any():
                        pos[grp] = np.searchsorted(pack_sets[k][o], hg[grp])
                        ring_of[grp] = k
                halo_nbr[d, :hg.size] = ring_of * bmax_n + pos
            nbr_perms = tuple(
                tuple((o, (o - r) % n_dev) for o in range(n_dev))
                for r in ring_offs)

        # ELL assembly with the halo slot base rewritten to lc (already) and
        # halo slots offset into the concatenated [x_local | halo] vector.
        # The ELL width is a global shape constant: cross-process max in
        # partial mode (boundary-sized scalar traffic only).
        w = 1
        for d in local_devs:
            info = per_dev[d]
            if info["rows_l"].size:
                w = max(w, int(np.bincount(info["rows_l"]).max()))
        if partial:
            w = int(mh.allreduce_scalar(w, max))
        row_vshape = (lr, w) if (bx, by) == (1, 1) else (lr, w, bx, by)
        if partial:
            cols_np = vals_np = None
        else:
            cols_np = np.zeros((n_dev, lr, w), np.int32)
            vals_np = np.zeros((n_dev,) + row_vshape, dtype)
        cols_by, vals_by = {}, {}
        interior = np.zeros(n_dev, np.int32)
        nnz_local = 0
        for d in local_devs:
            info = per_dev[d]
            rl, cl, vl = info["rows_l"], info["cols_l"], info["vals"]
            order = np.argsort(rl, kind="stable")
            rl, cl, vl = rl[order], cl[order], vl[order]
            c_d = cols_np[d] if cols_np is not None else \
                np.zeros((lr, w), np.int32)
            v_d = vals_np[d] if vals_np is not None else \
                np.zeros(row_vshape, dtype)
            if rl.size:
                starts = np.searchsorted(rl, np.arange(info["n_loc"]))
                slot = np.arange(rl.size) - starts[rl]
                c_d[rl, slot] = cl
                v_d[rl, slot] = vl.astype(dtype)
            cols_by[d] = c_d
            vals_by[d] = v_d
            interior[d] = info["interior"]
            nnz_local += vl.size
        total_nnz = int(mh.allreduce_scalar(nnz_local, sum)) if partial \
            else nnz_local

        if partial:
            cols_dev = stack(cols_by, (lr, w), np.int32)
            vals_dev = stack(vals_by, row_vshape, dtype)
        else:
            cols_dev = jnp.asarray(cols_np)
            vals_dev = jnp.asarray(vals_np)
        dm = cls(cols_dev, vals_dev,
                 jnp.asarray(pack_idx), jnp.asarray(halo_from),
                 jnp.asarray(interior), n_rows, n_cols,
                 row_part, col_part, lr, lc, total_nnz, row_perm,
                 col_perm=row_perm if reorder else None,
                 block_dim=(bx, by))
        # operators whose every nonzero hits an owned column need no halo
        # exchange at all (e.g. block-diagonal P/R from shard-local
        # aggregation): their SpMV is collective-free
        dm.halo_free = all(h.size == 0 for h in all_halo)
        dm.nbr_perms = nbr_perms
        dm.pack_nbr = None if pack_nbr is None else jnp.asarray(pack_nbr)
        dm.halo_nbr = None if halo_nbr is None else jnp.asarray(halo_nbr)
        dm.dia_bands = None
        dm.dia_offsets = None
        dm.band_strips = None
        dm.gather_arrays = None
        if (bx, by) == (1, 1) and not reorder and same_space:
            if partial:
                dm._try_structured_partial(cols_by, vals_by, lc, local_devs,
                                           mesh, axis)
            else:
                dm._try_structured(cols_np, vals_np, lc)
                if dm.dia_bands is None:
                    dm._try_band_strips(cols_np, vals_np, lc)
            if dm.dia_bands is None and dm.band_strips is None and \
                    not dm.halo_free and \
                    np.dtype(dtype).kind != "c":
                # bottom of the layout ladder: stacked G5 packs replace
                # the scalarizing ELL gather for real unstructured shards
                dm._try_gather(cols_by, vals_by, lc, local_devs, mesh,
                               axis, partial)
        if mesh is not None:
            dm.shard(mesh, axis)
        return dm

    def _try_structured(self, cols: np.ndarray, vals: np.ndarray,
                        lc: int, max_bands: int = 32) -> None:
        """Detect a shard-uniform banded *owned* part (stencils under
        contiguous row partitions). When it exists, store the owned part as
        stacked DIA bands so the shard-local SpMV runs the no-gather
        shift-FMA path; halo entries stay in a (zeroed-elsewhere) ELL.

        Mirrors the reference's interior/boundary kernel split
        (multiply.cu) with a TPU-optimal interior layout.
        """
        n_dev, lr, w = cols.shape
        rows = np.arange(lr)[None, :, None]
        owned = (vals != 0) & (cols < lc)
        offs = np.where(owned, cols - rows, 0)
        uniq = np.unique(offs[owned]) if owned.any() else np.zeros(0,
                                                                   np.int64)
        if uniq.size == 0 or uniq.size > max_bands:
            return
        bands = np.zeros((n_dev, uniq.size, lr), vals.dtype)
        halo_vals = np.array(vals)
        sel = np.nonzero(owned)
        if sel[0].size:
            dd, rr, _ = sel
            band_idx = np.searchsorted(uniq, cols[sel].astype(np.int64) - rr)
            np.add.at(bands, (dd, band_idx, rr), vals[sel])
            halo_vals[sel] = 0.0
        # halo entries of contiguous stencil partitions live only in margin
        # rows near the shard edges; restrict the gather to those margins
        has_halo = (halo_vals != 0).any(axis=2)        # (D, lr)
        m_top = m_bot = 0
        for d in range(n_dev):
            idx = np.nonzero(has_halo[d])[0]
            for r in idx:
                if r <= lr - 1 - r:
                    m_top = max(m_top, r + 1)
                else:
                    m_bot = max(m_bot, lr - r)
        if m_top + m_bot >= lr:                         # margins overlap
            m_top, m_bot = lr, 0
        self.dia_offsets = tuple(int(o) for o in uniq)
        self.dia_bands = jnp.asarray(bands)
        self.margins = (m_top, m_bot)
        self.halo_vals_top = jnp.asarray(halo_vals[:, :m_top]) \
            if m_top else None
        self.halo_cols_top = jnp.asarray(cols[:, :m_top]) if m_top else None
        self.halo_vals_bot = jnp.asarray(halo_vals[:, lr - m_bot:]) \
            if m_bot else None
        self.halo_cols_bot = jnp.asarray(cols[:, lr - m_bot:]) if m_bot \
            else None

    def _try_structured_partial(self, cols_by: dict, vals_by: dict,
                                lc: int, local_devs, mesh: Mesh,
                                axis: str, max_bands: int = 32) -> None:
        """Rank-local variant of _try_structured: each process inspects only
        its addressable shards; the band-offset set rides a cross-process
        union and the margins a scalar max-reduce (boundary-sized traffic),
        then the stacked DIA/halo arrays are assembled shard-locally via
        put_stacked — O(N/P) host memory per process (the reference's
        rank-local storage, distributed_manager.cu:1144)."""
        from . import multihost as mh
        lr = self.lr
        rows = np.arange(lr)[:, None]
        offs_loc = set()
        owned_by = {}
        for d in local_devs:
            c, v = cols_by[d], vals_by[d]
            owned = (v != 0) & (c < lc)
            owned_by[d] = owned
            if owned.any():
                offs_loc.update(
                    np.unique(c[owned].astype(np.int64)
                              - np.broadcast_to(rows, c.shape)[owned])
                    .tolist())
        uniq = mh.allreduce_union(
            np.asarray(sorted(offs_loc), np.int64))
        if uniq.size == 0 or uniq.size > max_bands:
            return                     # identical union -> all agree
        dt = vals_by[local_devs[0]].dtype
        w = cols_by[local_devs[0]].shape[1]
        bands_by, halo_by = {}, {}
        m_top = m_bot = 0
        for d in local_devs:
            c, v = cols_by[d], vals_by[d]
            owned = owned_by[d]
            bands = np.zeros((uniq.size, lr), dt)
            hv = np.array(v)
            sel = np.nonzero(owned)
            if sel[0].size:
                rr, _ = sel
                bi = np.searchsorted(uniq,
                                     c[sel].astype(np.int64) - rr)
                np.add.at(bands, (bi, rr), v[sel])
                hv[sel] = 0.0
            bands_by[d] = bands
            halo_by[d] = hv
            for r in np.nonzero((hv != 0).any(axis=1))[0]:
                if r <= lr - 1 - r:
                    m_top = max(m_top, r + 1)
                else:
                    m_bot = max(m_bot, lr - r)
        m_top = int(mh.allreduce_scalar(m_top, max))
        m_bot = int(mh.allreduce_scalar(m_bot, max))
        if m_top + m_bot >= lr:
            m_top, m_bot = lr, 0
        n_dev = self.n_dev
        self.dia_offsets = tuple(int(o) for o in uniq)
        self.dia_bands = mh.put_stacked(bands_by, n_dev,
                                        (uniq.size, lr), dt, mesh, axis)
        self.margins = (m_top, m_bot)
        self.halo_vals_top = mh.put_stacked(
            {d: halo_by[d][:m_top] for d in local_devs}, n_dev,
            (m_top, w), dt, mesh, axis) if m_top else None
        self.halo_cols_top = mh.put_stacked(
            {d: cols_by[d][:m_top] for d in local_devs}, n_dev,
            (m_top, w), np.int32, mesh, axis) if m_top else None
        self.halo_vals_bot = mh.put_stacked(
            {d: halo_by[d][lr - m_bot:] for d in local_devs}, n_dev,
            (m_bot, w), dt, mesh, axis) if m_bot else None
        self.halo_cols_bot = mh.put_stacked(
            {d: cols_by[d][lr - m_bot:] for d in local_devs}, n_dev,
            (m_bot, w), np.int32, mesh, axis) if m_bot else None

    def _try_band_strips(self, cols: np.ndarray, vals: np.ndarray,
                         lc: int, tile_rows: int = 128,
                         max_width: int = 4096,
                         max_bytes: int = 256 * 1024 * 1024) -> None:
        """Banded-but-not-stencil owned parts (e.g. RCM-ordered meshes under
        contiguous partitions): store each shard's owned block as
        tile-aligned band strips (ops/band.py) so the shard-local SpMV is
        per-tile MXU matmuls instead of scalarizing gathers. Halo entries
        stay in margin-row ELL exactly like the DIA path."""
        n_dev, lr, w_ell = cols.shape
        owned = (vals != 0) & (cols < lc)
        if not owned.any():
            return
        tiles = -(-lr // tile_rows)
        lr_pad = tiles * tile_rows
        # per-(shard, tile) column spans of the owned part
        rows = np.broadcast_to(np.arange(lr)[None, :, None], cols.shape)
        tile_of = rows // tile_rows
        lo = np.full((n_dev, tiles), np.iinfo(np.int64).max)
        hi = np.full((n_dev, tiles), -1, np.int64)
        d_idx = np.broadcast_to(np.arange(n_dev)[:, None, None], cols.shape)
        np.minimum.at(lo, (d_idx[owned], tile_of[owned]), cols[owned])
        np.maximum.at(hi, (d_idx[owned], tile_of[owned]), cols[owned])
        empty = hi < lo
        lo[empty], hi[empty] = 0, 0
        span = int((hi - lo).max()) + 1
        hw = max(128, ((span + 127) // 128) * 128)
        w = 2 * hw
        if w > max_width or w >= 2 * lc:     # wider than dense-ish: no win
            return
        if n_dev * tiles * tile_rows * w * vals.dtype.itemsize > max_bytes:
            return
        # halo margins (same policy as the DIA path)
        has_halo = ((vals != 0) & (cols >= lc)).any(axis=2)      # (D, lr)
        m_top = m_bot = 0
        for d in range(n_dev):
            for r in np.nonzero(has_halo[d])[0]:
                if r <= lr - 1 - r:
                    m_top = max(m_top, r + 1)
                else:
                    m_bot = max(m_bot, lr - r)
        if m_top + m_bot >= lr:
            return
        base = (lo // hw) * hw                                   # (D, T)
        strips = np.zeros((n_dev, tiles, tile_rows, w), vals.dtype)
        halo_vals = np.array(vals)
        sel = np.nonzero(owned)
        dd, rr, kk = sel
        tt = rr // tile_rows
        strips[dd, tt, rr % tile_rows,
               cols[sel] - base[dd, tt]] = vals[sel]
        halo_vals[sel] = 0.0
        # the Pallas kernel DMAs band_read_rows(w) rows of 128 per window
        from ..ops.band import band_read_rows
        x_pad = int(base.max()) + band_read_rows(w) * 128
        x_pad = max(x_pad, ((lc + hw - 1) // hw) * hw)
        x_pad = ((x_pad + hw - 1) // hw) * hw
        self.band_strips = jnp.asarray(strips)
        self.band_base = jnp.asarray((base // hw).astype(np.int32))
        self.band_meta = (hw, x_pad, lr_pad, m_top, m_bot)
        self.margins = (m_top, m_bot)
        self.halo_vals_top = jnp.asarray(halo_vals[:, :m_top]) \
            if m_top else None
        self.halo_cols_top = jnp.asarray(cols[:, :m_top]) if m_top else None
        self.halo_vals_bot = jnp.asarray(halo_vals[:, lr - m_bot:]) \
            if m_bot else None
        self.halo_cols_bot = jnp.asarray(cols[:, lr - m_bot:]) if m_bot \
            else None

    # nnz-per-shard floor below which the stacked G5 pack is skipped: small
    # operators (coarse AMG levels, tests) are launch-overhead-bound either
    # way and the pack costs host setup time
    GATHER_MIN_SHARD_NNZ = 20000

    def _try_gather(self, cols_by: dict, vals_by: dict, lc: int,
                    local_devs, mesh: Optional[Mesh], axis: str,
                    partial: bool) -> None:
        """Stacked lane-binned gather (G5) packs for unstructured
        shard-local sparsity — the general-SpMV path of the distributed
        solver (reference: ONE bsrmv for all sparsity, distributed
        included, base/src/multiply.cu:113-197). Each shard's [owned |
        halo] extended ELL converts to a G5 pack (ops/gather_spmv.py);
        geometry (W, S_p, D) and the B-step count are agreed globally so
        the SPMD program is shard-uniform; halo columns live inside the
        pack (columns >= lc), so the apply is exchange -> concat ->
        kernel with no margin-row special casing."""
        from ..matrix import CSRMatrix
        from ..ops.gather_spmv import csr_to_gather, pad_gather
        from . import multihost as mh

        def agree_max(v: float) -> float:
            return mh.allreduce_scalar(v, max) if partial else float(v)

        lr, hmax = self.lr, self.hmax
        m = lc + hmax
        nnz_max = max((int((np.asarray(vals_by[d]) != 0).sum())
                       for d in local_devs), default=0)
        if agree_max(nnz_max) < self.GATHER_MIN_SHARD_NNZ:
            return
        gms, fail = {}, 0.0
        for d in local_devs:
            c = np.asarray(cols_by[d]).reshape(-1).astype(np.int64)
            v = np.asarray(vals_by[d]).reshape(-1)
            rows = np.repeat(np.arange(lr, dtype=np.int64),
                             cols_by[d].shape[1])
            keep = v != 0
            csr_d = CSRMatrix.from_coo(lr, m, rows[keep], c[keep], v[keep])
            g = csr_to_gather(csr_d, dtype=v.dtype, allow_empty=True)
            if g is None:
                fail = 1.0
                break
            gms[d] = g
        if agree_max(fail) > 0:
            return
        # geometry agreement: adaptive (D, G) may differ per shard;
        # everyone repacks to the global max (always a valid, more-padded
        # choice)
        d_glob = int(agree_max(max(g.D for g in gms.values())))
        g_glob = int(agree_max(max(g.G for g in gms.values())))
        for d in list(gms):
            if gms[d].D != d_glob or gms[d].G != g_glob:
                c = np.asarray(cols_by[d]).reshape(-1).astype(np.int64)
                v = np.asarray(vals_by[d]).reshape(-1)
                rows = np.repeat(np.arange(lr, dtype=np.int64),
                                 cols_by[d].shape[1])
                keep = v != 0
                gms[d] = csr_to_gather(
                    CSRMatrix.from_coo(lr, m, rows[keep], c[keep],
                                       v[keep]),
                    dtype=v.dtype, D=d_glob, G=g_glob, allow_empty=True)
        if agree_max(1.0 if any(g is None for g in gms.values())
                     else 0.0) > 0:
            return              # forced-(D,G) repack blew the waste guard
        nb_max = int(agree_max(max(g.step_flags.shape[0]
                                   for g in gms.values())))
        gms = {d: pad_gather(g, nb_max) for d, g in gms.items()}
        any_g = next(iter(gms.values()))
        n_dev = self.n_dev
        arrays = {}
        for k in any_g.ARRAY_FIELDS:
            rows_by = {d: np.asarray(getattr(g, k))
                       for d, g in gms.items()}
            shape = next(iter(rows_by.values())).shape
            dt = next(iter(rows_by.values())).dtype
            if mesh is not None:
                arrays[k] = mh.put_stacked(rows_by, n_dev, shape, dt,
                                           mesh, axis)
            else:
                out = np.zeros((n_dev,) + shape, dt)
                for d, r in rows_by.items():
                    out[d] = r
                arrays[k] = jnp.asarray(out)
        self.gather_arrays = arrays
        self.gather_meta = dict(any_g.meta)

    def shard(self, mesh: Mesh, axis: str = "x") -> None:
        from .multihost import reput
        s = NamedSharding(mesh, P(axis))

        def rp(a):
            # already placed (partial-mode put_stacked arrays): keep —
            # a reput would round-trip O(N) through every host
            if isinstance(a, jax.Array) and a.sharding == s:
                return a
            return reput(a, s)

        self.cols = rp(self.cols)
        self.vals = rp(self.vals)
        self.pack_idx = rp(self.pack_idx)
        self.halo_from = rp(self.halo_from)
        self.interior_rows = rp(self.interior_rows)
        if getattr(self, "pack_nbr", None) is not None:
            self.pack_nbr = rp(self.pack_nbr)
            self.halo_nbr = rp(self.halo_nbr)
        if getattr(self, "dia_bands", None) is not None:
            self.dia_bands = rp(self.dia_bands)
        if getattr(self, "band_strips", None) is not None:
            self.band_strips = rp(self.band_strips)
            self.band_base = rp(self.band_base)
        if getattr(self, "gather_arrays", None) is not None:
            self.gather_arrays = {k: rp(v)
                                  for k, v in self.gather_arrays.items()}
        if getattr(self, "dia_bands", None) is not None or \
                getattr(self, "band_strips", None) is not None:
            for name in ("halo_vals_top", "halo_cols_top",
                         "halo_vals_bot", "halo_cols_bot"):
                v = getattr(self, name, None)
                if v is not None:
                    setattr(self, name, rp(v))

    # -- vector scatter/gather -------------------------------------------------

    def scatter_vector(self, v: np.ndarray, space: str = "rows",
                       mesh: Optional[Mesh] = None, axis: str = "x"):
        """Global host vector -> (D, Lpad) device-sharded array following
        the row (or column) partition and the interior-first permutation."""
        part = self.row_part if space == "rows" else self.col_part
        lpad = self.lr if space == "rows" else self.lc
        perm = self.row_perm if space == "rows" else self.col_perm
        bdim = self.block_dim[0] if space == "rows" else self.block_dim[1]
        n_dev = self.n_dev
        v = np.asarray(v).reshape(-1, bdim) if bdim > 1 else np.asarray(v)
        if bdim > 1:
            out = np.zeros((n_dev, lpad, bdim), v.dtype)
        else:
            out = np.zeros((n_dev, lpad), v.dtype)
        if perm is not None:
            ok = perm >= 0
            out[ok] = v[perm[ok]]
        else:
            for d in range(n_dev):
                c0, c1 = part.offsets[d], part.offsets[d + 1]
                out[d, :c1 - c0] = v[c0:c1]
        if bdim > 1:
            out = out.reshape(n_dev, lpad * bdim)
        if mesh is not None:
            # direct host->sharding placement: multi-process safe (each
            # process materializes only its addressable shards)
            return jax.device_put(out, NamedSharding(mesh, P(axis)))
        return jnp.asarray(out)

    def scatter_vector_local(self, v_local: np.ndarray, lo: int, hi: int,
                             mesh: Mesh, axis: str = "x",
                             space: str = "rows"):
        """Rank-local vector entry: this process supplies ONLY rows
        [lo, hi) — its owned window — and the sharded (D, Lpad) array is
        assembled from every process's addressable pieces (the reference's
        per-rank vector upload, amgx_c.cu vector upload on distributed
        matrices). Requires natural (unpermuted) row order, which the
        partial-shards construction guarantees."""
        from . import multihost as mh
        part = self.row_part if space == "rows" else self.col_part
        lpad = self.lr if space == "rows" else self.lc
        perm = self.row_perm if space == "rows" else self.col_perm
        if perm is not None:
            raise ValueError("rank-local vectors require natural row order")
        bdim = self.block_dim[0] if space == "rows" else self.block_dim[1]
        v = np.asarray(v_local).reshape(-1)
        rows_by = {}
        for d in range(part.n_dev):
            r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
            if r0 < lo or r1 > hi:
                continue                       # another process's shard
            row = np.zeros(lpad * bdim, v.dtype)
            row[:(r1 - r0) * bdim] = v[(r0 - lo) * bdim:(r1 - lo) * bdim]
            rows_by[d] = row
        return mh.put_stacked(rows_by, part.n_dev, (lpad * bdim,),
                              v.dtype, mesh, axis)

    def gather_vector_local(self, arr, lo: int, hi: int,
                            space: str = "rows") -> np.ndarray:
        """Rank-local vector exit: return ONLY rows [lo, hi) from this
        process's addressable shards — no cross-process gather (the
        reference's per-rank vector download)."""
        part = self.row_part if space == "rows" else self.col_part
        bdim = self.block_dim[0] if space == "rows" else self.block_dim[1]
        out = None
        for shard in arr.addressable_shards:
            d = shard.index[0]
            d = int(d.start) if isinstance(d, slice) else int(d)
            r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
            if r0 < lo or r1 > hi:
                continue
            data = np.asarray(shard.data).reshape(-1)
            if out is None:
                out = np.zeros((hi - lo) * bdim, data.dtype)
            out[(r0 - lo) * bdim:(r1 - lo) * bdim] = \
                data[:(r1 - r0) * bdim]
        return out if out is not None else np.zeros(0)

    def gather_vector(self, arr, space: str = "rows") -> np.ndarray:
        from .multihost import to_host
        part = self.row_part if space == "rows" else self.col_part
        perm = self.row_perm if space == "rows" else self.col_perm
        bdim = self.block_dim[0] if space == "rows" else self.block_dim[1]
        a = to_host(arr)
        n = self.n_rows if space == "rows" else self.n_cols
        if bdim > 1:
            a = a.reshape(self.n_dev, -1, bdim)
            out = np.zeros((n, bdim), a.dtype)
        else:
            out = np.zeros(n, a.dtype)
        if perm is not None:
            ok = perm >= 0
            out[perm[ok]] = a[ok]
        else:
            for d in range(self.n_dev):
                c0, c1 = part.offsets[d], part.offsets[d + 1]
                out[c0:c1] = a[d, :c1 - c0]
        return out.reshape(-1)
