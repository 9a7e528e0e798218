"""Shard-parallel AMG setup: every coarsening step runs on O(N/P) rows.

TPU-native re-design of the reference's distributed setup phase:

  * ``ShardedCSR`` — the row-partitioned operator, one block of owned rows
    (global column ids) per shard; the analog of the per-rank matrix after
    renumbering (base/src/distributed/distributed_manager.cu:1388-1731).
  * ``exchange_*`` helpers — the one-ring ghost exchanges
    (createOneRingHaloRows, distributed_manager.cu:1592; B2L value
    exchange, comms_mpi_hostbuffer_stream.cu:637): each moves only
    boundary-sized data between shards. Here they run in-process (the
    setup phase is host-orchestrated), but every per-shard computation
    touches only owned rows plus the fetched one-ring, so per-process work
    and memory are O(N/P) — the property that lets setup scale with the
    mesh instead of one host's RAM.
  * distributed PMIS / interpolation / Galerkin — the shard-parallel
    analogs of selectors/pmis.cu, interpolators/distance1.cu /
    distance2.cu and computeAOperator_distributed
    (core/src/classical/classical_amg_level.cu:942). The classical
    pipeline reproduces the single-matrix results bit-for-bit: PMIS
    weights hash *global* ids, and interpolation/Galerkin are row-local
    given one-ring data.

No step materializes a global operator: SpGEMM work per shard is
O(flops/P), and coarse rows are accumulated on their owners via
boundary-row sends (the reference's halo-row accumulation in
computeAOperator_distributed).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..matrix import CSRMatrix
from .partition import RowPartition

FINE = -1


# ---------------------------------------------------------------------------
# Row-partitioned CSR container
# ---------------------------------------------------------------------------

class ShardedCSR:
    """Row-partitioned CSR: ``shards[d]`` holds the rows device d owns as a
    local CSR whose column ids stay *global* (the pre-renumbering per-rank
    storage, distributed_manager.cu:1144).

    In a multi-process run each process keeps only its addressable
    devices' shards (``shards[d] is None`` elsewhere) — the reference's
    rank-local storage; cross-process data moves only through the
    boundary-sized ``exchange_*`` helpers below."""

    def __init__(self, part: RowPartition, shards: List[CSRMatrix],
                 n_cols: int):
        self.part = part
        self.shards = shards
        self.n_rows = int(part.offsets[-1])
        self.n_cols = int(n_cols)

    @property
    def n_dev(self) -> int:
        return self.part.n_dev

    @property
    def devs(self) -> List[int]:
        """Device indices whose shards this process holds."""
        return [d for d in range(self.part.n_dev)
                if self.shards[d] is not None]

    @property
    def is_partial(self) -> bool:
        return any(s is None for s in self.shards)

    @property
    def block_dim(self):
        """Uniform across shards; read from the first local one."""
        return self.shards[self.devs[0]].block_dim

    @property
    def nnz(self) -> int:
        return sum(s.nnz for s in self.shards if s is not None)

    @classmethod
    def from_global(cls, csr: CSRMatrix, part: RowPartition) -> "ShardedCSR":
        """One O(N) row-slice at solver entry (the upload path; a true
        multi-process run enters through per-rank uploads instead)."""
        csr = csr.fold_diagonal()   # DIAG property: merge before sharding
        shards = []
        for d in range(part.n_dev):
            r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
            p0, p1 = int(csr.indptr[r0]), int(csr.indptr[r1])
            shards.append(CSRMatrix(
                r1 - r0, csr.n_cols, csr.indptr[r0:r1 + 1] - p0,
                csr.indices[p0:p1], csr.data[p0:p1],
                block_dim=csr.block_dim,
                diag_data=None if csr.diag_data is None
                else csr.diag_data[r0:r1]))
        return cls(part, shards, csr.n_cols)

    def to_global(self) -> CSRMatrix:
        """Assemble the global operator (tests / coarse-level dense solve
        only — never called on fine levels). Partial (multi-process)
        instances gather the missing shards first — coarse-sized only."""
        sm = self.gather_full() if self.is_partial else self
        indptr = [np.zeros(1, np.int64)]
        indices, data = [], []
        base = 0
        for s in sm.shards:
            indptr.append(s.indptr[1:] + base)
            base += s.nnz
            indices.append(s.indices)
            data.append(s.data)
        dd = None
        if all(s.diag_data is not None for s in sm.shards):
            dd = np.concatenate([s.diag_data for s in sm.shards])
        return CSRMatrix(self.n_rows, self.n_cols,
                         np.concatenate(indptr),
                         np.concatenate(indices) if indices else
                         np.zeros(0, np.int32),
                         np.concatenate(data, axis=0),
                         block_dim=sm.shards[sm.devs[0]].block_dim,
                         diag_data=dd)

    def gather_full(self) -> "ShardedCSR":
        """All-present copy of a partial instance: gathers every shard
        cross-process (coarse/consolidation-sized uses only)."""
        if not self.is_partial:
            return self
        from . import multihost as mh
        fields = {}
        for d in self.devs:
            sh = self.shards[d]
            fields[d] = np.concatenate([
                np.asarray([sh.n_rows, sh.n_cols, sh.nnz,
                            sh.block_dim[0], sh.block_dim[1],
                            0 if sh.diag_data is None else 1], np.int64)
                .view(np.uint8),
                np.asarray(sh.indptr, np.int64).view(np.uint8),
                np.asarray(sh.indices, np.int32).view(np.uint8),
                np.frombuffer(str(sh.data.dtype).ljust(16).encode(),
                              np.uint8),
                np.ascontiguousarray(sh.data).reshape(-1).view(np.uint8),
                np.zeros(0, np.uint8) if sh.diag_data is None else
                np.ascontiguousarray(sh.diag_data).reshape(-1)
                .view(np.uint8)])
        blobs = mh.gather_per_dev(self.n_dev, fields)
        shards = []
        for d, blob in enumerate(blobs):
            if blob is None:
                raise ValueError(f"no process holds shard {d}")
            hdr = blob[:48].view(np.int64)
            nl, nc, nnz, bx, by, hasdd = (int(v) for v in hdr)
            o = 48
            indptr = blob[o:o + 8 * (nl + 1)].view(np.int64); o += 8 * (nl + 1)
            indices = blob[o:o + 4 * nnz].view(np.int32); o += 4 * nnz
            dt = np.dtype(bytes(blob[o:o + 16]).decode().strip()); o += 16
            per = bx * by
            data = blob[o:o + dt.itemsize * nnz * per].view(dt)
            o += dt.itemsize * nnz * per
            data = data.reshape((nnz,) if per == 1 else (nnz, bx, by))
            dd = None
            if hasdd:
                dd = blob[o:].view(dt)
                dd = dd.reshape((nl,) if per == 1 else (nl, bx, by))
            shards.append(CSRMatrix(nl, nc, indptr, indices, data,
                                    block_dim=(bx, by), diag_data=dd))
        return ShardedCSR(self.part, shards, self.n_cols)

    def blocks(self):
        """Per-shard (local_rows, global_cols, vals) triples for
        DistEllMatrix.from_shards (None where the shard is remote)."""
        out = []
        for s in self.shards:
            if s is None:
                out.append(None)
                continue
            rows_l = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                               s.row_nnz())
            out.append((rows_l, s.indices.astype(np.int64), s.data))
        return out

    def halo_cols(self, d: int) -> np.ndarray:
        """Sorted unique global columns of shard d outside its owned range
        (the one-ring ghost set)."""
        r0, r1 = int(self.part.offsets[d]), int(self.part.offsets[d + 1])
        c = self.shards[d].indices.astype(np.int64)
        return np.unique(c[(c < r0) | (c >= r1)])

    def diagonal(self) -> List[np.ndarray]:
        """Per-shard diagonals (owned rows only — row-local; None where
        the shard is remote)."""
        out = []
        for d, s in enumerate(self.shards):
            if s is None:
                out.append(None)
                continue
            r0 = int(self.part.offsets[d])
            rows = np.repeat(np.arange(s.n_rows), s.row_nnz())
            if s.block_dim == (1, 1):
                diag = np.zeros(s.n_rows, s.data.dtype)
                m = s.indices.astype(np.int64) == rows + r0
                diag[rows[m]] = s.data[m]
                if s.diag_data is not None:
                    diag = diag + s.diag_data
            else:
                bx = s.block_dim[0]
                diag = np.zeros((s.n_rows, bx, bx), s.data.dtype)
                m = s.indices.astype(np.int64) == rows + r0
                diag[rows[m]] = s.data[m]
                if s.diag_data is not None:
                    diag = diag + s.diag_data
            out.append(diag)
        return out


# ---------------------------------------------------------------------------
# Exchanges (boundary-sized traffic only)
# ---------------------------------------------------------------------------

def exchange_col_values(part: RowPartition,
                        owned_vals: Sequence[np.ndarray],
                        halo_cols: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Ghost-value exchange: shard d receives ``owned_vals[owner][j-r0]``
    for each of its halo columns j (the B2L pack/unpack of
    comms_mpi_hostbuffer_stream.cu:637 applied to setup metadata). Traffic
    is O(sum of halo sizes)."""
    present = [d for d in range(part.n_dev)
               if d < len(owned_vals) and owned_vals[d] is not None]
    if len(present) < part.n_dev:
        return _exchange_col_values_mp(part, owned_vals, halo_cols, present)
    out = []
    for d in range(part.n_dev):
        hc = halo_cols[d]
        trail = tuple(np.asarray(owned_vals[d]).shape[1:]) \
            if len(owned_vals) else ()
        if hc.size == 0:
            out.append(np.zeros((0,) + trail, owned_vals[d].dtype
                                if len(owned_vals) else np.float64))
            continue
        owner = part.owner_of(hc)
        vals = np.empty((hc.shape[0],) + trail, owned_vals[d].dtype)
        for o in np.unique(owner):
            m = owner == o
            vals[m] = owned_vals[o][hc[m] - int(part.offsets[o])]
        out.append(vals)
    return out


def _exchange_col_values_mp(part: RowPartition, owned_vals, halo_cols,
                            present) -> List:
    """Cross-process ghost-value exchange: one allgather of the union of
    requested ids, one of the served (id, value) pairs — boundary-sized
    (the reference's B2L MPI exchange, comms_mpi_hostbuffer_stream.cu:637).
    Returns a full-length list with None at remote shards."""
    from . import multihost as mh
    reqs = [np.asarray(halo_cols[d], np.int64) for d in present
            if halo_cols[d] is not None]
    my_req = np.unique(np.concatenate(reqs)) if reqs else \
        np.zeros(0, np.int64)
    union = np.unique(np.concatenate(mh.allgather_host(my_req)))
    owner = part.owner_of(union) if union.size else \
        np.zeros(0, np.int64)
    sid_l, sval_l = [], []
    for d in present:
        m = owner == d
        if m.any():
            sid_l.append(union[m])
            v = np.asarray(owned_vals[d])[union[m] - int(part.offsets[d])]
            sval_l.append(np.ascontiguousarray(v))
    dtype = np.asarray(owned_vals[present[0]]).dtype if present else \
        np.dtype(np.float64)
    trail = tuple(np.asarray(owned_vals[present[0]]).shape[1:]) \
        if present else ()
    sid = np.concatenate(sid_l) if sid_l else np.zeros(0, np.int64)
    sval = np.concatenate(sval_l) if sval_l else \
        np.zeros((0,) + trail, dtype)
    all_sid = np.concatenate(mh.allgather_host(sid))
    all_sval = np.concatenate(
        [a for a in mh.allgather_nd(sval, trail)]) \
        if all_sid.size else sval
    order = np.argsort(all_sid, kind="stable")
    keys = all_sid[order]
    out = [None] * part.n_dev
    for d in present:
        hc = np.asarray(halo_cols[d], np.int64)
        if hc.size == 0:
            out[d] = np.zeros((0,) + tuple(trail), dtype)
            continue
        pos = np.searchsorted(keys, hc)
        out[d] = all_sval[order][pos]
    return out


def exchange_rows(sm: ShardedCSR,
                  rows_needed: Sequence[np.ndarray]) -> List[CSRMatrix]:
    """One-ring halo-*row* exchange (createOneRingHaloRows,
    distributed_manager.cu:1592): shard d receives the full rows (global
    columns) listed in ``rows_needed[d]``, as a small local CSR in that
    order. Traffic is O(boundary-row nnz)."""
    if sm.is_partial:
        return _exchange_rows_mp(sm, rows_needed)
    out = []
    for d in range(sm.n_dev):
        need = np.asarray(rows_needed[d], np.int64)
        if need.size == 0:
            out.append(CSRMatrix(0, sm.n_cols, np.zeros(1, np.int64),
                                 np.zeros(0, np.int32),
                                 np.zeros((0,), sm.shards[0].data.dtype)))
            continue
        owner = sm.part.owner_of(need)
        indptr = [0]
        idx_parts, val_parts, dd_parts = [], [], []
        have_dd = all(s.diag_data is not None for s in sm.shards)
        for g, o in zip(need, owner):
            s = sm.shards[int(o)]
            li = int(g - sm.part.offsets[int(o)])
            p0, p1 = int(s.indptr[li]), int(s.indptr[li + 1])
            idx_parts.append(s.indices[p0:p1])
            val_parts.append(s.data[p0:p1])
            indptr.append(indptr[-1] + (p1 - p0))
            if have_dd:
                dd_parts.append(s.diag_data[li])
        out.append(CSRMatrix(
            need.size, sm.n_cols, np.asarray(indptr, np.int64),
            np.concatenate(idx_parts) if idx_parts else
            np.zeros(0, np.int32),
            np.concatenate(val_parts, axis=0) if val_parts else
            np.zeros((0,), sm.shards[0].data.dtype),
            block_dim=sm.shards[0].block_dim,
            diag_data=np.stack(dd_parts) if have_dd and dd_parts else None))
    return out


def _exchange_rows_mp(sm: ShardedCSR, rows_needed) -> List:
    """Cross-process one-ring halo-row exchange: allgather the union of
    requested row ids, serve owned rows (counts + concatenated cols/vals
    [+ diag]), allgather the answers — O(boundary-row nnz) traffic
    (createOneRingHaloRows, distributed_manager.cu:1592). Returns a
    full-length list with None at remote shards."""
    from . import multihost as mh
    devs = sm.devs
    s0 = sm.shards[devs[0]]
    have_dd = bool(int(np.min(np.concatenate(mh.allgather_host(
        np.asarray([all(sm.shards[d].diag_data is not None
                        for d in devs)], np.int64))))))
    reqs = [np.asarray(rows_needed[d], np.int64) for d in devs
            if rows_needed[d] is not None]
    my_req = np.unique(np.concatenate(reqs)) if reqs else \
        np.zeros(0, np.int64)
    union = np.unique(np.concatenate(mh.allgather_host(my_req)))
    owner = sm.part.owner_of(union) if union.size else \
        np.zeros(0, np.int64)
    sid_l, cnt_l, col_l, val_l, dd_l = [], [], [], [], []
    for d in devs:
        m = owner == d
        if not m.any():
            continue
        sh = sm.shards[d]
        li = (union[m] - int(sm.part.offsets[d])).astype(np.int64)
        p0, p1 = sh.indptr[li], sh.indptr[li + 1]
        cnt = (p1 - p0).astype(np.int64)
        pos = (np.arange(int(cnt.sum())) -
               np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt) +
               np.repeat(p0, cnt)).astype(np.int64)
        sid_l.append(union[m])
        cnt_l.append(cnt)
        col_l.append(sh.indices[pos])
        val_l.append(np.ascontiguousarray(sh.data[pos]))
        if have_dd:
            dd_l.append(np.ascontiguousarray(sh.diag_data[li]))
    trail = tuple(s0.data.shape[1:])
    dtrail = tuple(s0.diag_data.shape[1:]) if have_dd else ()
    dtype = s0.data.dtype
    sid = np.concatenate(sid_l) if sid_l else np.zeros(0, np.int64)
    cnt = np.concatenate(cnt_l) if cnt_l else np.zeros(0, np.int64)
    col = np.concatenate(col_l) if col_l else np.zeros(0, np.int32)
    val = np.concatenate(val_l) if val_l else np.zeros((0,) + trail, dtype)
    all_sid = np.concatenate(mh.allgather_host(sid))
    all_cnt = np.concatenate(mh.allgather_host(cnt))
    all_col = np.concatenate(mh.allgather_host(col))
    all_val = np.concatenate(mh.allgather_nd(val, trail)) if \
        all_sid.size else val
    if have_dd:
        dd = np.concatenate(dd_l) if dd_l else \
            np.zeros((0,) + dtrail, dtype)
        all_dd = np.concatenate(mh.allgather_nd(dd, dtrail)) if \
            all_sid.size else dd
    order = np.argsort(all_sid, kind="stable")
    keys = all_sid[order]
    cnt_s = all_cnt[order]
    starts_nz = np.concatenate([[0], np.cumsum(all_cnt)])[:-1]
    starts_s = starts_nz[order]
    out = [None] * sm.n_dev
    for d in devs:
        need = np.asarray(rows_needed[d], np.int64)
        if need.size == 0:
            out[d] = CSRMatrix(0, sm.n_cols, np.zeros(1, np.int64),
                               np.zeros(0, np.int32),
                               np.zeros((0,) + trail, dtype))
            continue
        pos = np.searchsorted(keys, need)
        cts = cnt_s[pos]
        tot = int(cts.sum())
        src = (np.arange(tot) -
               np.repeat(np.concatenate([[0], np.cumsum(cts)[:-1]]), cts) +
               np.repeat(starts_s[pos], cts)).astype(np.int64)
        out[d] = CSRMatrix(
            need.size, sm.n_cols,
            np.concatenate([[0], np.cumsum(cts)]).astype(np.int64),
            all_col[src], all_val[src], block_dim=s0.block_dim,
            diag_data=all_dd[order][pos] if have_dd else None)
    return out


def send_coo_to_owners(part: RowPartition,
                       contribs: Sequence[Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]],
                       n_cols: int,
                       local_devs: Optional[Sequence[int]] = None
                       ) -> ShardedCSR:
    """Scatter COO contributions (global rows/cols) to the shards owning
    their rows and sum duplicates — the halo-row accumulation step of the
    distributed Galerkin product (computeAOperator_distributed,
    classical_amg_level.cu:942). Off-shard traffic is only the entries
    whose row another shard owns (boundary-sized); in a multi-process run
    (``local_devs`` given) those ride one allgather and only local shards
    are built."""
    n_dev = part.n_dev
    contribs = [c for c in contribs if c is not None]
    dtype = contribs[0][2].dtype if contribs else np.dtype(np.float64)
    trail = tuple(contribs[0][2].shape[1:]) if contribs else ()
    if local_devs is not None and len(local_devs) < n_dev:
        from . import multihost as mh
        local_set = set(int(d) for d in local_devs)
        keep_r, keep_c, keep_v = [], [], []
        off_r, off_c, off_v = [], [], []
        for rows, cols, vals in contribs:
            if rows.size == 0:
                continue
            owner = part.owner_of(rows)
            mine = np.isin(owner, list(local_set))
            keep_r.append(rows[mine])
            keep_c.append(cols[mine])
            keep_v.append(vals[mine])
            off_r.append(rows[~mine])
            off_c.append(cols[~mine])
            off_v.append(vals[~mine])
        ro = np.concatenate(off_r) if off_r else np.zeros(0, np.int64)
        co = np.concatenate(off_c) if off_c else np.zeros(0, np.int64)
        vo = np.concatenate(off_v, axis=0) if off_v else \
            np.zeros((0,) + trail, dtype)
        all_r = np.concatenate(mh.allgather_host(ro.astype(np.int64)))
        all_c = np.concatenate(mh.allgather_host(co.astype(np.int64)))
        all_v = np.concatenate(mh.allgather_nd(vo, trail)) if \
            all_r.size else vo
        own = np.isin(part.owner_of(all_r), list(local_set)) if \
            all_r.size else np.zeros(0, bool)
        contribs = [(np.concatenate(keep_r) if keep_r else
                     np.zeros(0, np.int64),
                     np.concatenate(keep_c) if keep_c else
                     np.zeros(0, np.int64),
                     np.concatenate(keep_v, axis=0) if keep_v else
                     np.zeros((0,) + trail, dtype)),
                    (all_r[own], all_c[own], all_v[own])]
        build = sorted(local_set)
    else:
        build = range(n_dev)
    rows_by = [[] for _ in range(n_dev)]
    cols_by = [[] for _ in range(n_dev)]
    vals_by = [[] for _ in range(n_dev)]
    for rows, cols, vals in contribs:
        if rows.size == 0:
            continue
        owner = part.owner_of(rows)
        for o in np.unique(owner):
            m = owner == o
            rows_by[o].append(rows[m])
            cols_by[o].append(cols[m])
            vals_by[o].append(vals[m])
    shards = [None] * n_dev
    for d in build:
        r0 = int(part.offsets[d])
        nl = part.size(d)
        bd = tuple(trail) if len(trail) == 2 else (1, 1)
        if rows_by[d]:
            r = np.concatenate(rows_by[d]) - r0
            c = np.concatenate(cols_by[d])
            v = np.concatenate(vals_by[d], axis=0)
            shards[d] = CSRMatrix.from_coo(nl, n_cols, r, c, v,
                                           block_dim=bd)
        else:
            shards[d] = CSRMatrix(nl, n_cols, np.zeros(nl + 1, np.int64),
                                  np.zeros(0, np.int32),
                                  np.zeros((0,) + trail, dtype),
                                  block_dim=bd)
    return ShardedCSR(part, shards, n_cols)


# ---------------------------------------------------------------------------
# Extended-local view (owned rows, [owned | halo] local columns)
# ---------------------------------------------------------------------------

def extended_local(sm: ShardedCSR, d: int
                   ) -> Tuple[CSRMatrix, np.ndarray]:
    """Shard d's rows with columns renumbered to the extended-local space
    [0, nl) owned, [nl, nl+nh) halo — the renumbered per-rank matrix
    (renumberMatrixOneRing). Returns (local CSR, halo global col ids).
    The diagonal lands on the local diagonal, so the row-local setup
    kernels (strength, scaling) run unchanged on it."""
    s = sm.shards[d]
    r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
    nl = r1 - r0
    c = s.indices.astype(np.int64)
    owned = (c >= r0) & (c < r1)
    halo = np.unique(c[~owned])
    cl = np.where(owned, c - r0, 0)
    if halo.size:
        cl[~owned] = nl + np.searchsorted(halo, c[~owned])
    ext = CSRMatrix(nl, nl + halo.size, s.indptr, cl.astype(np.int32),
                    s.data, block_dim=s.block_dim, diag_data=s.diag_data)
    return ext, halo


def _mh_scalar(partial: bool, val: float, op=max) -> float:
    """Cross-process scalar all-reduce (no-op when all shards local)."""
    if not partial:
        return val
    from . import multihost as mh
    return mh.allreduce_scalar(val, op)


def _counts_to_offsets(sm: ShardedCSR, counts: dict) -> np.ndarray:
    """Per-shard count dict -> global row offsets (one tiny allgather in
    multi-process runs)."""
    from . import multihost as mh
    full = mh.gather_per_dev(
        sm.n_dev, {d: np.asarray([int(c)], np.int64)
                   for d, c in counts.items()})
    return np.concatenate(
        [[0], np.cumsum([int(c[0]) for c in full])]).astype(np.int64)


# ---------------------------------------------------------------------------
# Distributed PMIS (selectors/pmis.cu, shard-parallel form)
# ---------------------------------------------------------------------------

def dist_strength(sm: ShardedCSR, strength: str, theta: float,
                  max_row_sum: float = 1.1) -> List[np.ndarray]:
    """Per-shard strong-connection masks. AHAT's test is row-local
    (strength/ahat.cu), so each shard computes its owned rows from the
    extended-local view alone — no exchange needed."""
    from ..amg.classical import strong_connections
    out = [None] * sm.n_dev
    for d in sm.devs:
        ext, _ = extended_local(sm, d)
        out[d] = strong_connections(ext, strength, theta, max_row_sum)
    return out


def _square_edges(part: RowPartition,
                  edges: List[Tuple[np.ndarray, np.ndarray]],
                  n_rows: int, return_counts: bool = False
                  ) -> List[Tuple[np.ndarray, ...]]:
    """Distance-2 expansion of the per-shard symmetric edge lists:
    E2 = E@E + E with the diagonal removed — the AGGRESSIVE_PMIS adjacency
    (pmis_select(aggressive=True): sym@sym + sym). Neighbour adjacency
    rows cross shard boundaries through a row exchange of the symmetric
    graph, so per-shard work stays O(rows touched x degree^2).
    ``return_counts`` adds the path multiplicities (1 per direct edge +
    #2-paths) as a third array — aggressive HMIS weighs C points by the
    VALUE sums of sym + sym@sym (hmis.cu), not the binary degree."""
    import scipy.sparse as sp
    n_dev = part.n_dev
    present = [d for d in range(n_dev) if edges[d] is not None]
    adjs = [None] * n_dev
    for d in present:
        nl = part.size(d)
        src, dst = edges[d]
        adjs[d] = sp.csr_matrix(
            (np.ones(src.size), (src, dst)), shape=(nl, n_rows))
    remote_rows = {}
    if len(present) < n_dev:
        # cross-process: serve referenced adjacency rows with one
        # boundary-sized allgather round (row ids + counts + columns)
        from . import multihost as mh
        refs = []
        for d in present:
            dst = edges[d][1]
            if dst.size:
                ref = np.unique(dst)
                refs.append(ref[~np.isin(part.owner_of(ref), present)])
        my_req = np.unique(np.concatenate(refs)) if refs else \
            np.zeros(0, np.int64)
        union = np.unique(np.concatenate(mh.allgather_host(my_req)))
        uown = part.owner_of(union) if union.size else \
            np.zeros(0, np.int64)
        sid_l, cnt_l, col_l = [], [], []
        for d in present:
            m = uown == d
            if not m.any():
                continue
            bo = adjs[d][union[m] - int(part.offsets[d])]
            sid_l.append(union[m])
            cnt_l.append(np.diff(bo.indptr).astype(np.int64))
            col_l.append(bo.indices.astype(np.int64))
        sid = np.concatenate(sid_l) if sid_l else np.zeros(0, np.int64)
        cnt = np.concatenate(cnt_l) if cnt_l else np.zeros(0, np.int64)
        col = np.concatenate(col_l) if col_l else np.zeros(0, np.int64)
        all_sid = np.concatenate(mh.allgather_host(sid))
        all_cnt = np.concatenate(mh.allgather_host(cnt))
        all_col = np.concatenate(mh.allgather_host(col))
        starts = np.concatenate([[0], np.cumsum(all_cnt)])
        for j in range(all_sid.size):
            remote_rows[int(all_sid[j])] = \
                all_col[int(starts[j]):int(starts[j + 1])]
    out = [None] * n_dev
    for d in present:
        r0 = int(part.offsets[d])
        src, dst = edges[d]
        if src.size == 0:
            out[d] = (src, dst, np.zeros(0)) if return_counts else \
                (src, dst)
            continue
        ref = np.unique(dst)
        owner = part.owner_of(ref)
        # B lives in the compact referenced-row subspace so per-shard
        # memory stays boundary-sized, not O(N)
        rows_parts, cols_parts = [], []
        for o in np.unique(owner):
            m = owner == o
            sel = ref[m]
            if adjs[int(o)] is not None:
                bo = adjs[int(o)][sel - int(part.offsets[int(o)])]
                rows_parts.append(np.repeat(np.flatnonzero(m),
                                            np.diff(bo.indptr)))
                cols_parts.append(bo.indices.astype(np.int64))
            else:
                rws = np.flatnonzero(m)
                for k, g in zip(rws, sel):
                    cc = remote_rows.get(int(g), np.zeros(0, np.int64))
                    rows_parts.append(np.full(cc.size, k, np.int64))
                    cols_parts.append(cc)
        b_rows = np.concatenate(rows_parts)
        b_cols = np.concatenate(cols_parts)
        b = sp.csr_matrix((np.ones(b_rows.size), (b_rows, b_cols)),
                          shape=(ref.size, n_rows))
        a_c = sp.csr_matrix(
            (np.ones(src.size), (src, np.searchsorted(ref, dst))),
            shape=(adjs[d].shape[0], ref.size))
        s2 = (a_c @ b + adjs[d]).tocoo()
        keep = (s2.row + r0) != s2.col
        src2 = s2.row[keep].astype(np.int64)
        dst2 = s2.col[keep].astype(np.int64)
        cnt2 = s2.data[keep]
        key = src2 * np.int64(n_rows + 1) + dst2
        _, first = np.unique(key, return_index=True)
        out[d] = (src2[first], dst2[first], cnt2[first]) \
            if return_counts else (src2[first], dst2[first])
    return out


def dist_pmis(sm: ShardedCSR, strong: List[np.ndarray], seed: int = 0,
              aggressive: bool = False, variant: str = "PMIS"
              ) -> Tuple[List[np.ndarray], RowPartition, int]:
    """Shard-parallel PMIS / HMIS. Reproduces the single-matrix selectors
    bit-for-bit: weights hash *global* ids, in-degrees and neighbour
    states cross shard boundaries through ghost exchanges each round
    (selectors/pmis.cu two-phase flagging; selectors/hmis.cu).

    variant="HMIS": the single-chip hmis_select sweep visits points by
    descending (lambda + hash) and greedily seeds C — the sequential
    greedy equals the fixed-priority parallel fixpoint this loop computes
    (lexicographically-first MIS), so the SAME round structure covers
    HMIS with two deltas: isolated points become C (not F), and
    aggressive HMIS prunes the C set on its distance-2 subgraph AFTER
    the sweep instead of squaring the graph before it.

    Returns (per-shard cf maps with GLOBAL coarse ids, coarse
    RowPartition, n_coarse). Global coarse numbering is by fine row id, so
    it is automatically contiguous per shard.
    """
    from ..amg.classical import _pmis_hash_ids
    n_dev = sm.n_dev
    devs = sm.devs
    devs_set = set(devs)
    partial = sm.is_partial
    # per-shard symmetrized strength adjacency in extended-local col space:
    # local strong edges  +  reverse edges received from neighbours
    exts = [None] * n_dev
    halos = [None] * n_dev
    adj = [None] * n_dev
    rev_edges = [[] for _ in range(n_dev)]       # (src_global, dst_global)
    for d in devs:
        ext, halo = extended_local(sm, d)
        exts[d] = ext
        halos[d] = halo
        r0 = int(sm.part.offsets[d])
        rows = np.repeat(np.arange(ext.n_rows, dtype=np.int64),
                         ext.row_nnz())
        st = strong[d]
        # reverse edges whose target lives on another shard
        tgt_halo = st & (ext.indices >= ext.n_rows)
        if tgt_halo.any():
            src_g = rows[tgt_halo] + r0
            dst_g = halo[ext.indices[tgt_halo].astype(np.int64) - ext.n_rows]
            owner = sm.part.owner_of(dst_g)
            for o in np.unique(owner):
                m = owner == o
                rev_edges[o].append((dst_g[m], src_g[m]))
        adj[d] = (rows[st], ext.indices[st].astype(np.int64))

    if partial:
        # reverse edges destined to remote shards ride one boundary-sized
        # allgather (the reference sends these with neighbour MPI traffic,
        # comms_mpi_hostbuffer_stream.cu:835)
        from . import multihost as mh
        off_d, off_s = [], []
        for o in range(n_dev):
            if o not in devs_set and rev_edges[o]:
                for (dg, sg) in rev_edges[o]:
                    off_d.append(dg)
                    off_s.append(sg)
                rev_edges[o] = []
        dg = np.concatenate(off_d) if off_d else np.zeros(0, np.int64)
        sg = np.concatenate(off_s) if off_s else np.zeros(0, np.int64)
        all_dg = np.concatenate(mh.allgather_host(dg))
        all_sg = np.concatenate(mh.allgather_host(sg))
        if all_dg.size:
            own = sm.part.owner_of(all_dg)
            for d in devs:
                m = own == d
                if m.any():
                    rev_edges[d].append((all_dg[m], all_sg[m]))

    # assemble per-shard symmetric edge lists (global targets, dedup)
    edges = [None] * n_dev                       # per shard: (src_l, dst_g)
    indeg = [None] * n_dev                       # per shard: in-degree of S
    for d in devs:
        r0 = int(sm.part.offsets[d])
        nl = exts[d].n_rows
        src_l, dst_l = adj[d]
        dst_g = np.where(dst_l < nl, dst_l + r0,
                         halos[d][np.maximum(dst_l - nl, 0)]
                         if halos[d].size else dst_l + r0)
        # local reverse edges: the strength mask is per-row (AHAT is not
        # symmetric), so (j -> i) must be added for every owned strong
        # (i -> j) — the remote ones arrive via rev_edges below
        loc = dst_l < nl
        src_all = [src_l, dst_l[loc]]
        dst_all = [dst_g, src_l[loc] + r0]
        if rev_edges[d]:
            src_all.append(np.concatenate([a for a, _ in rev_edges[d]])
                           - r0)
            dst_all.append(np.concatenate([b for _, b in rev_edges[d]]))
        src_all = np.concatenate(src_all)
        dst_all = np.concatenate(dst_all)
        # dedup (i,j): symmetrized binary graph
        key = src_all * (sm.n_rows + 1) + dst_all
        _, first = np.unique(key, return_index=True)
        src_all, dst_all = src_all[first], dst_all[first]
        edges[d] = (src_all, dst_all)
        # in-degree of S restricted to owned targets: local strong edges
        # pointing at owned cols + received reverse-edge counts equal the
        # column sums of S (lam in pmis_select)
        deg = np.zeros(nl)
        own_tgt = adj[d][1] < nl
        np.add.at(deg, adj[d][1][own_tgt], 1.0)
        indeg[d] = deg
    # add cross-shard S in-degree: each strong edge (i -> halo j) counts at
    # j's owner. rev_edges[o] carries exactly those as (dst_g=j, src_g=i).
    for d in devs:
        r0 = int(sm.part.offsets[d])
        for (dst_g, _src) in rev_edges[d]:
            np.add.at(indeg[d], dst_g - r0, 1.0)

    hmis = variant == "HMIS"
    if aggressive and not hmis:
        # AGGRESSIVE_PMIS: independent set on the distance-2 graph, with
        # the SAME weights (S-transpose in-degree) as plain PMIS —
        # mirrors pmis_select(aggressive=True)
        edges = _square_edges(sm.part, edges, sm.n_rows)

    w = [None] * n_dev
    state = [None] * n_dev
    for d in devs:
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        w[d] = indeg[d] + _pmis_hash_ids(
            np.arange(r0, r1, dtype=np.uint64), seed)
        state[d] = np.zeros(exts[d].n_rows, np.int8)
        if not hmis:
            # hmis_select's sweep makes isolated points C; pmis_select
            # pre-marks them F
            iso = np.ones(exts[d].n_rows, bool)
            iso[np.unique(edges[d][0])] = False
            state[d][iso & (indeg[d] == 0)] = -1

    # ghost set = remote targets of the symmetrized edge lists (a superset
    # of the matrix halo when the strength mask is asymmetric: a received
    # reverse edge can point at a node that is not one of our columns)
    ghosts = [None] * n_dev
    for d in devs:
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        dst = edges[d][1]
        ghosts[d] = np.unique(dst[(dst < r0) | (dst >= r1)])

    def ghost(per_shard):
        return exchange_col_values(sm.part, per_shard, ghosts)

    def undecided():
        # all processes must agree on loop continuation (the exchanges
        # below are collective)
        local = any((state[d] == 0).any() for d in devs)
        if not partial:
            return local
        from . import multihost as mh
        return bool(max(int(v[0]) for v in mh.allgather_host(
            np.asarray([int(local)], np.int64))))

    while undecided():
        g_state = ghost(state)
        g_w = ghost(w)
        winners_any = False
        new_w = [None] * n_dev
        for d in devs:
            src, dst = edges[d]
            und = state[d] == 0
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            own = (dst >= r0) & (dst < r1)
            dst_state = np.where(own, state[d][np.where(own, dst - r0, 0)],
                                 0)
            dst_w = np.where(own, w[d][np.where(own, dst - r0, 0)], 0.0)
            if ghosts[d].size:
                hidx = np.searchsorted(ghosts[d], dst)
                hit = ~own
                hidx = np.clip(hidx, 0, max(0, ghosts[d].size - 1))
                dst_state = np.where(hit, g_state[d][hidx], dst_state)
                dst_w = np.where(hit, g_w[d][hidx], dst_w)
            m = und[src] & (dst_state == 0)
            nb_max = np.full(exts[d].n_rows, -np.inf)
            if m.any():
                np.maximum.at(nb_max, src[m], dst_w[m])
            winners = und & (w[d] > nb_max)
            new_w[d] = winners
            winners_any = winners_any or bool(winners.any())
        if partial:
            from . import multihost as mh
            winners_any = bool(max(int(v[0]) for v in mh.allgather_host(
                np.asarray([int(winners_any)], np.int64))))
        if not winners_any:
            # deadlock fallback identical to pmis_select: the globally
            # first undecided point becomes C (one all-reduce)
            first_u = sm.n_rows
            for d in devs:
                u = np.nonzero(state[d] == 0)[0]
                if u.size:
                    first_u = int(sm.part.offsets[d]) + int(u[0])
                    break
            if partial:
                from . import multihost as mh
                first_u = int(min(int(v[0]) for v in mh.allgather_host(
                    np.asarray([first_u], np.int64))))
            for d in devs:
                r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
                if r0 <= first_u < r1:
                    new_w[d] = np.zeros(exts[d].n_rows, bool)
                    new_w[d][first_u - r0] = True
        for d in devs:
            state[d][new_w[d]] = 1
        # undecided neighbours of new C points become F; cross-shard
        # demotions travel with the next ghost exchange of winner flags
        g_win = ghost([None if wn is None else wn.astype(np.int8)
                       for wn in new_w])
        for d in devs:
            src, dst = edges[d]
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            own = (dst >= r0) & (dst < r1)
            src_won = new_w[d][src]
            # local targets of local winners
            t = dst[src_won & own] - r0
            state[d][t[state[d][t] == 0]] = -1
            # owned rows demoted by remote winners: symmetric edge list
            # means every (i, halo j) edge exists here with src owned, so
            # check whether the halo endpoint just won
            if ghosts[d].size:
                hit = ~own
                hidx = np.clip(np.searchsorted(ghosts[d], dst), 0,
                               max(0, ghosts[d].size - 1))
                rem_win = hit & (g_win[d][hidx] > 0)
                s2 = src[rem_win]
                state[d][s2[state[d][s2] == 0]] = -1

    if hmis and aggressive:
        _hmis_aggressive_prune(sm, exts, edges, state, devs, partial, seed)

    from . import multihost as mh
    counts = mh.gather_per_dev(
        n_dev, {d: np.asarray([int((state[d] == 1).sum())], np.int64)
                for d in devs})
    counts = [int(c[0]) for c in counts]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    cf = [None] * n_dev
    for d in devs:
        m = np.full(exts[d].n_rows, FINE, np.int64)
        c = np.nonzero(state[d] == 1)[0]
        m[c] = offsets[d] + np.arange(c.size)
        cf[d] = m
    return cf, RowPartition(offsets), int(offsets[-1])


def _hmis_aggressive_prune(sm: ShardedCSR, exts, edges, state, devs,
                           partial: bool, seed: int) -> None:
    """AGGRESSIVE_HMIS second pass (hmis_select(aggressive=True)): a
    priority-greedy sweep on the distance-<=2 subgraph of the C points
    demotes losing C points to F. Weights are (C-subgraph degree +
    hash of the point's position in the global C ordering) — the hash
    index is the C rank, exactly the single-chip _pmis_hash(len(c_idx))
    indexing, computable shard-locally from the global C offsets."""
    from ..amg.classical import _pmis_hash_ids
    from . import multihost as mh
    n_dev = sm.n_dev
    counts = mh.gather_per_dev(
        n_dev, {d: np.asarray([int((state[d] == 1).sum())], np.int64)
                for d in devs})
    offsets = np.concatenate(
        [[0], np.cumsum([int(c[0]) for c in counts])]).astype(np.int64)
    edges2 = _square_edges(sm.part, edges, sm.n_rows, return_counts=True)
    ghosts2 = [None] * n_dev
    for d in devs:
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        dst = edges2[d][1]
        ghosts2[d] = np.unique(dst[(dst < r0) | (dst >= r1)])

    def ghost2(ps):
        return exchange_col_values(sm.part, ps, ghosts2)

    # keep: -9 not-C (decided), 0 undecided C, 1 kept, -1 demoted
    keep = [None] * n_dev
    w_c = [None] * n_dev
    g_keep0 = ghost2([None if state[d] is None or sm.shards[d] is None
                      else state[d].astype(np.float64)
                      for d in range(n_dev)])
    for d in devs:
        nl = exts[d].n_rows
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        isC = state[d] == 1
        pos = np.zeros(nl, np.uint64)
        pos[isC] = (offsets[d]
                    + np.arange(int(isC.sum()))).astype(np.uint64)
        src, dst, cnt = edges2[d]
        own = (dst >= r0) & (dst < r1)
        dstC = np.where(own, isC[np.where(own, dst - r0, 0)], False)
        if ghosts2[d].size:
            hidx = np.clip(np.searchsorted(ghosts2[d], dst), 0,
                           max(0, ghosts2[d].size - 1))
            dstC = np.where(~own, g_keep0[d][hidx] > 0, dstC)
        lam_c = np.zeros(nl)
        m = isC[src] & dstC
        # hmis.cu weighs by the VALUE sums of sym + sym@sym (path
        # multiplicities), not the binary C-degree
        np.add.at(lam_c, src[m], cnt[m])
        w_c[d] = np.where(isC, lam_c + _pmis_hash_ids(pos, seed + 3),
                          -np.inf)
        keep[d] = np.where(isC, 0, -9).astype(np.int8)

    def any_undecided():
        local = any((keep[d] == 0).any() for d in devs)
        return _mh_scalar(partial, float(local)) > 0 if partial else local

    while any_undecided():
        g_keep = ghost2([None if sm.shards[d] is None else
                         keep[d].astype(np.float64)
                         for d in range(n_dev)])
        g_w = ghost2([None if sm.shards[d] is None else w_c[d]
                      for d in range(n_dev)])
        winners_all = [None] * n_dev
        winners_any = False
        for d in devs:
            src, dst = edges2[d][0], edges2[d][1]
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            und = keep[d] == 0
            own = (dst >= r0) & (dst < r1)
            dst_keep = np.where(own,
                                keep[d][np.where(own, dst - r0, 0)], -9)
            dst_w = np.where(own, w_c[d][np.where(own, dst - r0, 0)],
                             -np.inf)
            if ghosts2[d].size:
                hidx = np.clip(np.searchsorted(ghosts2[d], dst), 0,
                               max(0, ghosts2[d].size - 1))
                hit = ~own
                dst_keep = np.where(hit, g_keep[d][hidx], dst_keep)
                dst_w = np.where(hit, g_w[d][hidx], dst_w)
            m = und[src] & (dst_keep == 0)
            nb_max = np.full(exts[d].n_rows, -np.inf)
            if m.any():
                np.maximum.at(nb_max, src[m], dst_w[m])
            win = und & (w_c[d] > nb_max)
            winners_all[d] = win
            winners_any = winners_any or bool(win.any())
        if partial:
            winners_any = _mh_scalar(True, float(winners_any)) > 0
        if not winners_any:
            first_u = sm.n_rows
            for d in devs:
                u = np.nonzero(keep[d] == 0)[0]
                if u.size:
                    first_u = int(sm.part.offsets[d]) + int(u[0])
                    break
            if partial:
                first_u = int(_mh_scalar(True, float(first_u), op=min))
            for d in devs:
                r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
                if r0 <= first_u < r1:
                    winners_all[d] = np.zeros(exts[d].n_rows, bool)
                    winners_all[d][first_u - r0] = True
        for d in devs:
            keep[d][winners_all[d]] = 1
        g_win = ghost2([None if sm.shards[d] is None else
                        winners_all[d].astype(np.float64)
                        for d in range(n_dev)])
        for d in devs:
            src, dst = edges2[d][0], edges2[d][1]
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            own = (dst >= r0) & (dst < r1)
            t = dst[winners_all[d][src] & own] - r0
            keep[d][t[keep[d][t] == 0]] = -1
            if ghosts2[d].size:
                hidx = np.clip(np.searchsorted(ghosts2[d], dst), 0,
                               max(0, ghosts2[d].size - 1))
                rem_win = (~own) & (g_win[d][hidx] > 0)
                s2 = src[rem_win]
                keep[d][s2[keep[d][s2] == 0]] = -1
    for d in devs:
        state[d][(state[d] == 1) & (keep[d] != 1)] = -1


# ---------------------------------------------------------------------------
# Distributed interpolation (interpolators/distance1.cu / distance2.cu)
# ---------------------------------------------------------------------------

def dist_direct_interpolation(sm: ShardedCSR, strong: List[np.ndarray],
                              cf: List[np.ndarray], nc: int
                              ) -> ShardedCSR:
    """Distance-1 interpolation per shard: the formula is row-local given
    cf of the one-ring (ghost cf exchange), matching distance1.cu's
    boundary handling. Output P rows are owned, columns global coarse."""
    from ..amg.classical import direct_interpolation
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(sm.n_dev)]
    g_cf = exchange_col_values(sm.part, cf, halos)
    shards = [None] * sm.n_dev
    for d in sm.devs:
        ext, halo = extended_local(sm, d)
        cf_ext = np.concatenate([cf[d], g_cf[d]]) if halo.size else cf[d]
        shards[d] = direct_interpolation(ext, strong[d], cf[d],
                                         col_cf_map=cf_ext, nc=nc)
    return ShardedCSR(sm.part, shards, nc)


def dist_cr(sm: ShardedCSR, sweeps: int = 5, theta_cr: float = 0.7
            ) -> Tuple[List[np.ndarray], RowPartition, int]:
    """Compatible-relaxation selector, shard-parallel (selectors/cr.cu;
    mirrors the single-matrix cr_select exactly): Jacobi sweeps on
    A e = 0 from the same seeded random e, ghost values of e exchanged
    per sweep, then a global max-reduce for the slow-point threshold."""
    from ..amg.classical import FINE
    n_dev = sm.n_dev
    devs = sm.devs
    # e0 slices match the single-chip rng.random(n) draw exactly without
    # materializing O(N) per process: PCG64 advances by draw count
    e = [None] * n_dev
    for d in devs:
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        g = np.random.Generator(np.random.PCG64(0).advance(r0))
        e[d] = g.random(r1 - r0)
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    exts = [None if sm.shards[d] is None else extended_local(sm, d)[0]
            for d in range(n_dev)]
    diags = sm.diagonal()
    dinv = [None] * n_dev
    for d in devs:
        dg = np.asarray(diags[d], np.float64)
        dinv[d] = 1.0 / np.where(dg == 0, 1.0, dg)
    for _ in range(sweeps):
        g_e = exchange_col_values(sm.part, e, halos)
        for d in devs:
            ext = exts[d]
            e_ext = np.concatenate([e[d], g_e[d]]) if halos[d].size \
                else e[d]
            data = ext.data if ext.block_dim == (1, 1) else \
                ext.data[:, 0, 0]
            rows = np.repeat(np.arange(ext.n_rows), ext.row_nnz())
            ae = np.zeros(ext.n_rows)
            np.add.at(ae, rows, data * e_ext[ext.indices])
            e[d] = e[d] - ae * dinv[d] * 0.7
    emax = _mh_scalar(sm.is_partial,
                      max(((np.abs(e[d]).max() if e[d].size else 0.0)
                           for d in devs), default=0.0))
    counts = {}
    slow = [None] * n_dev
    for d in devs:
        sl = np.abs(e[d]) >= theta_cr * emax
        slow[d] = sl
        counts[d] = int(sl.sum())
    total = _mh_scalar(sm.is_partial, float(sum(counts.values())),
                       op=sum)
    if total == 0:
        # degenerate: promote the single globally largest |e| — the FIRST
        # global index achieving emax, matching single-chip argmax
        first = float(sm.n_rows)
        for d in devs:
            if e[d].size and np.abs(e[d]).max() >= emax:
                first = min(first, float(int(sm.part.offsets[d]) +
                                         int(np.argmax(np.abs(e[d])))))
        first = int(_mh_scalar(sm.is_partial, first, op=min))
        for d in devs:
            r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
            if r0 <= first < r1:
                slow[d][first - r0] = True
                counts[d] = 1
    offsets = _counts_to_offsets(sm, counts)
    cf = [None] * n_dev
    for d in devs:
        m = np.full(e[d].shape[0], FINE, np.int64)
        c = np.nonzero(slow[d])[0]
        m[c] = offsets[d] + np.arange(c.size)
        cf[d] = m
    return cf, RowPartition(offsets), int(offsets[-1])


def dist_ensure_coverage(sm: ShardedCSR, strong: List[np.ndarray],
                         cf: List[np.ndarray]
                         ) -> Tuple[List[np.ndarray], RowPartition, int]:
    """Promote F nodes with no C point within distance-2 strong reach to
    C (energymin.ensure_coverage, shard-parallel: coverage flags ghost-
    exchanged for each of the two hops)."""
    from ..amg.classical import FINE
    n_dev = sm.n_dev
    devs = sm.devs
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    exts = [None if sm.shards[d] is None else extended_local(sm, d)[0]
            for d in range(n_dev)]
    c = [None if cf[d] is None else cf[d] >= 0 for d in range(n_dev)]

    def hop(flags):
        g = exchange_col_values(
            sm.part, [None if f is None else f.astype(np.int8)
                      for f in flags], halos)
        out = [None] * n_dev
        for d in devs:
            ext = exts[d]
            rows = np.repeat(np.arange(ext.n_rows), ext.row_nnz())
            r0 = int(sm.part.offsets[d])
            gcol = np.where(ext.indices < ext.n_rows,
                            ext.indices + r0,
                            halos[d][np.maximum(
                                ext.indices.astype(np.int64)
                                - ext.n_rows, 0)]
                            if halos[d].size else ext.indices + r0)
            keep = strong[d] & (gcol != rows + r0)
            fl_ext = np.concatenate(
                [flags[d], g[d].astype(bool)]) if halos[d].size \
                else flags[d]
            cov = np.zeros(ext.n_rows, bool)
            hit = keep & fl_ext[ext.indices]
            cov[np.unique(rows[hit])] = True
            out[d] = cov
        return out

    cov1 = hop(c)
    cov2 = hop(cov1)
    counts, c_new = {}, [None] * n_dev
    for d in devs:
        cn = c[d] | (~c[d] & ~cov1[d] & ~cov2[d])
        c_new[d] = cn
        counts[d] = int(cn.sum())
    offsets = _counts_to_offsets(sm, counts)
    out_cf = [None] * n_dev
    for d in devs:
        m = np.full(c_new[d].shape[0], FINE, np.int64)
        idx = np.nonzero(c_new[d])[0]
        m[idx] = offsets[d] + np.arange(idx.size)
        out_cf[d] = m
    return out_cf, RowPartition(offsets), int(offsets[-1])


def dist_em_interpolation(sm: ShardedCSR, strong: List[np.ndarray],
                          cf: List[np.ndarray], nc: int, strength: str,
                          theta: float, sweeps: int = 2) -> ShardedCSR:
    """Energy-minimizing interpolation, shard-parallel
    (energymin.em_interpolation): distance-2 seed, then projected
    steepest-descent sweeps on tr(P^T A P) with the one-ring's P rows
    exchanged per sweep (the A P product is the only non-local step)."""
    import scipy.sparse as sp
    p_sh = dist_distance2_interpolation(sm, strong, cf, nc, strength,
                                        theta)
    n_dev = sm.n_dev
    devs = sm.devs
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    diags = sm.diagonal()
    work = [None] * n_dev
    shards = [None] * n_dev
    for d in devs:
        ext, _ = extended_local(sm, d)
        data = ext.data if ext.block_dim == (1, 1) else ext.data[:, 0, 0]
        a_loc = sp.csr_matrix((np.asarray(data, np.float64), ext.indices,
                               ext.indptr),
                              shape=(ext.n_rows, ext.n_cols))
        dg = np.asarray(diags[d], np.float64)
        dinv = 1.0 / np.where(dg == 0, 1.0, dg)
        c_rows = cf[d] >= 0
        p = p_sh.shards[d].to_scipy().tocsr()
        rs = np.asarray(p.sum(axis=1)).ravel()
        scale = np.where(~c_rows & (rs != 0),
                         1.0 / np.where(rs == 0, 1.0, rs), 1.0)
        p = (sp.diags(scale) @ p).tocsr()
        pattern = p.copy()
        pattern.data[:] = 1.0
        cnt = np.asarray(pattern.sum(axis=1)).ravel()
        cnt_inv = np.where(cnt > 0, 1.0 / np.where(cnt == 0, 1.0, cnt),
                           0.0)
        work[d] = (a_loc, dinv, c_rows, pattern, cnt_inv)
        shards[d] = CSRMatrix(p.shape[0], nc, p.indptr, p.indices, p.data)
    p_sh = ShardedCSR(sm.part, shards, nc)
    for _ in range(sweeps):
        p_halo = exchange_rows(p_sh, halos)
        new_shards = [None] * n_dev
        for d in devs:
            a_loc, dinv, c_rows, pattern, cnt_inv = work[d]
            p_own = p_sh.shards[d].to_scipy().tocsr()
            p_ext = sp.vstack([p_own, p_halo[d].to_scipy()]).tocsr() \
                if halos[d].size else p_own
            upd = (sp.diags(dinv) @ (a_loc @ p_ext)).multiply(
                pattern).tocsr()
            mean = np.asarray(upd.sum(axis=1)).ravel() * cnt_inv
            upd = (upd - sp.diags(mean) @ pattern).tocsr()
            upd = sp.diags((~c_rows).astype(np.float64)) @ upd
            p = (p_own - 0.5 * upd).tocsr()
            new_shards[d] = CSRMatrix(p.shape[0], nc, p.indptr,
                                      p.indices, p.data)
        p_sh = ShardedCSR(sm.part, new_shards, nc)
    shards = [None] * n_dev
    for d in devs:
        s = p_sh.shards[d].to_scipy().tocsr()
        s.eliminate_zeros()
        shards[d] = CSRMatrix(s.shape[0], nc, s.indptr, s.indices, s.data)
    return ShardedCSR(sm.part, shards, nc)


def dist_multipass_interpolation(sm: ShardedCSR, strong: List[np.ndarray],
                                 cf: List[np.ndarray], nc: int,
                                 max_passes: int = 10) -> ShardedCSR:
    """MULTIPASS interpolation per shard (interpolators/multipass.cu in
    its distributed form): pass 1 interpolates F rows with a strong C
    neighbour directly; each later pass interpolates remaining F rows
    through already-interpolated strong neighbours, with the one-ring's
    freshly computed P rows and interpolated-flags exchanged between
    passes (the reference ships interpolation rows per pass the same
    way). Mirrors the frontier-at-a-time single-matrix formulation."""
    import scipy.sparse as sp
    n_dev = sm.n_dev
    devs = sm.devs
    partial = sm.is_partial
    p_sh = dist_direct_interpolation(sm, strong, cf, nc)
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    interped = [None if cf[d] is None else
                (np.diff(p_sh.shards[d].indptr) > 0) | (cf[d] >= 0)
                for d in range(n_dev)]
    for _ in range(max_passes):
        done = all(interped[d].all() for d in devs)
        if partial:
            done = bool(_mh_scalar(True, float(done), op=min))
        if done:
            break
        g_interp = exchange_col_values(
            sm.part, [None if i is None else i.astype(np.int8)
                      for i in interped], halos)
        p_halo = exchange_rows(p_sh, halos)      # current one-ring P rows
        new_shards = list(p_sh.shards)
        new_interped = [None if i is None else i.copy() for i in interped]
        progressed = False
        for d in devs:
            ext, halo = extended_local(sm, d)
            nl = ext.n_rows
            rows = np.repeat(np.arange(nl), ext.row_nnz())
            cl = ext.indices.astype(np.int64)
            data = ext.data if ext.block_dim == (1, 1) else \
                ext.data[:, 0, 0]
            interped_ext = np.concatenate(
                [interped[d], g_interp[d].astype(bool)]) if halo.size \
                else interped[d]
            cand = np.nonzero(strong[d] & ~interped[d][rows])[0]
            cand = cand[interped_ext[cl[cand]]]
            if cand.size == 0:
                continue
            r_i, c_j = rows[cand], cl[cand]
            wv = np.abs(data[cand]).astype(np.float64)
            wsum = np.zeros(nl)
            np.add.at(wsum, r_i, wv)
            ready = wsum > 0
            wv = wv / wsum[r_i]
            p_own = p_sh.shards[d].to_scipy().tocsr()
            p_ext = sp.vstack([p_own, p_halo[d].to_scipy()]).tocsr() \
                if halo.size else p_own
            wmat = sp.csr_matrix((wv, (r_i, c_j)),
                                 shape=(nl, p_ext.shape[0]))
            p_new = wmat @ p_ext
            keep = sp.diags((~ready).astype(np.float64))
            take = sp.diags(ready.astype(np.float64))
            comb = (keep @ p_own + take @ p_new).tocsr()
            comb.sum_duplicates()
            new_shards[d] = CSRMatrix(nl, nc, comb.indptr, comb.indices,
                                      comb.data)
            new_interped[d] = interped[d] | ready
            progressed = True
        if partial:
            progressed = bool(_mh_scalar(True, float(progressed)))
        if not progressed:
            break
        p_sh = ShardedCSR(sm.part, new_shards, nc)
        interped = new_interped
    shards = [None] * n_dev
    for d in devs:
        s = p_sh.shards[d].to_scipy().tocsr()
        s.eliminate_zeros()
        shards[d] = CSRMatrix(s.shape[0], nc, s.indptr, s.indices, s.data)
    return ShardedCSR(sm.part, shards, nc)


def dist_distance2_interpolation(sm: ShardedCSR, strong: List[np.ndarray],
                                 cf: List[np.ndarray], nc: int,
                                 strength: str, theta: float,
                                 max_row_sum: float = 1.1) -> ShardedCSR:
    """Distance-2 interpolation per shard (interpolators/distance2.cu;
    distributed via createOneRingHaloRows, distributed_manager.cu:1592):
    the strong-F substitution needs the *rows* of halo F neighbours, so
    each shard fetches its one-ring halo rows, recomputes their (row-local)
    strong masks, extends cf over the two-ring columns, and runs the same
    substitution + scaling as the single-matrix code on the stacked
    [owned | halo-row] system."""
    from ..amg.classical import strong_connections
    devs = sm.devs
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(sm.n_dev)]
    g_cf = exchange_col_values(sm.part, cf, halos)
    halo_rows = exchange_rows(sm, halos)
    # pass 1 (shard-local): build the stacked [owned | halo-row] systems
    # and collect each shard's two-ring extra columns, so the cf fetch for
    # the extras is ONE collective exchange (a per-shard exchange inside
    # the loop would deadlock processes owning different shard counts)
    work = [None] * sm.n_dev
    extras = [None] * sm.n_dev
    for d in devs:
        s = sm.shards[d]
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        nl = r1 - r0
        hr = halo_rows[d]
        nh = hr.n_rows
        # stacked system: rows [0,nl) owned, [nl,nl+nh) halo rows; columns
        # renumbered over the union of owned + two-ring ghost columns
        all_cols = np.concatenate([s.indices.astype(np.int64),
                                   hr.indices.astype(np.int64)])
        stack_rows_global = np.concatenate(
            [np.arange(r0, r1, dtype=np.int64), halos[d]])
        uniq = np.unique(np.concatenate([all_cols, stack_rows_global]))
        # local id of each stacked row's global id within uniq
        row_gid = stack_rows_global
        row_lid = np.searchsorted(uniq, row_gid)
        col_l = np.searchsorted(uniq, all_cols)
        # column local ids must coincide with stacked row ids where they
        # refer to a stacked row — remap through the stacked order
        lid_of = np.full(uniq.size, -1, np.int64)
        lid_of[row_lid] = np.arange(row_gid.size)
        # columns not matching any stacked row get fresh ids past the stack
        extra = lid_of < 0
        lid_of[extra] = row_gid.size + np.arange(int(extra.sum()))
        col_stacked = lid_of[col_l]
        n_stack_cols = row_gid.size + int(extra.sum())
        indptr = np.concatenate([s.indptr, s.indptr[-1] + hr.indptr[1:]])
        stacked = CSRMatrix(nl + nh, n_stack_cols, indptr,
                            col_stacked.astype(np.int32),
                            np.concatenate([s.data, hr.data], axis=0),
                            diag_data=None if s.diag_data is None or
                            hr.diag_data is None else
                            np.concatenate([s.diag_data, hr.diag_data]))
        st_all = strong_connections(stacked, strength, theta, max_row_sum)
        # cf over the stacked column space: stacked rows carry their cf;
        # two-ring extras fetch cf by ownership (pass 2, one exchange)
        cf_rows = np.concatenate([cf[d], g_cf[d]]) if nh else cf[d]
        cf_cols = np.full(n_stack_cols, FINE, np.int64)
        cf_cols[:row_gid.size] = cf_rows
        extras[d] = uniq[extra]
        work[d] = (stacked, st_all, cf_rows, cf_cols, nl)
    g_extra = exchange_col_values(sm.part, cf, extras)
    shards = [None] * sm.n_dev
    for d in devs:
        stacked, st_all, cf_rows, cf_cols, nl = work[d]
        n_stack_rows = cf_rows.shape[0]
        if extras[d].size:
            cf_cols[n_stack_rows:] = g_extra[d]
        p_stacked = _distance2_rows(stacked, st_all, cf_rows, cf_cols, nc)
        # keep owned rows only
        p0 = int(p_stacked.indptr[nl])
        shards[d] = CSRMatrix(nl, nc, p_stacked.indptr[:nl + 1],
                              p_stacked.indices[:p0],
                              p_stacked.data[:p0])
    out = ShardedCSR(sm.part, shards, nc)
    # F rows left empty (no strong two-ring path to C): fall back to
    # multipass for the whole operator, mirroring the single-chip gate
    # (classical.distance2_interpolation) so shard-parallel parity holds;
    # the decision is a global any-reduce so every process takes the same
    # branch
    empty_f = any(((out.shards[d].row_nnz() == 0) & (cf[d] < 0)).any()
                  for d in devs)
    if _mh_scalar(sm.is_partial, float(empty_f)) > 0:
        return dist_multipass_interpolation(sm, strong, cf, nc, max_passes=3)
    return out


def _distance2_rows(csr: CSRMatrix, strong: np.ndarray,
                    cf_rows: np.ndarray, cf_cols: np.ndarray,
                    nc: int) -> CSRMatrix:
    """Distance-2 substitution + scaling over an (extended) local system
    with explicit column cf — the core of distance2.cu in COO form. Row i
    of the result interpolates row i of ``csr``; columns are global coarse
    ids via ``cf_cols``."""
    import scipy.sparse as sp
    n = csr.n_rows
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    rows = np.repeat(np.arange(n), csr.row_nnz())
    cols = csr.indices.astype(np.int64)
    # diagonal: the stacked system puts row i's global id at column
    # position i by construction
    diag = np.zeros(n)
    dmask = cols == rows
    diag[rows[dmask]] = data[dmask]
    if csr.diag_data is not None:
        dd = csr.diag_data if csr.block_dim == (1, 1) else \
            csr.diag_data[:, 0, 0]
        diag = diag + dd
    sign = np.where(diag < 0, -1.0, 1.0)
    keep = strong & (sign[rows] * data < 0) & ~dmask
    s_rows, s_cols, s_vals = rows[keep], cols[keep], data[keep]
    col_c = np.where(s_cols < cf_cols.size, cf_cols[
        np.minimum(s_cols, cf_cols.size - 1)], FINE)
    col_is_c = col_c >= 0
    denom = np.zeros(n)
    np.add.at(denom, s_rows[col_is_c], s_vals[col_is_c])
    has_c_row = denom != 0
    safe_den = np.where(denom == 0, 1.0, denom)
    d_rows = s_rows[col_is_c]
    d_vals = s_vals[col_is_c] / safe_den[d_rows]
    dist = sp.csr_matrix((d_vals, (d_rows, col_c[col_is_c])), shape=(n, nc))
    a_sc = sp.csr_matrix((s_vals[col_is_c], (d_rows, col_c[col_is_c])),
                         shape=(n, nc))
    # strong F-F couplings whose endpoint is a *stacked row* with C
    # neighbours (only stacked rows carry distribution rows)
    in_stack = s_cols < n
    ff = (~col_is_c) & in_stack & has_c_row[np.minimum(s_cols, n - 1)]
    a_sf = sp.csr_matrix((s_vals[ff], (s_rows[ff], s_cols[ff])),
                         shape=(n, n))
    w = (a_sc + a_sf @ dist).tocsr()
    offd = ~dmask
    neg = offd & (sign[rows] * data < 0)
    sum_all = np.zeros(n)
    np.add.at(sum_all, rows[neg], data[neg])
    w_sum = np.asarray(w.sum(axis=1)).ravel()
    alpha = np.where(w_sum != 0, sum_all / np.where(w_sum == 0, 1.0, w_sum),
                     0.0)
    safe_diag = np.where(diag == 0, 1.0, diag)
    p = (sp.diags(-alpha / safe_diag) @ w).tolil()
    for i in np.nonzero(cf_rows >= 0)[0]:
        p.rows[i] = [int(cf_rows[i])]
        p.data[i] = [1.0]
    p = p.tocsr()
    p.eliminate_zeros()
    return CSRMatrix(n, nc, p.indptr, p.indices, p.data)


# ---------------------------------------------------------------------------
# Distributed Galerkin products
# ---------------------------------------------------------------------------

def dist_classical_galerkin(sm: ShardedCSR, p: ShardedCSR,
                            coarse_part: RowPartition) -> Tuple[ShardedCSR,
                                                                ShardedCSR]:
    """Distributed RAP (computeAOperator_distributed,
    classical_amg_level.cu:942) in two halo steps:

      1. AP per shard: owned A rows x [owned | one-ring] P rows (one
         halo-row exchange of P).
      2. RAP contributions (P^T restricted to owned fine rows) scattered
         to the owners of their coarse rows and summed.

    Also returns R (= P^T) as a sharded operator over the coarse rows,
    assembled from the same boundary sends. Per-shard flops are
    O(flops/P); no global product is formed.
    """
    from ..ops.spgemm import csr_spgemm
    nc = p.n_cols
    devs = sm.devs
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(sm.n_dev)]
    p_halo = exchange_rows(p, halos)
    rap_contribs = []
    r_contribs = []
    for d in devs:
        ext, halo = extended_local(sm, d)
        pd = p.shards[d]
        ph = p_halo[d]
        # stack P rows in extended-local column order: [owned | halo]
        pcat = CSRMatrix(
            ext.n_cols, nc,
            np.concatenate([pd.indptr, pd.indptr[-1] + ph.indptr[1:]]),
            np.concatenate([pd.indices, ph.indices]),
            np.concatenate([pd.data, ph.data], axis=0))
        ap = csr_spgemm(ext, pcat)              # owned fine rows x coarse
        # RAP contributions: for P entry (i, I) and AP entry (i, J):
        # (I, J) += P[i,I] * AP[i,J] — vectorized ESC over owned rows
        fan = ap.row_nnz()
        p_rows = np.repeat(np.arange(pd.n_rows, dtype=np.int64),
                           pd.row_nnz())
        fan_p = fan[p_rows]
        total = int(fan_p.sum())
        big_I = np.repeat(pd.indices.astype(np.int64), fan_p)
        starts = ap.indptr[p_rows].astype(np.int64)
        base = np.repeat(starts, fan_p)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(fan_p) - fan_p, fan_p)
        ap_pos = base + within
        big_J = ap.indices[ap_pos].astype(np.int64)
        big_V = np.repeat(pd.data, fan_p) * ap.data[ap_pos]
        rap_contribs.append((big_I, big_J, big_V))
        # R rows: (I, i_global) = P[i, I]
        r0 = int(sm.part.offsets[d])
        r_contribs.append((pd.indices.astype(np.int64),
                           p_rows + r0, pd.data))
    ld = devs if sm.is_partial else None
    ac = send_coo_to_owners(coarse_part, rap_contribs, nc, local_devs=ld)
    r = send_coo_to_owners(coarse_part, r_contribs, sm.n_rows,
                           local_devs=ld)
    return ac, r


def dist_aggregation_galerkin(sm: ShardedCSR, agg: List[np.ndarray],
                              coarse_part: RowPartition) -> ShardedCSR:
    """Distributed piecewise-constant Galerkin: with shard-local aggregates
    (aggregation_amg_level.cu:1986 — aggregates never span ranks), every
    contribution A[i,j] lands on the coarse row agg[i] owned by i's shard,
    so the product is one local sort-reduce per shard after a ghost
    exchange of the aggregate map (coarse ids are global)."""
    nc = int(coarse_part.offsets[-1])
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(sm.n_dev)]
    g_agg = exchange_col_values(sm.part, agg, halos)
    shards = [None] * sm.n_dev
    for d in sm.devs:
        s = sm.shards[d]
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        c0 = int(coarse_part.offsets[d])
        nl_c = coarse_part.size(d)
        rows = np.repeat(np.arange(s.n_rows, dtype=np.int64), s.row_nnz())
        c_rows = agg[d][rows]
        cols = s.indices.astype(np.int64)
        own = (cols >= r0) & (cols < r1)
        c_cols = np.where(own, agg[d][np.where(own, cols - r0, 0)], FINE)
        if halos[d].size:
            hidx = np.clip(np.searchsorted(halos[d], cols), 0,
                           max(0, halos[d].size - 1))
            c_cols = np.where(own, c_cols, g_agg[d][hidx])
        keep = (c_rows >= 0) & (c_cols >= 0)
        if s.block_dim == (1, 1):
            sh = CSRMatrix.from_coo(nl_c, nc, c_rows[keep] - c0,
                                    c_cols[keep], s.data[keep])
        else:
            sh = CSRMatrix.from_coo(nl_c, nc, c_rows[keep] - c0,
                                    c_cols[keep], s.data[keep],
                                    block_dim=s.block_dim)
        if s.diag_data is not None:
            d_rows = agg[d]
            k2 = d_rows >= 0
            from ..ops.spgemm import csr_add
            extra = CSRMatrix.from_coo(nl_c, nc, d_rows[k2] - c0,
                                       d_rows[k2], s.diag_data[k2],
                                       block_dim=s.block_dim)
            sh = csr_add(sh, extra)
        shards[d] = sh
    return ShardedCSR(coarse_part, shards, nc)


def dist_shard_local_aggregates(sm: ShardedCSR, selector: str, cfg,
                                scope: str) -> Tuple[List[np.ndarray],
                                                     RowPartition]:
    """Shard-local aggregation on each shard's *diagonal block* only
    (reference: setAggregates per rank on owned rows,
    aggregation_amg_level.cu:1986). Returns per-shard aggregate maps with
    GLOBAL coarse ids and the aligned coarse partition."""
    from ..amg.aggregation import select_aggregates
    maps = [None] * sm.n_dev
    counts = {}
    for d in sm.devs:
        s = sm.shards[d]
        r0, r1 = int(sm.part.offsets[d]), int(sm.part.offsets[d + 1])
        rows = np.repeat(np.arange(s.n_rows, dtype=np.int64), s.row_nnz())
        cols = s.indices.astype(np.int64)
        own = (cols >= r0) & (cols < r1)
        blk = CSRMatrix.from_coo(s.n_rows, s.n_rows, rows[own],
                                 cols[own] - r0,
                                 s.data[own] if s.block_dim == (1, 1)
                                 else s.data[own],
                                 block_dim=s.block_dim,
                                 sum_duplicates=False)
        if s.diag_data is not None:
            blk.diag_data = s.diag_data
        agg_d, nc_d = select_aggregates(blk, selector, cfg, scope)
        maps[d] = agg_d
        counts[d] = nc_d
    offsets = _counts_to_offsets(sm, counts)
    out = [None if m is None else np.where(m >= 0, offsets[d] + m, FINE)
           for d, m in enumerate(maps)]
    return out, RowPartition(offsets)


def dist_pc_interpolation(part: RowPartition, agg: Sequence[np.ndarray],
                          nc: int, block_dim=(1, 1)) -> ShardedCSR:
    """Piecewise-constant prolongator from per-shard aggregate maps with
    global coarse ids (aggregation P, aggregation_amg_level.cu:1986): row i
    has the single entry (agg[i], 1.0) — trivially row-local. BSR levels
    carry identity blocks so block vectors transfer per component
    (aggregation_amg_level.cu restrict/prolongate on bxb blocks)."""
    bx, by = block_dim
    shards = [None] * part.n_dev
    for d in range(part.n_dev):
        if agg[d] is None:
            continue
        a = np.asarray(agg[d], np.int64)
        keep = a >= 0
        rows = np.nonzero(keep)[0]
        if bx > 1:
            vals = np.tile(np.eye(bx), (rows.size, 1, 1))
            shards[d] = CSRMatrix.from_coo(a.size, nc, rows, a[keep],
                                           vals, block_dim=(bx, bx))
        else:
            shards[d] = CSRMatrix.from_coo(a.size, nc, rows, a[keep],
                                           np.ones(rows.size))
    return ShardedCSR(part, shards, nc)


def dist_transpose(p: ShardedCSR, out_part: RowPartition) -> ShardedCSR:
    """Sharded transpose: P (fine rows, coarse cols) -> R (coarse rows over
    ``out_part``, fine cols) via boundary-row COO sends — the R assembly of
    the distributed Galerkin path (classical_amg_level.cu:942)."""
    contribs = []
    for d in p.devs:
        s = p.shards[d]
        r0 = int(p.part.offsets[d])
        rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                         s.row_nnz()) + r0
        data = s.data if s.block_dim == (1, 1) \
            else np.swapaxes(s.data, 1, 2)       # (P^T)_IJ = (P_JI)^T
        contribs.append((s.indices.astype(np.int64), rows, data))
    return send_coo_to_owners(out_part, contribs, int(p.part.offsets[-1]),
                              local_devs=p.devs if p.is_partial else None)


def consolidate_sharded(sm: ShardedCSR, new_part: RowPartition
                        ) -> ShardedCSR:
    """Move rows to the (smaller) active shard set of a consolidated
    partition (the gluing step, amg.cu:328-391): pure row re-ownership,
    O(moved rows) traffic."""
    if np.array_equal(new_part.offsets, sm.part.offsets):
        return sm
    devs = sm.devs
    contribs = []
    for d in devs:
        s = sm.shards[d]
        r0 = int(sm.part.offsets[d])
        rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                         s.row_nnz()) + r0
        contribs.append((rows, s.indices.astype(np.int64), s.data))
    out = send_coo_to_owners(new_part, contribs, sm.n_cols,
                             local_devs=devs if sm.is_partial else None)
    have_dd = all(sm.shards[d].diag_data is not None for d in devs)
    if sm.is_partial:
        have_dd = _mh_scalar(True, float(have_dd), op=min) > 0
    if have_dd:
        # external diagonals travel keyed by global row id — the same
        # boundary machinery as ghost values, sized by the moved rows
        dd_vals = [None if sm.shards[d] is None else sm.shards[d].diag_data
                   for d in range(sm.n_dev)]
        need = [np.arange(int(new_part.offsets[d]),
                          int(new_part.offsets[d + 1]), dtype=np.int64)
                if out.shards[d] is not None else None
                for d in range(new_part.n_dev)]
        g_dd = exchange_col_values(sm.part, dd_vals, need)
        for d in range(new_part.n_dev):
            if out.shards[d] is not None:
                out.shards[d].diag_data = g_dd[d]
    return out


# ---------------------------------------------------------------------------
# Shard-parallel coloring + DILU factorization (multicolor_dilu_solver.cu)
# ---------------------------------------------------------------------------

def dist_color(sm: ShardedCSR, scheme: str = "PARALLEL_GREEDY",
               seed: int = 0) -> Tuple[List[np.ndarray], int]:
    """Shard-parallel Jones-Plassmann coloring with exact single-chip
    parity (coloring._jones_plassmann / the native jp_rounds closed form):
    weights hash GLOBAL row ids — computable locally for owned rows and
    ghosts alike — so each JP round exchanges only the ghost rows'
    uncolored STATUS, and each greedy round only the ghost colors
    (boundary-sized traffic; the reference's coloring runs per GPU with
    boundary_coloring exchange, core.cu:372-377).

    Adjacency is each row's own column pattern (matching the single-chip
    _adjacency, which does not symmetrize). Ties between equal hash
    weights break by global index, matching the closed-form native order.
    Returns (per-shard color arrays over owned rows, num_colors)."""
    from ..coloring import _hash_weights
    devs = sm.devs
    n_dev = sm.n_dev
    partial = sm.is_partial
    n = sm.n_rows
    w_all = None                    # lazy per-id hash evaluation

    def w_of(ids):
        # _hash_weights(n) is a pure elementwise function of the id —
        # evaluate only the ids this shard touches
        x = (ids.astype(np.uint64) + np.uint64(seed * 0x9E3779B9 + 1))
        x = (x ^ (x >> np.uint64(16))) * np.uint64(0x45d9f3b3335b369)
        x = (x ^ (x >> np.uint64(32))) * np.uint64(0x119de1f3c8b9a3f)
        x = x ^ (x >> np.uint64(16))
        return x.astype(np.float64) / float(2 ** 64) + \
            ids.astype(np.float64) * 1e-18
    _ = w_all, _hash_weights, n

    adj_r = [None] * n_dev          # edge arrays per shard (no self loops)
    adj_c = [None] * n_dev          # extended-local col ids
    halos = [None] * n_dev
    iw_ext = [None] * n_dev         # idx_w over [owned | ghost]
    nl_of = {}
    for d in devs:
        ext, halo = extended_local(sm, d)
        halos[d] = halo
        nl = ext.n_rows
        nl_of[d] = nl
        r0 = int(sm.part.offsets[d])
        rows = np.repeat(np.arange(nl, dtype=np.int64), ext.row_nnz())
        cols = ext.indices.astype(np.int64)
        keep = cols != rows        # drop the diagonal
        adj_r[d], adj_c[d] = rows[keep], cols[keep]
        iw_ext[d] = np.concatenate(
            [w_of(np.arange(r0, r0 + nl, dtype=np.int64)), w_of(halo)])

    # -- JP rounds: winners beat every uncolored neighbour's idx_w ---------
    round_of = {d: np.full(nl_of[d], -1, np.int64) for d in devs}
    unc_ghost = [None if halos[d] is None else
                 np.ones(0, np.float64) for d in range(n_dev)]
    r = 0
    while True:
        g_unc = exchange_col_values(
            sm.part,
            [None if sm.shards[d] is None else
             (round_of[d] < 0).astype(np.float64) for d in range(n_dev)],
            halos)
        remaining = 0
        for d in devs:
            unc_own = round_of[d] < 0
            unc_ext = np.concatenate([unc_own.astype(np.float64),
                                      g_unc[d]]) > 0
            live = unc_ext[adj_c[d]] & unc_own[adj_r[d]]
            nbmax = np.full(nl_of[d], -np.inf)
            if live.any():
                np.maximum.at(nbmax, adj_r[d][live],
                              iw_ext[d][adj_c[d][live]])
            win = unc_own & (iw_ext[d][:nl_of[d]] > nbmax)
            round_of[d][win] = r
            remaining += int((round_of[d] < 0).sum())
        r += 1
        if _mh_scalar(partial, float(remaining), op=sum) == 0:
            break
    _ = unc_ghost
    n_rounds = int(_mh_scalar(
        partial, float(max((int(round_of[d].max()) + 1 if nl_of[d] else 0)
                           for d in devs))))

    if scheme == "MIN_MAX":
        colors = [None if sm.shards[d] is None else
                  round_of[d].astype(np.int32) for d in range(n_dev)]
        return colors, n_rounds

    # -- greedy colors, round-major: mex over already-colored neighbours ---
    colors = {d: np.full(nl_of[d], -1, np.int64) for d in devs}
    cmax = 1
    for rr in range(n_rounds):
        g_col = exchange_col_values(
            sm.part,
            [None if sm.shards[d] is None else colors[d]
             for d in range(n_dev)], halos)
        round_max = 0
        for d in devs:
            sel = round_of[d] == rr
            if not sel.any():
                continue
            col_ext = np.concatenate([colors[d], g_col[d]])
            m = sel[adj_r[d]]
            re_, ce_ = adj_r[d][m], col_ext[adj_c[d][m]]
            used = np.zeros((nl_of[d], cmax + 2), bool)
            ok = ce_ >= 0
            used[re_[ok], np.minimum(ce_[ok], cmax + 1)] = True
            mex = np.argmin(used, axis=1)      # first unused color
            colors[d][sel] = mex[sel]
            if colors[d][sel].size:
                round_max = max(round_max, int(colors[d][sel].max()))
        cmax = max(cmax, int(_mh_scalar(partial, float(round_max))) + 1)
    num = int(_mh_scalar(
        partial, float(max((int(colors[d].max()) for d in devs),
                           default=0)))) + 1
    out = [None if sm.shards[d] is None else colors[d].astype(np.int32)
           for d in range(n_dev)]
    return out, max(1, num)


def _dist_dilu_factor_blocked(sm: ShardedCSR, colors: List[np.ndarray],
                              num_colors: int, bx: int
                              ) -> Tuple[List[np.ndarray],
                                         List[np.ndarray]]:
    """Blocked (BSR) shard-parallel DILU E blocks — the per-edge form of
    the single-chip blocked factorization (solvers/multicolor.py):
        E_i = A_ii - sum_{color(j)<color(i)} A_ij invE_j A_ji
    with bx x bx matrix products; singular blocks fall back to identity
    exactly like the single-chip guard."""
    if sm.is_partial:
        raise NotImplementedError(
            "rank-local (partial) BSR DILU factorization is not "
            "implemented — single-process meshes only")
    devs = sm.devs
    n_dev = sm.n_dev
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    halo_rows = exchange_rows(sm, halos)
    edges = {}
    diag = {}
    for d in devs:
        ext, halo = extended_local(sm, d)
        r0 = int(sm.part.offsets[d])
        nl = ext.n_rows
        rows = np.repeat(np.arange(nl, dtype=np.int64), ext.row_nnz())
        cols = ext.indices.astype(np.int64)
        vals = np.asarray(ext.data)                     # (nnz, bx, bx)
        aji = np.zeros_like(vals)
        own = cols < nl
        keys_fwd = rows * (nl + halo.size) + cols
        kf = np.sort(keys_fwd[own])
        rev_keys = cols[own] * (nl + halo.size) + rows[own]
        pos = np.searchsorted(kf, rev_keys)
        pos = np.minimum(pos, kf.size - 1)
        hit = kf[pos] == rev_keys if kf.size else np.zeros(0, bool)
        order_own = np.argsort(keys_fwd[own], kind="stable")
        idx_own = np.nonzero(own)[0]
        src = idx_own[order_own]
        aji_own = np.zeros((int(own.sum()), bx, bx), vals.dtype)
        aji_own[hit] = vals[src[pos[hit]]]              # the (j,i) block
        aji[idx_own] = aji_own
        gsel = ~own
        if gsel.any():
            hr = halo_rows[d]
            gi = cols[gsel] - nl
            tgt = rows[gsel] + r0
            hvals = np.zeros((int(gsel.sum()), bx, bx), vals.dtype)
            hind = hr.indices.astype(np.int64)
            for k in range(gi.size):
                p0, p1 = int(hr.indptr[gi[k]]), int(hr.indptr[gi[k] + 1])
                mmask = hind[p0:p1] == tgt[k]
                if mmask.any():
                    hvals[k] = hr.data[p0:p1][mmask][0]
            aji[gsel] = hvals
        edges[d] = (rows, cols, vals.astype(np.float64),
                    aji.astype(np.float64))
        diag[d] = np.asarray(ext.diagonal(), np.float64)
    E = {d: diag[d].copy() for d in devs}
    invE = {d: np.zeros_like(diag[d]) for d in devs}
    done = {d: np.zeros_like(diag[d]) for d in devs}
    eye = np.eye(bx)
    for c in range(num_colors):
        g_done = exchange_col_values(
            sm.part, [None if sm.shards[d] is None else done[d]
                      for d in range(n_dev)], halos)
        for d in devs:
            rows_c = colors[d] == c
            if not rows_c.any():
                continue
            nl = diag[d].shape[0]
            if c > 0:
                rows_e, cols_e, vals_e, aji_e = edges[d]
                done_ext = np.concatenate([done[d], g_done[d]], axis=0) \
                    if g_done[d].size else done[d]
                sel = rows_c[rows_e]
                if sel.any():
                    contrib = np.einsum(
                        "kab,kbc,kcd->kad", vals_e[sel],
                        done_ext[cols_e[sel]], aji_e[sel])
                    corr = np.zeros((nl, bx, bx))
                    np.add.at(corr, rows_e[sel], contrib)
                    E[d][rows_c] = diag[d][rows_c] - corr[rows_c]
            blocks = E[d][rows_c]
            sing = np.abs(np.linalg.det(blocks)) < \
                np.finfo(np.float64).tiny
            safe = np.where(sing[:, None, None], eye, blocks)
            inv_c = np.linalg.inv(safe)
            inv_c[sing] = eye
            invE[d][rows_c] = inv_c
            done[d][rows_c] = invE[d][rows_c]
    e_out = [None] * n_dev
    ie_out = [None] * n_dev
    for d in devs:
        e_out[d] = E[d]
        ie_out[d] = invE[d]
    return e_out, ie_out


def dist_dilu_factor(sm: ShardedCSR, colors: List[np.ndarray],
                     num_colors: int
                     ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Shard-parallel DILU E-diagonal (multicolor_dilu_solver.cu setup):
        E_i = a_ii - sum_{color(j) < color(i)} a_ij * invE_j * a_ji
    color-sequentially. a_ji for ghost j comes from ONE halo-row fetch
    (createOneRingHaloRows); per color, ghost invE values ride one
    boundary exchange. BSR blocks factor natively (round 5): E_i are
    bx x bx blocks, the corrections are per-edge block triple products,
    and invE ghost blocks ride the same boundary exchange."""
    bx = sm.block_dim[0] if hasattr(sm, "block_dim") else 1
    if bx > 1:
        return _dist_dilu_factor_blocked(sm, colors, num_colors, bx)
    devs = sm.devs
    n_dev = sm.n_dev
    partial = sm.is_partial
    halos = [None if sm.shards[d] is None else sm.halo_cols(d)
             for d in range(n_dev)]
    halo_rows = exchange_rows(sm, halos)
    H = {}
    diag = {}
    for d in devs:
        ext, halo = extended_local(sm, d)
        r0 = int(sm.part.offsets[d])
        nl = ext.n_rows
        rows = np.repeat(np.arange(nl, dtype=np.int64), ext.row_nnz())
        cols = ext.indices.astype(np.int64)
        vals = np.asarray(ext.data)
        # a_ji lookup: owned j -> transpose of the owned block; ghost j ->
        # the fetched halo row j at global column (i + r0)
        keys_fwd = rows * (nl + halo.size) + cols
        aji = np.zeros(vals.shape[0], vals.dtype)
        own = cols < nl
        # owned-owned: find (j, i) among this shard's owned-col edges
        kf = np.sort(keys_fwd[own])
        rev_keys = cols[own] * (nl + halo.size) + rows[own]
        pos = np.searchsorted(kf, rev_keys)
        pos = np.minimum(pos, kf.size - 1)
        hit = kf[pos] == rev_keys if kf.size else np.zeros(0, bool)
        # map sorted position back to edge index
        order_own = np.argsort(keys_fwd[own], kind="stable")
        idx_own = np.nonzero(own)[0]
        src = idx_own[order_own]
        aji_own = np.zeros(own.sum(), vals.dtype)
        aji_own[hit] = vals[src[pos[hit]]]
        aji[idx_own] = aji_own
        # owned-ghost: halo row (halo[c-nl]) at global col i+r0
        gsel = ~own
        if gsel.any():
            hr = halo_rows[d]
            gi = cols[gsel] - nl                   # halo row index
            tgt = rows[gsel] + r0                  # global col wanted
            hvals = np.zeros(gi.size, vals.dtype)
            hind = hr.indices.astype(np.int64)
            for k in range(gi.size):
                p0, p1 = int(hr.indptr[gi[k]]), int(hr.indptr[gi[k] + 1])
                m = hind[p0:p1] == tgt[k]
                if m.any():
                    hvals[k] = hr.data[p0:p1][m][0]
            aji[gsel] = hvals
        h = vals * aji
        import scipy.sparse as sp
        H[d] = sp.csr_matrix((h, cols, ext.indptr),
                             shape=(nl, nl + halo.size))
        diag[d] = ext.diagonal().astype(np.result_type(vals.dtype,
                                                       np.float64))
    E = {d: diag[d].copy() for d in devs}
    invE = {d: np.zeros_like(diag[d]) for d in devs}
    done = {d: np.zeros_like(diag[d]) for d in devs}
    for c in range(num_colors):
        g_done = exchange_col_values(
            sm.part, [None if sm.shards[d] is None else done[d]
                      for d in range(n_dev)], halos)
        for d in devs:
            rows_c = colors[d] == c
            if not rows_c.any():
                continue
            if c > 0:
                done_ext = np.concatenate([done[d], g_done[d]])
                corr = H[d][rows_c] @ done_ext
                E[d][rows_c] = diag[d][rows_c] - corr
            safe = np.where(E[d][rows_c] == 0, 1.0, E[d][rows_c])
            invE[d][rows_c] = 1.0 / safe
            done[d][rows_c] = invE[d][rows_c]
    _ = partial
    e_out = [None] * n_dev
    ie_out = [None] * n_dev
    for d in devs:
        e_out[d] = E[d]
        ie_out[d] = invE[d]
    return e_out, ie_out


class DistScaler:
    """Per-shard scale vectors from a rank-local (O(N/P)) equation
    scaling pass (reference: Scaler hooks scale distributed systems,
    solver.cu:469-482). ``dl``/``dr`` hold the owned-row factors per
    shard in scalar-row space (block rows expanded)."""

    def __init__(self, part: RowPartition, dl: list, dr: list, bx: int):
        self.part = part
        self.dl = dl
        self.dr = dr
        self.bx = bx

    def _rows(self, vecs, r0: int, r1: int) -> np.ndarray:
        """Concatenated factors for global block rows [r0, r1) — must be
        covered by locally-held shards."""
        offs = self.part.offsets
        parts = []
        for d in range(self.part.n_dev):
            lo, hi = max(r0, int(offs[d])), min(r1, int(offs[d + 1]))
            if lo >= hi:
                continue
            v = vecs[d]
            assert v is not None, "rows not held by this process"
            parts.append(v[(lo - int(offs[d])) * self.bx:
                           (hi - int(offs[d])) * self.bx])
        return np.concatenate(parts) if parts else np.zeros(0)

    def scale_rhs(self, b: np.ndarray, r0: int, r1: int) -> np.ndarray:
        return np.asarray(b) * self._rows(self.dl, r0, r1)

    def scale_solution_in(self, x: np.ndarray, r0: int, r1: int
                          ) -> np.ndarray:
        return np.asarray(x) / self._rows(self.dr, r0, r1)

    def unscale_solution(self, x: np.ndarray, r0: int, r1: int
                         ) -> np.ndarray:
        return np.asarray(x) * self._rows(self.dr, r0, r1)


def _ghost_pull(sm: ShardedCSR, owned: list, halo_cols: list) -> list:
    """dr values at each shard's ghost columns (boundary exchange)."""
    return exchange_col_values(sm.part, owned, halo_cols)


def _ghost_push(sm: ShardedCSR, contribs: dict) -> list:
    """Sum per-shard contributions keyed by global column id into the
    owning shards. ``contribs[d] = (ids, vals)`` covers only d's ghost
    columns, so the cross-process traffic is boundary-sized."""
    from . import multihost as mh
    part = sm.part
    out = [None if sm.shards[d] is None else
           np.zeros(sm.shards[d].n_rows) for d in range(sm.n_dev)]
    local_ids, local_vals = [], []
    for d, (ids, vals) in contribs.items():
        local_ids.append(ids)
        local_vals.append(vals)
    ids = np.concatenate(local_ids) if local_ids else np.zeros(0, np.int64)
    vals = np.concatenate(local_vals) if local_vals else np.zeros(0)
    if sm.is_partial:
        ids = np.concatenate(mh.allgather_host(ids.astype(np.int64)))
        vals = np.concatenate(mh.allgather_host(vals.astype(np.float64)))
    for d in sm.devs:
        r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
        mine = (ids >= r0) & (ids < r1)
        np.add.at(out[d], ids[mine] - r0, vals[mine])
    return out


def dist_scale(sm: ShardedCSR, name: str, iterations: int = 10
               ) -> DistScaler:
    """Rank-local equation scaling: rewrites ``sm`` in place
    (A <- Dl A Dr) and returns the per-shard scale vectors. Ghost Dr
    values move through boundary-sized exchanges; the column-norm pass of
    binormalization pushes ghost contributions back to their owners.
    Matches the single-chip scalers (scalers.py / core/src/scalers/)
    numerically up to cross-shard accumulation order."""
    part = sm.part
    bx, by = sm.block_dim
    halo_cols = [np.zeros(0, np.int64) if sm.shards[d] is None else None
                 for d in range(sm.n_dev)]
    owned_masks = [None] * sm.n_dev
    for d in sm.devs:
        s = sm.shards[d]
        r0, r1 = int(part.offsets[d]), int(part.offsets[d + 1])
        own = (s.indices >= r0) & (s.indices < r1)
        owned_masks[d] = own
        halo_cols[d] = np.unique(s.indices[~own]).astype(np.int64)

    def col_vec(d, owned_v, ghost_v):
        """Per-nnz column values for shard d from (owned arrays, ghost
        values aligned with halo_cols[d])."""
        s = sm.shards[d]
        r0 = int(part.offsets[d])
        own = owned_masks[d]
        v = np.empty(s.indices.shape[0])
        v[own] = owned_v[s.indices[own] - r0]
        if (~own).any():
            pos = np.searchsorted(halo_cols[d], s.indices[~own])
            v[~own] = ghost_v[pos]
        return v

    def abs2(d):
        s = sm.shards[d]
        data = s.data if s.block_dim == (1, 1) else s.data[:, 0, 0]
        return np.abs(np.real(data).astype(np.float64)) ** 2

    if name == "DIAGONAL_SYMMETRIC":
        dl = {}
        for d in sm.devs:
            s = sm.shards[d]
            r0 = int(part.offsets[d])
            rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                             s.row_nnz())
            diag = np.zeros(s.n_rows)
            dmask = s.indices - r0 == rows
            data = s.data if s.block_dim == (1, 1) else s.data[:, 0, 0]
            diag[rows[dmask]] = np.real(data[dmask])
            if s.diag_data is not None:
                dd = s.diag_data if s.block_dim == (1, 1) \
                    else s.diag_data[:, 0, 0]
                diag = diag + np.real(dd)
            dl[d] = 1.0 / np.sqrt(np.where(diag == 0, 1.0, np.abs(diag)))
        dr = dl
    elif name in ("BINORMALIZATION", "NBINORMALIZATION"):
        dl = {d: np.ones(sm.shards[d].n_rows) for d in sm.devs}
        dr = {d: np.ones(sm.shards[d].n_rows) for d in sm.devs}
        for _ in range(iterations):
            ghosts = _ghost_pull(
                sm, [None if sm.shards[d] is None else dr[d] ** 2
                     for d in range(sm.n_dev)],
                halo_cols)
            for d in sm.devs:
                s = sm.shards[d]
                rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                                 s.row_nnz())
                r = np.zeros(s.n_rows)
                np.add.at(r, rows, abs2(d) * col_vec(d, dr[d] ** 2,
                                                     ghosts[d]))
                dl[d] = 1.0 / np.sqrt(np.sqrt(np.where(r == 0, 1.0, r)))
            contribs = {}
            own_sum = {}
            for d in sm.devs:
                s = sm.shards[d]
                r0 = int(part.offsets[d])
                rows = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                                 s.row_nnz())
                w = abs2(d) * (dl[d] ** 2)[rows]
                own = owned_masks[d]
                loc = np.zeros(s.n_rows)
                np.add.at(loc, s.indices[own] - r0, w[own])
                own_sum[d] = loc
                if (~own).any():
                    gids = s.indices[~own]
                    gsum = np.zeros(halo_cols[d].shape[0])
                    np.add.at(gsum, np.searchsorted(halo_cols[d], gids),
                              w[~own])
                    contribs[d] = (halo_cols[d], gsum)
            pushed = _ghost_push(sm, contribs)
            for d in sm.devs:
                c = own_sum[d] + pushed[d]
                dr[d] = 1.0 / np.sqrt(np.sqrt(np.where(c == 0, 1.0, c)))
        if name == "NBINORMALIZATION":
            s_max = max((max(dl[d].max(initial=0.0),
                             dr[d].max(initial=0.0)) for d in sm.devs),
                        default=0.0)
            s_max = _mh_scalar(sm.is_partial, float(s_max))
            if s_max > 0:
                dl = {d: dl[d] / s_max for d in sm.devs}
                dr = {d: dr[d] / s_max for d in sm.devs}
    else:
        raise ValueError(f"Unknown scaler '{name}'")

    # rewrite A <- Dl A Dr in place (ghost Dr via one more exchange)
    ghosts = _ghost_pull(
        sm, [None if sm.shards[d] is None else dr[d]
             for d in range(sm.n_dev)], halo_cols)
    for d in sm.devs:
        s = sm.shards[d]
        rows = np.repeat(np.arange(s.n_rows, dtype=np.int64), s.row_nnz())
        scale = dl[d][rows] * col_vec(d, dr[d], ghosts[d])
        if s.block_dim != (1, 1):
            scale = scale[:, None, None]
        s.data = s.data * scale
        if s.diag_data is not None:
            dscale = dl[d] * dr[d]
            if s.block_dim != (1, 1):
                dscale = dscale[:, None, None]
            s.diag_data = s.diag_data * dscale

    # scalar-row-space copies for the rhs/solution transforms
    dl_out = [None] * sm.n_dev
    dr_out = [None] * sm.n_dev
    for d in sm.devs:
        dl_out[d] = np.repeat(dl[d], bx) if bx > 1 else dl[d]
        dr_out[d] = np.repeat(dr[d], by) if by > 1 else dr[d]
    return DistScaler(part, dl_out, dr_out, bx)
