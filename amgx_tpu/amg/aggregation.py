"""Aggregation (unsmoothed) coarsening.

References: core/src/aggregation/selectors/ (SIZE_2/4/8 parallel pairwise
matching with handshaking, MULTI_PAIRWISE with Notay weights, greedy/adaptive
variants) and core/src/aggregation/aggregation_amg_level.cu (R from aggregate
maps :282, Ac via coarse-A generators :2336).

Selectors are setup-phase graph algorithms -> vectorized host numpy. The
handshake matching mirrors size2_selector.cu: every unaggregated node points
at its strongest unaggregated neighbour; mutual pairs merge; repeat
max_matching_iterations or until max_unassigned_percentage remain, then
singletons merge into their strongest neighbour aggregate (merge_singletons).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..matrix import CSRMatrix


def _edge_weights(csr: CSRMatrix, formula: int = 0,
                  component: int = 0) -> np.ndarray:
    """Symmetric positive matching weights per stored entry.

    formula 0: w_ij = 0.5*(|a_ij| + |a_ji|)  (reference default)
    formula 1: Notay: w_ij = -0.5*(a_ij + a_ji)/max(|a_ii|,|a_jj|)
    For block matrices the (component,component) entry is used
    (aggregation_edge_weight_component).
    """
    import scipy.sparse as sp
    n = csr.n_rows
    data = csr.data
    if csr.block_dim != (1, 1):
        data = data[:, component, component]
    a = sp.csr_matrix((np.abs(data) if formula == 0 else data,
                       csr.indices, csr.indptr), shape=(n, csr.n_cols))
    a = a[:, :n].tocsr()
    at = a.T.tocsr()
    if formula == 0:
        w = 0.5 * (a + at)
    else:
        d = np.abs(a.diagonal())
        d = np.where(d == 0, 1.0, d)
        w = (a + at) * (-0.5)
        dinv = sp.diags(1.0 / np.sqrt(d))
        w = dinv @ w @ dinv
    w = w.tocsr()
    if np.iscomplexobj(w.data):
        # matching weights are real by definition (reference: Notay weights
        # on Hermitian operators); match on the real part for complex
        # modes — BEFORE zero elimination, so purely-imaginary couplings
        # drop out instead of surviving as zero-weight edges
        w.data = np.ascontiguousarray(w.data.real)
    w.setdiag(0)
    w.eliminate_zeros()
    return w


def _hash_tiebreak(n: int, seed: int) -> np.ndarray:
    x = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
         + np.uint64(seed + 1))
    x ^= x >> np.uint64(13)
    x *= np.uint64(0x2545F4914F6CDD1D)
    x ^= x >> np.uint64(35)
    return (x.astype(np.float64) / 2**64) * 1e-9


def pairwise_match(w, max_iters: int = 15, max_unassigned: float = 0.05,
                   deterministic: bool = False, seed: int = 0
                   ) -> np.ndarray:
    """One round of handshake pairwise matching on weight graph w (csr).
    Returns aggregate ids (consecutive) of size n; every node assigned."""
    n = w.shape[0]
    agg = np.full(n, -1, np.int64)
    next_id = 0
    indptr, indices, data = w.indptr, w.indices, w.data
    tie = _hash_tiebreak(n, seed)
    vals = np.asarray(data, np.float64) + tie[indices]  # det. tiebreak
    from ..native import lib as _native_lib
    nl = _native_lib()
    if nl is not None:
        out = nl.pairwise_match(indptr, indices, vals, max_iters,
                                max_unassigned)
        if out is not None:
            return out[0]
    rows = np.repeat(np.arange(n), np.diff(indptr))
    # edge weights never change across handshake iterations — only the
    # unaggregated mask does. Sort edges once (rows ascending, weights
    # descending; lexsort is stable so ties keep storage order) and do an
    # O(nnz) masked first-per-row scan each iteration.
    order = np.lexsort((-vals, rows))
    rs, cs = rows[order], indices[order]
    for it in range(max_iters):
        un = agg < 0
        n_un = int(un.sum())
        if n_un == 0 or n_un <= max_unassigned * n:
            break
        # strongest unaggregated neighbour per unaggregated node: first
        # surviving edge per row in the presorted order. Aggregated nodes
        # never come back, so dead edges are dropped for good — the scan
        # shrinks geometrically with the matching.
        cand = np.full(n, -1, np.int64)
        ok = un[rs] & un[cs]
        if not ok.any():
            break
        rs, cs = rs[ok], cs[ok]
        first = np.flatnonzero(
            np.r_[True, rs[1:] != rs[:-1]])
        cand[rs[first]] = cs[first]
        # handshake: i and j pick each other
        i_idx = np.nonzero(cand >= 0)[0]
        j_idx = cand[i_idx]
        mutual = cand[j_idx] == i_idx
        pi, pj = i_idx[mutual], j_idx[mutual]
        keep = pi < pj
        pi, pj = pi[keep], pj[keep]
        if pi.size == 0:
            # no progress: aggregate remaining greedily
            break
        ids = next_id + np.arange(pi.size)
        agg[pi] = ids
        agg[pj] = ids
        next_id += pi.size
    # leftovers become singletons (merged later by merge_singletons)
    un = np.nonzero(agg < 0)[0]
    agg[un] = next_id + np.arange(un.size)
    return agg


def merge_singletons(w, agg: np.ndarray, singleton_ids: np.ndarray
                     ) -> np.ndarray:
    """Merge singleton aggregates into the strongest neighbouring aggregate
    (reference: merge_singletons parameter, size2_selector.cu)."""
    n = w.shape[0]
    sizes = np.bincount(agg)
    is_single = sizes[agg] == 1
    indptr, indices, data = w.indptr, w.indices, w.data
    # strongest neighbour per singleton row, vectorized: slice out only
    # the singleton rows' edges (few after matching), sort those by
    # (row, weight desc) — stable, so ties resolve to the first stored
    # entry exactly like np.argmax — and take the first edge per row.
    sing = np.flatnonzero(is_single)
    cnt = (indptr[sing + 1] - indptr[sing]).astype(np.int64)
    tot = int(cnt.sum())
    if tot:
        ptr = np.concatenate([[0], np.cumsum(cnt)])
        pos = (np.arange(tot) - np.repeat(ptr[:-1], cnt)
               + np.repeat(indptr[sing], cnt))
        rsel = np.repeat(sing, cnt)
        csel, dsel = indices[pos], data[pos]
        order = np.lexsort((-dsel, rsel))
        rsel, csel = rsel[order], csel[order]
        first = np.flatnonzero(np.r_[True, rsel[1:] != rsel[:-1]])
        # resolve singleton->singleton hops (incl. mutual-best pairs, which
        # a simultaneous assignment would merely swap) by pointer jumping:
        # follow each singleton's strongest edge until a non-singleton row
        # or a collapsed 2-cycle representative (min id) is reached
        n_all = agg.shape[0]
        target = np.arange(n_all)
        target[rsel[first]] = csel[first]
        for _ in range(64):
            t2 = target[target]
            cyc = (t2 == np.arange(n_all)) & (target != np.arange(n_all))
            if cyc.any():
                target[cyc] = np.minimum(np.arange(n_all)[cyc], target[cyc])
                t2 = target[target]
            if np.array_equal(t2, target):
                break
            target = t2
        else:
            # non-converging (>2-cycles from exact weight ties): those rows
            # stay singletons rather than looping
            bad = target[target] != target
            target[bad] = np.arange(n_all)[bad]
        agg = agg[target]
    return _compact(agg)[0]


def _compact(agg: np.ndarray) -> Tuple[np.ndarray, int]:
    """Renumber aggregates by first appearance in fine order: the coarse
    numbering inherits the fine grid's locality, so coarse operators stay
    banded without any reordering (the TPU band/DIA layouts depend on it)."""
    uniq, first, inv = np.unique(agg, return_index=True,
                                 return_inverse=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty(uniq.size, np.int64)
    rank[order] = np.arange(uniq.size)
    return rank[inv].astype(np.int64), uniq.size


def select_aggregates(csr: CSRMatrix, selector: str, cfg, scope: str
                      ) -> Tuple[np.ndarray, int]:
    """Dispatch to the aggregation selector; returns (agg map, n_aggregates).

    Reference registry names: SIZE_2, SIZE_4, SIZE_8, MULTI_PAIRWISE,
    PARALLEL_GREEDY_SELECTOR, SERIAL_GREEDY_BFS, ADAPTIVE, GEO, DUMMY
    (core.cu:643-683).
    """
    g = lambda k: cfg.get(k, scope)
    max_it = g("max_matching_iterations")
    max_un = g("max_unassigned_percentage")
    comp = g("aggregation_edge_weight_component")
    formula = g("weight_formula")
    det = bool(g("determinism_flag")) or bool(g("serial_matching"))
    do_merge = int(g("merge_singletons"))

    if selector == "DUMMY":
        # everything in one aggregate per node (identity coarsening disabled)
        return np.arange(csr.n_rows, dtype=np.int64), csr.n_rows

    if selector in ("SIZE_2", "SIZE_4", "SIZE_8", "MULTI_PAIRWISE"):
        if selector == "MULTI_PAIRWISE":
            # reference: each pass about doubles the aggregate size
            # (aggregation_passes, core.cu:492); Notay weight formula
            formula = 1
            rounds = max(1, int(g("aggregation_passes")))
        else:
            rounds = {"SIZE_2": 1, "SIZE_4": 2, "SIZE_8": 3}[selector]
        w = _edge_weights(csr, formula=formula, component=comp)
        agg = pairwise_match(w, max_it, max_un, det, seed=0)
        if do_merge:
            agg = merge_singletons(w, agg, agg)
        agg, nc = _compact(agg)
        work = csr
        for r in range(1, rounds):
            # coarse weight graph: W_c = Q^T W Q via coo accumulation
            from ..ops.spgemm import aggregation_galerkin
            work = aggregation_galerkin(_as_scalar(work), agg, nc)
            w2 = _edge_weights(work, formula=formula)
            agg2 = pairwise_match(w2, max_it, max_un, det, seed=r)
            if do_merge:
                agg2 = merge_singletons(w2, agg2, agg2)
            agg2, nc = _compact(agg2)
            agg = agg2[agg]
        return agg, nc

    if selector == "ADAPTIVE":
        # adaptive aggregation (selectors/adaptive.cu): edge weights from a
        # relaxed test vector e (algebraically smooth error), so aggregates
        # follow the near-nullspace: w_ij ~ |e_i a_ij e_j|
        import scipy.sparse as sp
        n = csr.n_rows
        data = csr.data if csr.block_dim == (1, 1) else \
            csr.data[:, comp, comp]
        a = sp.csr_matrix((data, csr.indices, csr.indptr),
                          shape=(n, csr.n_cols))[:, :n].tocsr()
        d = a.diagonal()
        d = np.where(d == 0, 1.0, d)
        rng = np.random.default_rng(5)
        e = rng.random(n)
        for _ in range(6):
            e = e - 0.7 * (a @ e) / d
        w = a.copy()
        rows = np.repeat(np.arange(n), np.diff(a.indptr))
        w.data = np.abs(e[rows] * a.data * e[a.indices])
        w = 0.5 * (w + w.T).tocsr()
        w.setdiag(0)
        w.eliminate_zeros()
        agg = pairwise_match(w, max_it, max_un, det, seed=0)
        if do_merge:
            agg = merge_singletons(w, agg, agg)
        return _compact(agg)

    if selector == "SERIAL_GREEDY_BFS":
        # deterministic serial BFS walk (serial_greedy_bfs.cu)
        return _greedy_aggregate(csr, target=4)

    if selector == "PARALLEL_GREEDY_SELECTOR":
        return _parallel_greedy_aggregate(csr, det)

    if selector == "GEO":
        # geometric aggregation (geo_selector.cu): blocks of the point
        # cloud when coordinates are attached (Matrix aux "geo.coords"),
        # structural greedy walk otherwise
        coords = csr.aux.get("geo.coords")
        if coords is not None:
            return _geo_aggregate(np.asarray(coords))
        return _greedy_aggregate(csr, target=4)

    raise ValueError(f"Unknown aggregation selector '{selector}'")


def _as_scalar(csr: CSRMatrix) -> CSRMatrix:
    if csr.block_dim == (1, 1):
        return csr
    return CSRMatrix(csr.n_rows, csr.n_cols, csr.indptr, csr.indices,
                     csr.data[:, 0, 0])


def _parallel_greedy_aggregate(csr: CSRMatrix, det: bool = False
                               ) -> Tuple[np.ndarray, int]:
    """MIS-rooted parallel aggregation (parallel_greedy_selector.cu):
    rounds of (a) Luby-style maximal independent set over unaggregated
    nodes by hashed priority, (b) roots open aggregates, (c) unaggregated
    neighbors join their strongest adjacent aggregate. Fully vectorized —
    each round is a data-parallel sweep, matching the reference's
    GPU-parallel structure (deterministic: priorities are a pure hash)."""
    import scipy.sparse as sp
    n = csr.n_rows
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    a = sp.csr_matrix((np.abs(data), csr.indices, csr.indptr),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    a.setdiag(0)
    a.eliminate_zeros()
    adj = a.tocsr()
    agg = np.full(n, -1, np.int64)
    next_id = 0
    # deterministic node priorities (hash), ties broken by index
    pri = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
           % np.uint64(2 ** 31)).astype(np.int64)
    rows = np.repeat(np.arange(n), np.diff(adj.indptr))
    cols = adj.indices
    for _ in range(64):
        un = agg < 0
        if not un.any():
            break
        # (a) MIS on the unaggregated subgraph: a node is a root iff no
        # unaggregated neighbor has higher (pri, idx)
        edge = un[rows] & un[cols]
        better = np.zeros(n, bool)
        er, ec = rows[edge], cols[edge]
        nb_wins = (pri[ec] > pri[er]) | ((pri[ec] == pri[er]) & (ec > er))
        np.logical_or.at(better, er, nb_wins)
        roots = un & ~better
        if not roots.any():
            roots = un        # isolated leftovers become singletons
        ids = np.cumsum(roots) - 1
        agg[roots] = next_id + ids[roots]
        next_id += int(roots.sum())
        # (b) unaggregated nodes join the strongest aggregated neighbor
        # whose aggregate still has room (size cap keeps hubs in check)
        un = agg < 0
        if not un.any():
            break
        sizes = np.bincount(agg[agg >= 0], minlength=next_id)
        e2 = un[rows] & (agg[cols] >= 0)
        e2[e2] = sizes[agg[cols[e2]]] < 8
        if e2.any():
            er, ec, ew = rows[e2], cols[e2], adj.data[e2]
            best = np.full(n, -1.0)
            np.maximum.at(best, er, ew)
            pick = e2.copy()
            pick[e2] = ew >= best[er] - 1e-300
            # first best edge per row wins (deterministic)
            pr, pc = rows[pick], cols[pick]
            first = np.full(n, -1, np.int64)
            upr, fidx = np.unique(pr, return_index=True)  # rows are sorted
            first[upr] = pc[fidx]
            jr = np.nonzero((first >= 0) & un)[0]
            if jr.size:
                # admit at most (cap - size) joiners per aggregate this
                # round, lowest row index first (deterministic)
                tg = agg[first[jr]]
                order = np.argsort(tg, kind="stable")
                jr_s, tg_s = jr[order], tg[order]
                uniq, start = np.unique(tg_s, return_index=True)
                rank = np.arange(jr_s.size) - \
                    start[np.searchsorted(uniq, tg_s)]
                ok = rank < (8 - sizes[tg_s])
                agg[jr_s[ok]] = tg_s[ok]
    # leftovers (no aggregated neighbor at all): singletons
    left = agg < 0
    if left.any():
        agg[left] = next_id + np.arange(int(left.sum()))
        next_id += int(left.sum())
    return _compact(agg)


def _geo_aggregate(coords: np.ndarray, target: int = 8
                   ) -> Tuple[np.ndarray, int]:
    """Geometric aggregation from point coordinates (geo_selector.cu):
    uniform spatial blocks sized so aggregates hold ~``target`` points."""
    coords = np.atleast_2d(np.asarray(coords, np.float64))
    if coords.shape[0] < coords.shape[1]:
        coords = coords.T
    n, d = coords.shape
    blocks = max(1, int(round((n / target) ** (1.0 / d))))
    lo = coords.min(axis=0)
    ptp = coords.max(axis=0) - lo
    span = np.where(ptp == 0, 1.0, ptp)
    cell = np.minimum(((coords - lo) / span * blocks).astype(np.int64),
                      blocks - 1)
    key = cell[:, 0]
    for k in range(1, d):
        key = key * blocks + cell[:, k]
    return _compact(key)


def _greedy_aggregate(csr: CSRMatrix, target: int = 4
                      ) -> Tuple[np.ndarray, int]:
    n = csr.n_rows
    agg = np.full(n, -1, np.int64)
    next_id = 0
    indptr, indices = csr.indptr, csr.indices
    for i in range(n):
        if agg[i] >= 0:
            continue
        members = [i]
        for j in indices[indptr[i]:indptr[i + 1]]:
            if j < n and agg[j] < 0 and j != i and len(members) < target:
                members.append(int(j))
        for m in members:
            agg[m] = next_id
        next_id += 1
    return agg, next_id


def build_p_r(agg: np.ndarray, n_coarse: int, dtype=np.float64
              ) -> Tuple[CSRMatrix, CSRMatrix]:
    """Piecewise-constant prolongation P (n x nc) and restriction R = P^T
    (reference: computeRestrictionOperator_common,
    aggregation_amg_level.cu:282)."""
    n = agg.shape[0]
    keep = agg >= 0
    p = CSRMatrix.from_coo(n, n_coarse, np.arange(n)[keep], agg[keep],
                           np.ones(int(keep.sum()), dtype=dtype))
    r = p.transpose()
    return p, r
