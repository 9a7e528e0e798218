"""Matrix coloring.

Replaces core/src/matrix_coloring/ (10 schemes, registry core.cu:685-694).
Coloring is pure setup-phase metadata work, so it runs host-side in
vectorized numpy; the resulting color classes drive the color-sequential
smoother sweeps on device. ``coloring_level`` 2 colors the distance-2 graph
(pattern of |A| + |A||A|) as MIN_MAX_2RING does upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

from .matrix import CSRMatrix


@dataclass
class MatrixColoring:
    colors: np.ndarray           # (n_rows,) int32
    num_colors: int
    scheme: str = ""

    def color_counts(self) -> np.ndarray:
        return np.bincount(self.colors, minlength=self.num_colors)


def _adjacency(csr: CSRMatrix, level: int = 1):
    """0/1 adjacency (no self loops) at the requested ring distance."""
    import scipy.sparse as sp
    n = csr.n_rows
    a = sp.csr_matrix((np.ones(csr.nnz), csr.indices, csr.indptr),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    a.setdiag(0)
    a.eliminate_zeros()
    a.data[:] = 1.0
    adj = a
    for _ in range(level - 1):
        adj = (adj + adj @ a).tocsr()
        adj.setdiag(0)
        adj.eliminate_zeros()
        adj.data[:] = 1.0
    return adj


def _hash_weights(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic pseudo-random per-row weights (reference uses hash
    functions so colorings are reproducible; cf. determinism_flag)."""
    x = (np.arange(n, dtype=np.uint64) + np.uint64(seed * 0x9E3779B9 + 1))
    x = (x ^ (x >> np.uint64(16))) * np.uint64(0x45d9f3b3335b369)
    x = (x ^ (x >> np.uint64(32))) * np.uint64(0x119de1f3c8b9a3f)
    x = x ^ (x >> np.uint64(16))
    return x.astype(np.float64) / float(2**64)


def _row_max_of(adj, values: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-row max of values[j] over adjacent j with mask[j]; -inf if none."""
    vals = np.where(mask[adj.indices], values[adj.indices], -np.inf)
    out = np.full(adj.shape[0], -np.inf)
    rows_nnz = np.diff(adj.indptr)
    nz = rows_nnz > 0
    if vals.size:
        red = np.maximum.reduceat(vals, adj.indptr[:-1][nz])
        out[nz] = red
    return out


def _jones_plassmann(csr: CSRMatrix, level: int, min_max_only: bool,
                     seed: int = 0, max_uncolored: float = 0.0
                     ) -> MatrixColoring:
    """Jones-Plassmann / min-max independent-set coloring.

    min_max_only=True: one color per outer round (MIN_MAX scheme).
    False: greedy smallest-available color (PARALLEL_GREEDY scheme).
    """
    adj = _adjacency(csr, level)
    n = csr.n_rows
    w = _hash_weights(n, seed)
    colors = np.full(n, -1, np.int32)
    uncolored = colors < 0
    c = 0
    allowed_uncolored = int(max_uncolored * n)
    # live edge set (both endpoints uncolored), row-major order; edges die
    # for good once an endpoint is colored, so per-round cost decays
    # geometrically instead of re-scanning the full adjacency each color
    idx_w = w + np.arange(n) * 1e-18
    round_of = None
    from .native import lib as _nl
    nl = _nl()
    if nl is not None and n:
        # closed form: processing nodes by descending weight, round(i) =
        # 1 + max round of higher-weight neighbours — one O(nnz) pass in
        # the native kernel instead of per-round frontier scans
        order_desc = np.argsort(-idx_w, kind="stable")
        round_of = nl.jp_rounds(adj.indptr, adj.indices, order_desc)
        if round_of is not None and allowed_uncolored:
            # emulate the iterative early stop: the loop leaves the last
            # <= allowed nodes (those in the highest rounds) uncolored
            counts = np.bincount(round_of)
            suffix = counts[::-1].cumsum()[::-1]
            cut = np.nonzero(suffix <= allowed_uncolored)[0]
            if cut.size:
                round_of = np.where(round_of >= cut[0], -1, round_of)
    if round_of is None:
        # numpy fallback: round-parallel JP over a shrinking live-edge set
        round_of = np.full(n, -1, np.int64)
        rs = np.repeat(np.arange(n), np.diff(adj.indptr))
        cs = adj.indices.copy()
        act = np.arange(n)               # uncolored node ids, sorted

        def _live_row_max(values):
            out = np.full(act.size, -np.inf)
            if rs.size:
                first = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
                out[np.searchsorted(act, rs[first])] = \
                    np.maximum.reduceat(values[cs], first)
            return out

        while act.size > allowed_uncolored:
            nb_max = _live_row_max(w)
            win_act = w[act] > nb_max
            if not win_act.any():
                # break ties by index
                nb_max = _live_row_max(idx_w)
                win_act = idx_w[act] >= nb_max
                if not win_act.any():
                    win_act[0] = True
            win_idx = act[win_act]
            round_of[win_idx] = c
            c += 1
            uncolored[win_idx] = False
            act = act[~win_act]
            if rs.size:
                live = uncolored[rs] & uncolored[cs]
                rs, cs = rs[live], cs[live]
    if min_max_only:
        # MIN_MAX: one color per JP round
        colors = round_of.astype(np.int32)
        if allowed_uncolored and (colors < 0).any():
            colors[colors < 0] = 0
    else:
        # PARALLEL_GREEDY: smallest available color, processed round-major.
        # Winners of one round are mutually non-adjacent, so a sequential
        # greedy pass in (round, index) order produces the identical
        # coloring to the round-parallel assignment; the pass runs in the
        # native C++ kernel when built.
        won = round_of >= 0
        order = np.flatnonzero(won)[
            np.argsort(round_of[won], kind="stable")]
        if nl is not None and order.size:
            colors, _ = _native_greedy(nl, adj, order, n)
        else:
            colors = np.full(n, -1, np.int32)
            for i in order:
                nb = adj.indices[adj.indptr[i]:adj.indptr[i + 1]]
                used = set(colors[nb][colors[nb] >= 0].tolist())
                ci = 0
                while ci in used:
                    ci += 1
                colors[i] = ci
        if allowed_uncolored and (colors < 0).any():
            colors[colors < 0] = colors.max() + 1
    num = int(colors.max()) + 1 if n else 1
    return MatrixColoring(colors, num)


def _native_greedy(nl, adj, order, n):
    """Native sequential greedy coloring over `order`; uncolored nodes
    (not in order) keep -1 only if order is partial — the kernel colors
    exactly the given order."""
    indptr = np.ascontiguousarray(adj.indptr, np.int64)
    indices = np.ascontiguousarray(adj.indices, np.int32)
    if order.size < n:
        # kernel colors every row in `order`; pad by appending the rest so
        # array shapes line up, then reset the padded entries
        rest = np.setdiff1d(np.arange(n), order)
        colors, num = nl.greedy_color(indptr, indices,
                                      np.concatenate([order, rest]))
        colors = np.asarray(colors, np.int32)
        colors[rest] = -1
        return colors, num
    colors, num = nl.greedy_color(indptr, indices, order)
    return np.asarray(colors, np.int32), num


def _serial_greedy_bfs(csr: CSRMatrix, level: int) -> MatrixColoring:
    """Greedy coloring in BFS order; the per-node greedy pass runs in the
    native C++ kernel when built (csrc/amgx_host.cpp greedy_color)."""
    import scipy.sparse.csgraph as csgraph
    adj = _adjacency(csr, level)
    n = csr.n_rows
    # BFS order over all components
    seen = np.zeros(n, bool)
    order_parts = []
    for start in range(n):
        if seen[start]:
            continue
        nodes = csgraph.breadth_first_order(adj, start,
                                            return_predecessors=False)
        seen[nodes] = True
        order_parts.append(nodes)
    order = np.concatenate(order_parts) if order_parts else \
        np.arange(n, dtype=np.int64)
    from . import native
    lib = native.lib()
    if lib is not None:
        colors, num = lib.greedy_color(adj.indptr, adj.indices, order)
        return MatrixColoring(colors.astype(np.int32), max(1, num))
    colors = np.full(n, -1, np.int32)
    for i in order:
        nb = adj.indices[adj.indptr[i]:adj.indptr[i + 1]]
        used = set(colors[nb][colors[nb] >= 0].tolist())
        ci = 0
        while ci in used:
            ci += 1
        colors[i] = ci
    return MatrixColoring(colors, int(colors.max()) + 1 if n else 1)


def _multi_hash(csr: CSRMatrix, level: int, num_hashes: int = 4
                ) -> MatrixColoring:
    """Min-max over several hash functions per round (MULTI_HASH)."""
    adj = _adjacency(csr, level)
    n = csr.n_rows
    colors = np.full(n, -1, np.int32)
    c = 0
    uncolored = colors < 0
    while uncolored.any():
        for h in range(num_hashes):
            w = _hash_weights(n, seed=c * num_hashes + h + 1)
            nb_max = _row_max_of(adj, w, uncolored)
            winners = uncolored & (w > nb_max)
            colors[winners] = c
            uncolored = colors < 0
            c += 1
            if not uncolored.any():
                break
        # guarantee progress
        if uncolored.any():
            i = np.nonzero(uncolored)[0][0]
            colors[i] = c
            uncolored = colors < 0
    return MatrixColoring(colors, int(colors.max()) + 1 if n else 1)


def _round_robin(csr: CSRMatrix, num_colors: int) -> MatrixColoring:
    colors = (np.arange(csr.n_rows) % max(1, num_colors)).astype(np.int32)
    return MatrixColoring(colors, max(1, num_colors))


def _uniform(csr: CSRMatrix, num_colors: int) -> MatrixColoring:
    w = _hash_weights(csr.n_rows, 7)
    colors = (w * max(1, num_colors)).astype(np.int32)
    return MatrixColoring(colors, max(1, num_colors))


def _greedy_recolor(csr: CSRMatrix, level: int) -> MatrixColoring:
    """Greedy coloring followed by a recoloring pass that tries to move rows
    out of the highest colors (GREEDY_RECOLOR)."""
    base = _jones_plassmann(csr, level, min_max_only=False)
    adj = _adjacency(csr, level)
    colors = base.colors.copy()
    for c in range(base.num_colors - 1, 0, -1):
        for i in np.nonzero(colors == c)[0]:
            nb = adj.indices[adj.indptr[i]:adj.indptr[i + 1]]
            used = set(colors[nb].tolist())
            for lower in range(c):
                if lower not in used:
                    colors[i] = lower
                    break
    num = int(colors.max()) + 1 if csr.n_rows else 1
    return MatrixColoring(colors, num)


def _locally_downwind(csr: CSRMatrix) -> MatrixColoring:
    """LOCALLY_DOWNWIND: order rows along the dominant off-diagonal flow
    direction; approximated by greedy coloring in descending row-coupling
    order."""
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    off = csr.indices != rows
    strength = np.zeros(csr.n_rows)
    np.add.at(strength, rows[off], np.abs(csr.data[off]).ravel()
              if csr.data.ndim == 1 else np.abs(csr.data[off]).sum(
                  axis=tuple(range(1, csr.data.ndim))))
    order = np.argsort(-strength, kind="stable")
    adj = _adjacency(csr, 1)
    colors = np.full(csr.n_rows, -1, np.int32)
    for i in order:
        nb = adj.indices[adj.indptr[i]:adj.indptr[i + 1]]
        used = set(colors[nb][colors[nb] >= 0].tolist())
        ci = 0
        while ci in used:
            ci += 1
        colors[i] = ci
    return MatrixColoring(colors, int(colors.max()) + 1 if csr.n_rows else 1)


def color_matrix(csr: CSRMatrix, scheme: str = "PARALLEL_GREEDY",
                 cfg=None, scope: str = "default") -> MatrixColoring:
    """Factory entry point (reference: MatrixColoringFactory,
    core.cu:685-694)."""
    level = cfg.get("coloring_level", scope) if cfg is not None else 1
    max_unc = cfg.get("max_uncolored_percentage", scope) if cfg is not None \
        else 0.0
    num_colors = cfg.get("num_colors", scope) if cfg is not None else 10
    if level == 0:
        out = MatrixColoring(np.zeros(csr.n_rows, np.int32), 1, scheme)
        return out
    if scheme == "MIN_MAX":
        out = _jones_plassmann(csr, level, True)
    elif scheme == "MIN_MAX_2RING":
        out = _jones_plassmann(csr, max(level, 2), True)
    elif scheme == "GREEDY_MIN_MAX_2RING":
        out = _jones_plassmann(csr, max(level, 2), False)
    elif scheme == "PARALLEL_GREEDY":
        out = _jones_plassmann(csr, level, False, max_uncolored=0.0)
    elif scheme == "SERIAL_GREEDY_BFS":
        out = _serial_greedy_bfs(csr, level)
    elif scheme == "GREEDY_RECOLOR":
        out = _greedy_recolor(csr, level)
    elif scheme == "MULTI_HASH":
        out = _multi_hash(csr, level)
    elif scheme == "ROUND_ROBIN":
        out = _round_robin(csr, num_colors)
    elif scheme == "UNIFORM":
        out = _uniform(csr, num_colors)
    elif scheme == "LOCALLY_DOWNWIND":
        out = _locally_downwind(csr)
    else:
        raise ValueError(f"Unknown coloring scheme '{scheme}'")
    out.scheme = scheme
    return out


def is_valid_coloring(csr: CSRMatrix, coloring: MatrixColoring,
                      level: int = 1) -> bool:
    """No two adjacent rows share a color (test helper; reference:
    core/tests/valid_coloring.cu)."""
    adj = _adjacency(csr, level)
    rows = np.repeat(np.arange(csr.n_rows), np.diff(adj.indptr))
    return not np.any(coloring.colors[rows] ==
                      coloring.colors[adj.indices])
