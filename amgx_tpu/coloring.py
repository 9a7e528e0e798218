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
    while uncolored.sum() > allowed_uncolored:
        nb_max = _row_max_of(adj, w, uncolored)
        winners = uncolored & (w > nb_max)
        if not winners.any():
            # break ties by index
            idx_w = w + np.arange(n) * 1e-18
            nb_max = _row_max_of(adj, idx_w, uncolored)
            winners = uncolored & (idx_w >= nb_max)
            if not winners.any():
                winners = uncolored.copy()
                winners[np.nonzero(uncolored)[0][1:]] = False
        if min_max_only:
            colors[winners] = c
            c += 1
        else:
            # greedy: smallest color unused among already-colored neighbors
            win_idx = np.nonzero(winners)[0]
            for i in win_idx:
                nb = adj.indices[adj.indptr[i]:adj.indptr[i + 1]]
                used = set(colors[nb][colors[nb] >= 0].tolist())
                ci = 0
                while ci in used:
                    ci += 1
                colors[i] = ci
        uncolored = colors < 0
    if allowed_uncolored and (colors < 0).any():
        colors[colors < 0] = 0 if min_max_only else colors.max() + 1
    num = int(colors.max()) + 1 if n else 1
    return MatrixColoring(colors, num)


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
