"""Classical (Ruge-Stueben) coarsening: strength, C/F selectors,
interpolation, truncation.

References: core/src/classical/strength/ (AHAT/ALL/AFFINITY),
core/src/classical/selectors/ (PMIS, HMIS, aggressive variants, CR),
core/src/classical/interpolators/ (D1 distance-1, D2 distance-2, MULTIPASS),
truncation base/src/truncate.cu, level driver
core/src/classical/classical_amg_level.cu:372-470.

All of this is setup-phase metadata work -> vectorized host numpy/scipy.
The cf_map convention matches the reference: cf_map[i] >= 0 gives the coarse
index of a C point, -1 marks F points.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..matrix import CSRMatrix

FINE = -1
COARSE_TAG = 1
UNDECIDED = 0


# ---------------------------------------------------------------------------
# strength of connection
# ---------------------------------------------------------------------------

def _segment_max(vals: np.ndarray, indptr: np.ndarray, fill):
    """Per-row max over CSR-ordered entries (np.maximum.at is unbuffered
    and ~20x slower; rows are contiguous in CSR order so reduceat works)."""
    n = len(indptr) - 1
    out = np.full(n, fill, dtype=np.result_type(vals, np.float64))
    if vals.size == 0 or n == 0:
        return out
    starts = indptr[:-1]
    valid = starts < indptr[1:]
    red = np.maximum.reduceat(vals, np.minimum(starts, vals.size - 1))
    out[valid] = red[valid]
    return out


def strong_connections(csr: CSRMatrix, strength: str = "AHAT",
                       theta: float = 0.25,
                       max_row_sum: float = 1.1,
                       affinity_iters: int = 4,
                       affinity_vectors: int = 4,
                       seed: int = 0) -> "np.ndarray":
    """Boolean mask (per stored entry) of strong connections.

    AHAT (classic): entry (i,j) is strong when
        -a_ij >= theta * max_k(-a_ik)   (sign-aware; for rows whose diagonal
    is negative the test flips, matching computeStrongConnectionsAndWeights,
    strength/ahat.cu). Rows with |row_sum|/|a_ii| > max_row_sum are treated
    as having no strong connections (weakly coupled; max_row_sum knob).
    ALL: every off-diagonal is strong.
    AFFINITY: smoothing-based test vectors; entries whose affinity
        |<x_i, x_j>|^2 / (<x_i,x_i><x_j,x_j>) exceeds theta are strong.
    """
    n = csr.n_rows
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    rows = np.repeat(np.arange(n), csr.row_nnz())
    offdiag = csr.indices != rows
    if strength == "ALL":
        return offdiag

    if strength == "AFFINITY":
        import scipy.sparse as sp
        a = sp.csr_matrix((data, csr.indices, csr.indptr),
                          shape=(n, csr.n_cols))[:, :n]
        d = a.diagonal()
        d = np.where(d == 0, 1.0, d)
        rng = np.random.default_rng(seed)
        x = rng.random((n, affinity_vectors)) * 2 - 1
        dinv = sp.diags(1.0 / d)
        for _ in range(affinity_iters):
            x = x - 0.5 * (dinv @ (a @ x))
        xi = x[rows]
        xj = x[csr.indices.astype(np.int64)]
        num = (xi * xj).sum(axis=1) ** 2
        den = (xi * xi).sum(axis=1) * (xj * xj).sum(axis=1)
        den = np.where(den == 0, 1.0, den)
        return offdiag & (num / den >= theta * theta)

    if strength != "AHAT":
        raise ValueError(f"Unknown strength '{strength}'")

    diag = np.zeros(n)
    dmask = csr.indices == rows
    diag[rows[dmask]] = data[dmask]
    if csr.diag_data is not None:
        dd = csr.diag_data if csr.block_dim == (1, 1) else \
            csr.diag_data[:, 0, 0]
        diag = diag + dd
    sign = np.where(diag < 0, -1.0, 1.0)
    # candidate value: -sign(diag)*a_ij for off-diagonals
    cand = -sign[rows] * data
    cand = np.where(offdiag, cand, -np.inf)
    row_max = _segment_max(cand, csr.indptr, -np.inf)
    # weakly-coupled rows: |sum_j a_ij| / |a_ii| > max_row_sum -> no strong
    row_sum = np.bincount(rows, weights=data, minlength=n)[:n]
    if csr.diag_data is not None:
        row_sum += dd
    weak_row = np.abs(row_sum) > max_row_sum * np.maximum(np.abs(diag),
                                                          1e-300)
    strong = offdiag & (cand >= theta * np.where(row_max[rows] > 0,
                                                 row_max[rows], np.inf)) \
        & (cand > 0)
    strong &= ~weak_row[rows]
    return strong


def _strength_graph(csr: CSRMatrix, strong: np.ndarray):
    """Symmetrized strength graph S (csr, 0/1) over owned rows."""
    import scipy.sparse as sp
    n = csr.n_rows
    rows = np.repeat(np.arange(n), csr.row_nnz())
    s = sp.csr_matrix((strong.astype(np.float64), (rows, csr.indices)),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    return s


# ---------------------------------------------------------------------------
# C/F selectors
# ---------------------------------------------------------------------------

def pmis_select(csr: CSRMatrix, strong: np.ndarray, seed: int = 0,
                deterministic: bool = True,
                aggressive: bool = False) -> np.ndarray:
    """PMIS C/F splitting (selectors/pmis.cu): distance-2 independent set on
    the symmetrized strength graph with weights = strong-transpose degree +
    pseudo-random tiebreak. Returns cf_map: coarse index >= 0 for C, -1 F.

    aggressive=True runs PMIS on the distance-2 strength graph (S@S pattern),
    giving the sparser C set of AGGRESSIVE_PMIS.
    """
    s = _strength_graph(csr, strong)
    st = s.T.tocsr()
    sym = (s + st).tocsr()
    sym.data[:] = 1.0
    if aggressive:
        sym = (sym @ sym + sym).tocsr()
        sym.setdiag(0)
        sym.eliminate_zeros()
        sym.data[:] = 1.0
    n = csr.n_rows
    # weight: number of points strongly influenced by i (column count in S)
    lam = np.asarray(st.sum(axis=1)).ravel()
    rng_w = _pmis_hash(n, seed)
    w = lam + rng_w
    state = np.zeros(n, np.int8)         # 0 undecided, 1 C, -1 F
    # points with no strong connections at all become F immediately
    isolated = (np.asarray(sym.sum(axis=1)).ravel() == 0)
    state[isolated & (lam == 0)] = -1
    indptr, indices = sym.indptr, sym.indices
    from ..native import lib as _nl
    nl = _nl()
    if nl is not None and getattr(nl, "_has_pmis", False):
        # one O(nnz) native sweep: the fixed-priority greedy MIS equals
        # the round-parallel fixpoint below (ties break by index in both:
        # stable descending sort here, first-undecided fallback there)
        order = np.argsort(-w, kind="stable")
        state = nl.priority_mis(indptr, indices, order, state)
    else:
        rows_e = np.repeat(np.arange(n), np.diff(indptr))
        und = state == 0
        while und.any():
            # local max among undecided neighbors -> C
            mask = und[rows_e] & und[indices]
            nb_max = np.full(n, -np.inf)
            if mask.any():
                np.maximum.at(nb_max, rows_e[mask], w[indices[mask]])
            winners = und & (w > nb_max)
            if not winners.any():
                winners = und.copy()
                winners[np.nonzero(und)[0][1:]] = False
            state[winners] = 1
            # undecided neighbors of new C points become F (vectorized
            # over the edge list: sym is symmetric so winner-sourced
            # edges reach them all)
            tgt = indices[winners[rows_e]]
            state[tgt[state[tgt] == 0]] = -1
            und = state == 0
    cf_map = np.full(n, FINE, np.int64)
    c_idx = np.nonzero(state == 1)[0]
    cf_map[c_idx] = np.arange(c_idx.size)
    return cf_map


def _pmis_hash(n: int, seed: int) -> np.ndarray:
    return _pmis_hash_ids(np.arange(n, dtype=np.uint64), seed)


def _pmis_hash_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    """Counter-based (stateless) hash: any slice of global ids hashes
    without materializing the full O(N) vector — the property the
    rank-local distributed PMIS depends on."""
    x = (ids.astype(np.uint64) + np.uint64(seed * 7919 + 1)) \
        * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x.astype(np.float64) / 2**64


def hmis_select(csr: CSRMatrix, strong: np.ndarray, seed: int = 0,
                aggressive: bool = False) -> np.ndarray:
    """HMIS (selectors/hmis.cu): a one-pass Ruge-Stueben sweep seeds
    C points by descending influence count, then PMIS cleans up the
    remaining undecided points.

    Pass 1 (serialized RS): visit points in order of lambda = |S^T row|
    (number of points each influences); an unvisited point becomes C and
    its strong neighbours become F. Pass 2: PMIS restricted to any points
    the sweep left untouched keeps the splitting parallel-consistent.
    """
    s = _strength_graph(csr, strong)
    st = s.T.tocsr()
    sym = (s + st).tocsr()
    n = csr.n_rows
    lam = np.asarray(st.sum(axis=1)).ravel()
    order = np.argsort(-(lam + _pmis_hash(n, seed)), kind="stable")
    state = np.zeros(n, np.int8)
    indptr, indices = sym.indptr, sym.indices
    from ..native import lib as _nl
    nl = _nl()
    if nl is not None and getattr(nl, "_has_pmis", False):
        state = nl.priority_mis(indptr, indices, order, state)
    else:
        for i in order:
            if state[i] != 0:
                continue
            state[i] = 1                      # C point
            nb = indices[indptr[i]:indptr[i + 1]]
            state[nb[state[nb] == 0]] = -1    # strong neighbours become F
    if aggressive:
        # aggressive HMIS: run the same sweep on the distance-2 graph of
        # the C points only, demoting C points that lose
        c_idx = np.nonzero(state == 1)[0]
        sub = (sym[c_idx][:, c_idx] + (sym @ sym)[c_idx][:, c_idx]).tocsr()
        sub.setdiag(0)
        sub.eliminate_zeros()
        lam_c = np.asarray(sub.sum(axis=1)).ravel()
        order_c = np.argsort(-(lam_c + _pmis_hash(len(c_idx), seed + 3)),
                             kind="stable")
        keep = np.zeros(len(c_idx), np.int8)
        if nl is not None and getattr(nl, "_has_pmis", False):
            keep = nl.priority_mis(sub.indptr, sub.indices, order_c, keep)
        else:
            for ii in order_c:
                if keep[ii] != 0:
                    continue
                keep[ii] = 1
                nb = sub.indices[sub.indptr[ii]:sub.indptr[ii + 1]]
                keep[nb[keep[nb] == 0]] = -1
        state[c_idx[keep != 1]] = -1
    cf_map = np.full(n, FINE, np.int64)
    c_idx = np.nonzero(state == 1)[0]
    cf_map[c_idx] = np.arange(c_idx.size)
    return cf_map


def cr_select(csr: CSRMatrix, strong: np.ndarray, sweeps: int = 5,
              theta_cr: float = 0.7) -> np.ndarray:
    """Compatible-relaxation selector (selectors/cr.cu): run Jacobi
    relaxation on A e = 0 from random e; slow-to-converge points become C."""
    import scipy.sparse as sp
    n = csr.n_rows
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    a = sp.csr_matrix((data, csr.indices, csr.indptr),
                      shape=(n, csr.n_cols))[:, :n].tocsr()
    d = a.diagonal()
    d = np.where(d == 0, 1.0, d)
    rng = np.random.default_rng(0)
    e = rng.random(n)
    for _ in range(sweeps):
        e = e - (a @ e) / d * 0.7
    slow = np.abs(e) >= theta_cr * np.abs(e).max()
    cf_map = np.full(n, FINE, np.int64)
    c_idx = np.nonzero(slow)[0]
    if c_idx.size == 0:
        c_idx = np.array([int(np.argmax(np.abs(e)))])
    cf_map[c_idx] = np.arange(c_idx.size)
    return cf_map


def select_cf(csr: CSRMatrix, strong: np.ndarray, selector: str,
              cfg=None, scope: str = "default") -> np.ndarray:
    if selector == "PMIS":
        return pmis_select(csr, strong)
    if selector == "HMIS":
        return hmis_select(csr, strong)
    if selector == "AGGRESSIVE_PMIS":
        return pmis_select(csr, strong, aggressive=True)
    if selector == "AGGRESSIVE_HMIS":
        return hmis_select(csr, strong, aggressive=True)
    if selector == "CR":
        return cr_select(csr, strong)
    if selector == "DUMMY":
        cf = np.full(csr.n_rows, FINE, np.int64)
        c = np.arange(0, csr.n_rows, 2)
        cf[c] = np.arange(c.size)
        return cf
    raise ValueError(f"Unknown classical selector '{selector}'")


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------

def direct_interpolation(csr: CSRMatrix, strong: np.ndarray,
                         cf_map: np.ndarray,
                         col_cf_map: Optional[np.ndarray] = None,
                         nc: Optional[int] = None) -> CSRMatrix:
    """Distance-1 (direct) interpolation (interpolators/distance1.cu).

    For an F point i with strong C neighbours C_i:
        P_ij = -alpha_i * a_ij / a_ii,  alpha_i = sum_{k in N_i} a_ik^-
                                                  / sum_{j in C_i} a_ij^-
    computed separately for negative and positive couplings (positive
    couplings use beta_i analogously), preserving row sums. C rows get the
    identity.

    ``col_cf_map``/``nc`` support the shard-parallel setup (boundary rows,
    distance1.cu's halo handling): on an extended-local system the column
    space is wider than the row space and carries its own cf map with
    *global* coarse ids; ``nc`` is then the global coarse count.
    """
    n = csr.n_rows
    if col_cf_map is None:
        col_cf_map = cf_map
    if nc is None:
        nc = int(cf_map.max()) + 1 if (cf_map >= 0).any() else 0
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    rows = np.repeat(np.arange(n), csr.row_nnz())
    cols = csr.indices.astype(np.int64)
    offd = cols != rows
    diag = np.zeros(n)
    diag[rows[~offd]] = data[~offd]
    if csr.diag_data is not None:
        dd = csr.diag_data if csr.block_dim == (1, 1) else \
            csr.diag_data[:, 0, 0]
        diag = diag + dd
    in_bounds = cols < col_cf_map.size
    is_strong_c = strong & in_bounds & (
        col_cf_map[np.where(in_bounds, cols, 0)] >= 0)
    neg = offd & (data < 0)
    pos = offd & (data > 0)
    sum_all_neg = np.zeros(n)
    sum_all_pos = np.zeros(n)
    np.add.at(sum_all_neg, rows[neg], data[neg])
    np.add.at(sum_all_pos, rows[pos], data[pos])
    sum_c_neg = np.zeros(n)
    sum_c_pos = np.zeros(n)
    np.add.at(sum_c_neg, rows[is_strong_c & neg], data[is_strong_c & neg])
    np.add.at(sum_c_pos, rows[is_strong_c & pos], data[is_strong_c & pos])
    alpha = np.where(sum_c_neg != 0, sum_all_neg / np.where(sum_c_neg == 0,
                                                            1.0, sum_c_neg),
                     0.0)
    beta = np.where(sum_c_pos != 0, sum_all_pos / np.where(sum_c_pos == 0,
                                                           1.0, sum_c_pos),
                    0.0)
    safe_diag = np.where(diag == 0, 1.0, diag)
    scale = np.where(data < 0, alpha[rows], beta[rows]) / safe_diag[rows]
    pvals = -scale * data
    sel = is_strong_c & (cf_map[rows] == FINE) & (pvals != 0)
    p_rows = np.concatenate([rows[sel],
                             np.nonzero(cf_map >= 0)[0]])
    p_cols = np.concatenate([col_cf_map[cols[sel]],
                             cf_map[cf_map >= 0]])
    p_vals = np.concatenate([pvals[sel],
                             np.ones(int((cf_map >= 0).sum()))])
    return CSRMatrix.from_coo(n, nc, p_rows, p_cols, p_vals)


def multipass_interpolation(csr: CSRMatrix, strong: np.ndarray,
                            cf_map: np.ndarray,
                            max_passes: int = 10) -> CSRMatrix:
    """MULTIPASS interpolation (interpolators/multipass.cu), needed when
    aggressive coarsening leaves F points with no strong C neighbour:
    pass 1 interpolates F points with strong C neighbours directly; later
    passes interpolate remaining F points through already-interpolated
    strong F neighbours (P_i = sum_j w_ij P_j, renormalized)."""
    import scipy.sparse as sp
    p1 = direct_interpolation(csr, strong, cf_map)
    n = csr.n_rows
    nc = p1.n_cols
    rows = np.repeat(np.arange(n), csr.row_nnz())
    cols = csr.indices.astype(np.int64)
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    p = p1.to_scipy().tocsr()
    interped = np.asarray((np.abs(p) @ np.ones(nc)) > 0).ravel() | \
        (cf_map >= 0)
    in_b = cols < n
    # frontier-at-a-time: each pass interpolates every remaining F row with
    # an already-interpolated strong neighbour via ONE sparse product
    # P_new = W @ P (W = row-normalized |a_ij| over those neighbours)
    for _ in range(max_passes):
        if interped.all():
            break
        cand = np.nonzero(strong & in_b & ~interped[rows])[0]
        cand = cand[interped[cols[cand]]]
        if cand.size == 0:
            break
        r_i, c_j = rows[cand], cols[cand]
        w = np.abs(data[cand])
        wsum = np.zeros(n)
        np.add.at(wsum, r_i, w)
        ready = wsum > 0
        w = w / wsum[r_i]
        wmat = sp.csr_matrix((w, (r_i, c_j)), shape=(n, n))
        p_new = wmat @ p
        keep = sp.diags((~ready).astype(np.float64))
        take = sp.diags(ready.astype(np.float64))
        p = (keep @ p + take @ p_new).tocsr()
        interped |= ready
    p.sum_duplicates()
    p.eliminate_zeros()
    return CSRMatrix(n, nc, p.indptr, p.indices, p.data)


def distance2_interpolation(csr: CSRMatrix, strong: np.ndarray,
                            cf_map: np.ndarray) -> CSRMatrix:
    """Distance-2 (extended) interpolation (interpolators/distance2.cu).

    Strong-F substitution: each strong F-F coupling a_ik is redistributed
    onto k's strong C neighbours proportionally to k's couplings,
        a~_ij = a_ij|_{j in C} + sum_{k in F_i^s} a_ik * d_kj,
        d_kj = a^_kj / sum_{l in C_k} a^_kl,
    (one sparse product), then direct-interpolation scaling with sign-split
    row-sum preservation — the standard vectorized formulation of
    extended/distance-two interpolation for PMIS coarsening. F points whose
    strong F neighbours also lack C neighbours fall back to a multipass
    sweep.
    """
    import scipy.sparse as sp
    n = csr.n_rows
    nc = int(cf_map.max()) + 1 if (cf_map >= 0).any() else 0
    data = csr.data if csr.block_dim == (1, 1) else csr.data[:, 0, 0]
    rows = np.repeat(np.arange(n), csr.row_nnz())
    cols = csr.indices.astype(np.int64)
    in_b = cols < n
    diag = np.zeros(n)
    dmask = (cols == rows)
    diag[rows[dmask]] = data[dmask]
    if csr.diag_data is not None:
        dd = csr.diag_data if csr.block_dim == (1, 1) else \
            csr.diag_data[:, 0, 0]
        diag = diag + dd
    sign = np.where(diag < 0, -1.0, 1.0)
    c_mask = cf_map >= 0

    # strong off-diagonal couplings, sign-filtered (a^: opposite the diag)
    keep = strong & in_b & (sign[rows] * data < 0)
    colc = np.minimum(cols, n - 1)           # halo-safe column index
    m_sc = keep & c_mask[colc]               # strong C entries
    # distribution denominators: strong-C row sums
    denom = np.bincount(rows[m_sc], weights=data[m_sc], minlength=n)[:n]

    # fused native path (csrc d2_nnz/d2_fill): bitwise-equal to the numpy
    # pipeline below, one marker pass instead of three COO assemblies +
    # SpGEMM + csr_add
    from ..native import lib as _nl
    nl = _nl()
    if nl is not None and getattr(nl, "_has_d2", False) and n > 1024:
        has_c_ = denom != 0
        sel = np.zeros(csr.nnz, np.uint8)
        sel[m_sc] = 1
        sel[keep & ~c_mask[colc] & has_c_[colc]] = 2
        offd = (cols != rows) & in_b
        neg = offd & (sign[rows] * data < 0)
        sum_all_ = np.bincount(rows[neg], weights=data[neg],
                               minlength=n)[:n]
        safe_den_ = np.where(denom == 0, 1.0, denom)
        safe_diag_ = np.where(diag == 0, 1.0, diag)
        got = nl.d2_interp(csr.indptr, csr.indices,
                           np.asarray(data, np.float64), sel, cf_map,
                           safe_den_, sum_all_, safe_diag_, nc)
        if got is not None:
            pi, pj, pv = got
            out = CSRMatrix(n, nc, pi, pj, pv.astype(data.dtype))
            empty_f = (out.row_nnz() == 0) & ~c_mask
            if empty_f.any():
                return multipass_interpolation(csr, strong, cf_map,
                                               max_passes=3)
            return out
    s_rows, s_cols, s_vals = rows[keep], cols[keep], data[keep]
    col_is_c = c_mask[s_cols]
    has_c = denom != 0
    safe_den = np.where(denom == 0, 1.0, denom)
    d_rows = s_rows[col_is_c]
    d_vals = s_vals[col_is_c] / safe_den[d_rows]
    # native CSR ops throughout (csrc Gustavson / COO sort) — the scipy
    # formulation of this substitution product was the setup hotspot
    from ..ops.spgemm import csr_add, csr_spgemm
    dist = CSRMatrix.from_coo(n, nc, d_rows, cf_map[s_cols[col_is_c]],
                              np.asarray(d_vals, np.float64))
    a_sc = CSRMatrix.from_coo(n, nc, s_rows[col_is_c],
                              cf_map[s_cols[col_is_c]],
                              np.asarray(s_vals[col_is_c], np.float64))
    ff = (~col_is_c) & has_c[s_cols]
    a_sf = CSRMatrix.from_coo(n, n, s_rows[ff], s_cols[ff],
                              np.asarray(s_vals[ff], np.float64))
    w = csr_add(a_sc, csr_spgemm(a_sf, dist))  # (n, nc) substituted

    # direct-interpolation scaling: preserve the full (negative-part)
    # off-diagonal row sums through the substituted stencil
    offd = (cols != rows) & in_b
    neg = offd & (sign[rows] * data < 0)
    sum_all = np.bincount(rows[neg], weights=data[neg], minlength=n)[:n]
    wrow = np.repeat(np.arange(n), w.row_nnz())
    w_sum = np.bincount(wrow, weights=w.data, minlength=n)[:n]
    alpha = np.where(w_sum != 0, sum_all / np.where(w_sum == 0, 1.0, w_sum),
                     0.0)
    safe_diag = np.where(diag == 0, 1.0, diag)
    p_vals = w.data * (-alpha / safe_diag)[wrow]
    # assemble final P: F rows from the scaled stencil, C rows = identity
    fsel = ~c_mask[wrow] & (p_vals != 0)
    c_idx = np.nonzero(c_mask)[0]
    out = CSRMatrix.from_coo(
        n, nc,
        np.concatenate([wrow[fsel], c_idx]),
        np.concatenate([w.indices[fsel].astype(np.int64), cf_map[c_idx]]),
        np.concatenate([p_vals[fsel],
                        np.ones(c_idx.size)]).astype(data.dtype),
        sum_duplicates=False)
    # fall back to multipass for F rows left empty (no strong path to C)
    empty_f = (out.row_nnz() == 0) & ~c_mask
    if empty_f.any():
        return multipass_interpolation(csr, strong, cf_map, max_passes=3)
    return out


def truncate_interpolation(p: CSRMatrix, factor: float = -1.0,
                           max_elements: int = -1) -> CSRMatrix:
    """Interpolation truncation (base/src/truncate.cu; used at
    classical_amg_level.cu:452-455): drop entries below factor*row_max and/or
    keep only the max_elements largest per row, rescaling to preserve row
    sums."""
    if factor <= 0 and max_elements <= 0:
        return p
    n = p.n_rows
    rows = np.repeat(np.arange(n), p.row_nnz())
    absv = np.abs(p.data)
    from ..native import lib as _nl
    nl = _nl()
    keep = None
    if nl is not None and getattr(nl, "_has_truncate", False) \
            and p.nnz > 2048:
        keep = nl.truncate_keep(p.indptr, absv, factor, max_elements)
    if keep is None:
        keep = np.ones(p.nnz, bool)
        if factor > 0:
            row_max = _segment_max(absv, p.indptr, 0.0)
            keep &= absv >= factor * row_max[rows]
        if max_elements > 0:
            order = np.lexsort((-absv, rows))
            rank = np.empty(p.nnz, np.int64)
            srows = rows[order]
            # rank within row
            firsts = np.unique(srows, return_index=True)[1]
            rr = np.arange(p.nnz)
            start_of = np.zeros(p.nnz, np.int64)
            start_of[firsts] = rr[firsts]
            start_of = np.maximum.accumulate(start_of)
            rank[order] = rr - start_of
            keep &= rank < max_elements
    def _rsum(r, v):
        if np.iscomplexobj(v):
            return (np.bincount(r, weights=v.real, minlength=n)[:n]
                    + 1j * np.bincount(r, weights=v.imag,
                                       minlength=n)[:n])
        return np.bincount(r, weights=v, minlength=n)[:n]

    old_sum = _rsum(rows, p.data)
    new_sum = _rsum(rows[keep], p.data[keep])
    scale = np.where(new_sum != 0, old_sum / np.where(new_sum == 0, 1.0,
                                                      new_sum), 1.0)
    vals = p.data[keep] * scale[rows[keep]]
    return CSRMatrix.from_coo(n, p.n_cols, rows[keep], p.indices[keep],
                              vals, sum_duplicates=False)
