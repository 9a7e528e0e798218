// Native host kernels for the setup phase.
//
// TPU-native replacement for the irregular setup-phase graph kernels the
// reference runs in CUDA (base/src/csr_multiply*.cu hash SpGEMM). On TPU the
// setup phase is host-side; these C++ kernels give the host path native
// performance (the pure-numpy ESC fallback in ops/spgemm.py stays as the
// reference implementation).
//
// Exposed via a plain C ABI consumed through ctypes (amgx_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <utility>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Gustavson symbolic pass: fills c_indptr, returns total nnz. Row-parallel
// (the reference's csr_multiply hash SpGEMM is massively parallel on GPU;
// here rows are distributed over host threads with per-thread markers).
int64_t spgemm_nnz(int64_t n_rows_a, int64_t n_cols_b,
                   const int64_t* a_indptr, const int32_t* a_indices,
                   const int64_t* b_indptr, const int32_t* b_indices,
                   int64_t* c_indptr) {
    c_indptr[0] = 0;
#ifdef _OPENMP
#pragma omp parallel
    {
        std::vector<int64_t> marker(static_cast<size_t>(n_cols_b), -1);
#pragma omp for schedule(dynamic, 256)
        for (int64_t i = 0; i < n_rows_a; ++i) {
            int64_t row_nnz = 0;
            for (int64_t ka = a_indptr[i]; ka < a_indptr[i + 1]; ++ka) {
                const int32_t k = a_indices[ka];
                for (int64_t kb = b_indptr[k]; kb < b_indptr[k + 1]; ++kb) {
                    const int32_t j = b_indices[kb];
                    if (marker[j] != i) {
                        marker[j] = i;
                        ++row_nnz;
                    }
                }
            }
            c_indptr[i + 1] = row_nnz;
        }
    }
#else
    {
        std::vector<int64_t> marker(static_cast<size_t>(n_cols_b), -1);
        for (int64_t i = 0; i < n_rows_a; ++i) {
            int64_t row_nnz = 0;
            for (int64_t ka = a_indptr[i]; ka < a_indptr[i + 1]; ++ka) {
                const int32_t k = a_indices[ka];
                for (int64_t kb = b_indptr[k]; kb < b_indptr[k + 1]; ++kb) {
                    const int32_t j = b_indices[kb];
                    if (marker[j] != i) {
                        marker[j] = i;
                        ++row_nnz;
                    }
                }
            }
            c_indptr[i + 1] = row_nnz;
        }
    }
#endif
    // serial prefix sum (memory-bound, cheap)
    int64_t nnz = 0;
    for (int64_t i = 0; i < n_rows_a; ++i) {
        nnz += c_indptr[i + 1];
        c_indptr[i + 1] = nnz;
    }
    return nnz;
}

// Numeric pass: fills c_indices (sorted per row) and c_data. Row-parallel
// with per-thread dense accumulators.
void spgemm_fill(int64_t n_rows_a, int64_t n_cols_b,
                 const int64_t* a_indptr, const int32_t* a_indices,
                 const double* a_data,
                 const int64_t* b_indptr, const int32_t* b_indices,
                 const double* b_data,
                 const int64_t* c_indptr, int32_t* c_indices,
                 double* c_data) {
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> next(static_cast<size_t>(n_cols_b), -2);
        std::vector<double> sums(static_cast<size_t>(n_cols_b), 0.0);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 256)
#endif
        for (int64_t i = 0; i < n_rows_a; ++i) {
            int64_t head = -1;
            int64_t length = 0;
            for (int64_t ka = a_indptr[i]; ka < a_indptr[i + 1]; ++ka) {
                const int32_t k = a_indices[ka];
                const double va = a_data[ka];
                for (int64_t kb = b_indptr[k]; kb < b_indptr[k + 1]; ++kb) {
                    const int32_t j = b_indices[kb];
                    sums[j] += va * b_data[kb];
                    if (next[j] == -2) {  // first touch this row
                        next[j] = head;
                        head = j;
                        ++length;
                    }
                }
            }
            int64_t out = c_indptr[i];
            for (int64_t cnt = 0; cnt < length; ++cnt) {
                c_indices[out] = static_cast<int32_t>(head);
                c_data[out] = sums[head];
                ++out;
                const int64_t tmp = next[head];
                next[head] = -2;
                sums[head] = 0.0;
                head = tmp;
            }
            // sort the row's (index, value) pairs ascending by column
            const int64_t s = c_indptr[i], e = c_indptr[i + 1];
            for (int64_t p = s + 1; p < e; ++p) {  // insertion sort
                const int32_t ci = c_indices[p];
                const double cv = c_data[p];
                int64_t q = p - 1;
                while (q >= s && c_indices[q] > ci) {
                    c_indices[q + 1] = c_indices[q];
                    c_data[q + 1] = c_data[q];
                    --q;
                }
                c_indices[q + 1] = ci;
                c_data[q + 1] = cv;
            }
        }
    }
}


// Fixed-priority maximal independent set: sequential greedy over the
// caller-supplied descending-priority order. Equals the round-parallel
// PMIS/HMIS fixpoint (lexicographically-first MIS under the priority)
// in one O(nnz) pass (reference: selectors/pmis.cu two-phase flagging,
// selectors/hmis.cu RS sweep). `state` arrives pre-initialized (0
// undecided, -1 pre-marked F, e.g. isolated points); winners become 1
// and demote undecided neighbours to -1.
void priority_mis(int64_t n, const int64_t* indptr, const int32_t* indices,
                  const int64_t* order_desc, int8_t* state) {
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t i = order_desc[oi];
        if (state[i] != 0) continue;
        state[i] = 1;
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const int32_t j = indices[k];
            if (j != static_cast<int32_t>(i) && state[j] == 0)
                state[j] = -1;
        }
    }
}

}  // extern "C"

extern "C" {

// In-place ILU(0) factorization in a caller-supplied row ordering
// (rank[i] = position of row i; used for the multicolor ordering).
// L entries (rank[j] < rank[i]) hold multipliers, U entries keep values.
// Mirrors the factorization the reference performs per color block
// (core/src/solvers/multicolor_ilu_solver.cu) in host form.
void ilu0_factor(int64_t n, const int64_t* indptr, const int32_t* indices,
                 double* data, const int64_t* rank, const int64_t* order) {
    // column position lookup per row, rebuilt per elimination row
    std::vector<int64_t> pos(static_cast<size_t>(n), -1);
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t i = order[oi];
        const int64_t ri = rank[i];
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
            pos[indices[k]] = k;
        // eliminate with rows j (in increasing rank) below rank ri
        // iterate row i's entries sorted by rank of their column
        std::vector<std::pair<int64_t, int64_t>> lower;  // (rank_j, k)
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const int32_t j = indices[k];
            if (rank[j] < ri) lower.emplace_back(rank[j], k);
        }
        std::sort(lower.begin(), lower.end());
        for (const auto& rk : lower) {
            const int64_t k = rk.second;
            const int32_t j = indices[k];
            // pivot = U_jj
            double piv = 0.0;
            for (int64_t kk = indptr[j]; kk < indptr[j + 1]; ++kk)
                if (indices[kk] == j) { piv = data[kk]; break; }
            if (piv == 0.0) continue;
            const double lij = data[k] / piv;
            data[k] = lij;
            for (int64_t kk = indptr[j]; kk < indptr[j + 1]; ++kk) {
                const int32_t jj = indices[kk];
                if (rank[jj] > rank[j]) {
                    const int64_t p = pos[jj];
                    if (p >= 0) data[p] -= lij * data[kk];
                }
            }
        }
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
            pos[indices[k]] = -1;
    }
}

// G5 pre-pack: the whole CSR->sorted-edge-stream front half of
// csr_to_gather in one parallel pass (replaces numpy repeat / zero-filter
// / index-split / counting-sort / six fancy-index permutations — the
// round-4 pack-time bottleneck). Produces edge streams sorted by
// (panel, window) pair, stable in original edge order (CSR entries in
// indptr order first, then external-diagonal entries — matching the
// concatenated-stream order of the numpy path). Explicit zeros dropped.
// Returns the kept edge count; pair_cnt (dense, n_pairs entries) receives
// per-pair edge counts.
int64_t gather_prepack(int64_t n, const int64_t* indptr,
                       const int32_t* indices, const double* data,
                       const double* diag,
                       int64_t sp128, int64_t w128, int64_t n_windows,
                       int64_t n_pairs,
                       int32_t* rl_s, int32_t* cl_s, int32_t* hi_s,
                       int32_t* q_s, double* vals_s, int64_t* pair_cnt) {
    int nt = 1;
#ifdef _OPENMP
    nt = omp_get_max_threads();
#endif
    // rows are ascending along the CSR stream, so per-thread contiguous
    // row ranges + (pair, thread) scan keeps the sort stable
    std::vector<int64_t> cnt(static_cast<size_t>(nt) *
                             static_cast<size_t>(n_pairs), 0);
    const int64_t rows_per_t = (n + nt - 1) / nt;
#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
    {
        int t = 0;
#ifdef _OPENMP
        t = omp_get_thread_num();
#endif
        int64_t* c = cnt.data() +
            static_cast<size_t>(t) * static_cast<size_t>(n_pairs);
        const int64_t r0 = t * rows_per_t;
        const int64_t r1 = std::min<int64_t>(n, r0 + rows_per_t);
        for (int64_t r = r0; r < r1; ++r) {
            const int64_t pbase = (r / sp128) * n_windows;
            for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k)
                if (data[k] != 0.0)
                    ++c[pbase + indices[k] / w128];
        }
    }
    // diag entries counted separately (they sit after all CSR edges in
    // the stable order, handled by a second scatter block below)
    std::vector<int64_t> dcnt;
    if (diag) {
        dcnt.assign(static_cast<size_t>(nt) *
                    static_cast<size_t>(n_pairs), 0);
#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
        {
            int t = 0;
#ifdef _OPENMP
            t = omp_get_thread_num();
#endif
            int64_t* c = dcnt.data() +
                static_cast<size_t>(t) * static_cast<size_t>(n_pairs);
            const int64_t r0 = t * rows_per_t;
            const int64_t r1 = std::min<int64_t>(n, r0 + rows_per_t);
            for (int64_t r = r0; r < r1; ++r)
                if (diag[r] != 0.0)
                    ++c[(r / sp128) * n_windows + r / w128];
        }
    }
    // exclusive scan: pair-major, CSR threads first, then diag threads
    int64_t total = 0;
    for (int64_t p = 0; p < n_pairs; ++p) {
        int64_t pair_total = 0;
        for (int t = 0; t < nt; ++t) {
            const size_t i = static_cast<size_t>(t) *
                static_cast<size_t>(n_pairs) + static_cast<size_t>(p);
            const int64_t v = cnt[i];
            cnt[i] = total + pair_total;
            pair_total += v;
        }
        if (diag)
            for (int t = 0; t < nt; ++t) {
                const size_t i = static_cast<size_t>(t) *
                    static_cast<size_t>(n_pairs) + static_cast<size_t>(p);
                const int64_t v = dcnt[i];
                dcnt[i] = total + pair_total;
                pair_total += v;
            }
        pair_cnt[p] = pair_total;
        total += pair_total;
    }
#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
    {
        int t = 0;
#ifdef _OPENMP
        t = omp_get_thread_num();
#endif
        int64_t* c = cnt.data() +
            static_cast<size_t>(t) * static_cast<size_t>(n_pairs);
        const int64_t r0 = t * rows_per_t;
        const int64_t r1 = std::min<int64_t>(n, r0 + rows_per_t);
        for (int64_t r = r0; r < r1; ++r) {
            const int32_t rl = static_cast<int32_t>(r & 127);
            const int32_t q = static_cast<int32_t>((r % sp128) >> 7);
            const int64_t pbase = (r / sp128) * n_windows;
            for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k) {
                const double v = data[k];
                if (v == 0.0) continue;
                const int64_t col = indices[k];
                const int64_t o = c[pbase + col / w128]++;
                rl_s[o] = rl;
                cl_s[o] = static_cast<int32_t>(col & 127);
                hi_s[o] = static_cast<int32_t>((col % w128) >> 7);
                q_s[o] = q;
                vals_s[o] = v;
            }
        }
        if (diag) {
            int64_t* dc = dcnt.data() +
                static_cast<size_t>(t) * static_cast<size_t>(n_pairs);
            for (int64_t r = r0; r < r1; ++r) {
                const double v = diag[r];
                if (v == 0.0) continue;
                const int64_t o = dc[(r / sp128) * n_windows + r / w128]++;
                rl_s[o] = static_cast<int32_t>(r & 127);
                cl_s[o] = static_cast<int32_t>(r & 127);
                hi_s[o] = static_cast<int32_t>((r % w128) >> 7);
                q_s[o] = static_cast<int32_t>((r % sp128) >> 7);
                vals_s[o] = v;
            }
        }
    }
    return total;
}

// Per-pair slot-depth max: depth[p] = max(s_slot[lo:hi]) + 1.
void gather_seg_max(int64_t n_pairs, const int64_t* pair_ptr,
                    const int32_t* s_slot, int64_t* depth) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t p = 0; p < n_pairs; ++p) {
        int32_t m = -1;
        for (int64_t e = pair_ptr[p]; e < pair_ptr[p + 1]; ++e)
            if (s_slot[e] > m) m = s_slot[e];
        depth[p] = m + 1;
    }
}

// Edge->tile placement once D is chosen: tile ids (padded numbering,
// contiguous per pair), row-in-tile, staging-block id and row-in-block.
void gather_finish(int64_t n_pairs, const int64_t* pair_ptr,
                   const int32_t* s_slot, const int64_t* pair_tile0,
                   int64_t d,
                   int64_t* tile_of_edge, int32_t* row_in_tile,
                   int64_t* gb, int32_t* rib) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t p = 0; p < n_pairs; ++p) {
        const int64_t t0 = pair_tile0[p];
        for (int64_t e = pair_ptr[p]; e < pair_ptr[p + 1]; ++e) {
            const int32_t s = s_slot[e];
            const int64_t tile = t0 + s / d;
            const int64_t lin = tile * d + (s % d);
            tile_of_edge[e] = tile;
            row_in_tile[e] = static_cast<int32_t>(s % d);
            gb[e] = lin >> 7;
            rib[e] = static_cast<int32_t>(lin & 127);
        }
    }
}

// Slot packing for the lane-binned gather SpMV format
// (amgx_tpu/ops/gather_spmv.py). Edges are grouped by (panel, window)
// pair; within a pair each edge takes the lowest tile row where both its
// row-lane and its column-lane are still unused (per-lane occupancy
// bitsets) — greedy bipartite edge colouring. Edges are processed in
// descending order of their tightest lane load (max of row-lane and
// column-lane degree): first-fit under this order stays near the Delta
// lower bound (vs ~2*Delta for arbitrary order), directly cutting
// slots/nnz.
void gather_pack(int64_t n_pairs, const int64_t* pair_ptr,
                 const int32_t* rl, const int32_t* cl, int32_t* s_out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int64_t p = 0; p < n_pairs; ++p) {
        const int64_t lo = pair_ptr[p], hi = pair_ptr[p + 1];
        const int64_t cnt = hi - lo;
        if (cnt == 0) continue;
        const int64_t words = cnt / 64 + 2;  // depth can't exceed cnt+1
        std::vector<uint64_t> used_r(static_cast<size_t>(128 * words), 0);
        std::vector<uint64_t> used_c(static_cast<size_t>(128 * words), 0);
        // lane degrees -> per-edge key = max(deg_r, deg_c); counting sort
        // descending (stable within equal keys)
        int32_t deg_r[128] = {0}, deg_c[128] = {0};
        for (int64_t e = lo; e < hi; ++e) {
            ++deg_r[rl[e]];
            ++deg_c[cl[e]];
        }
        int32_t max_key = 0;
        std::vector<int32_t> key(static_cast<size_t>(cnt));
        for (int64_t e = lo; e < hi; ++e) {
            const int32_t k = std::max(deg_r[rl[e]], deg_c[cl[e]]);
            key[static_cast<size_t>(e - lo)] = k;
            if (k > max_key) max_key = k;
        }
        std::vector<int64_t> bucket_ptr(static_cast<size_t>(max_key) + 2, 0);
        for (int64_t i = 0; i < cnt; ++i)
            ++bucket_ptr[static_cast<size_t>(max_key - key[
                static_cast<size_t>(i)]) + 1];
        for (int32_t k = 0; k <= max_key; ++k)
            bucket_ptr[static_cast<size_t>(k) + 1] +=
                bucket_ptr[static_cast<size_t>(k)];
        std::vector<int64_t> ord(static_cast<size_t>(cnt));
        {
            std::vector<int64_t> pos(bucket_ptr.begin(),
                                     bucket_ptr.end() - 1);
            for (int64_t i = 0; i < cnt; ++i)
                ord[static_cast<size_t>(pos[static_cast<size_t>(
                    max_key - key[static_cast<size_t>(i)])]++)] = lo + i;
        }
        for (int64_t oi = 0; oi < cnt; ++oi) {
            const int64_t e = ord[static_cast<size_t>(oi)];
            const int64_t r = rl[e], c = cl[e];
            const uint64_t* mr = &used_r[static_cast<size_t>(r * words)];
            const uint64_t* mc = &used_c[static_cast<size_t>(c * words)];
            int64_t w = 0;
            while ((mr[w] | mc[w]) == ~0ULL) ++w;
            const uint64_t both = mr[w] | mc[w];
            const int bit = __builtin_ctzll(~both);
            const int64_t s = w * 64 + bit;
            s_out[e] = static_cast<int32_t>(s);
            used_r[static_cast<size_t>(r * words) + w] |= 1ULL << bit;
            used_c[static_cast<size_t>(c * words) + w] |= 1ULL << bit;
        }
    }
}

// Stable counting sort by small integer key; fills perm with edge indices
// in ascending key order (replaces np.argsort(pair, kind="stable") in the
// G5 pack at O(n) instead of O(n log n)).
void counting_sort_perm(int64_t n, const int64_t* keys, int64_t n_keys,
                        int64_t* perm) {
    std::vector<int64_t> cnt(static_cast<size_t>(n_keys) + 1, 0);
    for (int64_t i = 0; i < n; ++i)
        ++cnt[static_cast<size_t>(keys[i]) + 1];
    for (int64_t k = 0; k < n_keys; ++k)
        cnt[static_cast<size_t>(k) + 1] += cnt[static_cast<size_t>(k)];
    for (int64_t i = 0; i < n; ++i)
        perm[cnt[static_cast<size_t>(keys[i])]++] = i;
}

// G5 post-pack: builds the three device streams (vals, hl, bmeta) from the
// slot-assigned edge list in one pass — replaces the numpy lexsort +
// ufunc.at + fancy-scatter pipeline (the round-3 pack-time bottleneck).
//
//   vals_a : (T_tot, D, 128) f32 (out_is_f32) or f64, caller-zeroed
//   hl_a   : (T_tot, D, 128) int16, caller-zeroed
//   bmeta  : (B_tot, R, 128) int8 with R = 128 + 2*Qc*128, caller-zeroed;
//            per block: [src | sten-lo | sten-hi] byte planes
//
// Edge arrays arrive ordered (grouped by pair, pairs ascending); for each
// staging block the (lane, q)-grouping is a per-block counting sort, so
// segment ranks match the numpy lexsort path ordering (stable by edge
// position).
void gather_postpack(int64_t nnz, int64_t t_tot, int64_t b_tot, int64_t d,
                     int64_t qc, int32_t out_is_f32,
                     const int64_t* tile_of_edge, const int32_t* row_in_tile,
                     const int32_t* rl, const int32_t* cl,
                     const int32_t* hi_local, const double* vals,
                     const int64_t* gb, const int32_t* rib,
                     const int32_t* q,
                     void* vals_a, int16_t* hl_a, int8_t* bmeta) {
    (void)t_tot;
    const int64_t r_rows = 128 + 2 * qc * 128;
    // pass 1: tile streams (scatters are unique per (tile,row,lane) except
    // the two hl byte planes, which OR at independent bit positions)
    float* vf = static_cast<float*>(vals_a);
    double* vd = static_cast<double*>(vals_a);
    for (int64_t e = 0; e < nnz; ++e) {
        const int64_t base = (tile_of_edge[e] * d + row_in_tile[e]) * 128;
        if (out_is_f32)
            vf[base + rl[e]] = static_cast<float>(vals[e]);
        else
            vd[base + rl[e]] = vals[e];
        hl_a[base + cl[e]] |= static_cast<int16_t>(hi_local[e] << 8);
        hl_a[base + rl[e]] |= static_cast<int16_t>(cl[e]);
    }
    // pass 2: per-block (lane, q) grouping -> src + sten byte planes.
    // bucket edges by block (counting sort, stable)
    std::vector<int64_t> bptr(static_cast<size_t>(b_tot) + 1, 0);
    for (int64_t e = 0; e < nnz; ++e)
        ++bptr[static_cast<size_t>(gb[e]) + 1];
    for (int64_t b = 0; b < b_tot; ++b)
        bptr[static_cast<size_t>(b) + 1] += bptr[static_cast<size_t>(b)];
    std::vector<int64_t> by_block(static_cast<size_t>(nnz));
    {
        std::vector<int64_t> pos(bptr.begin(), bptr.end() - 1);
        for (int64_t e = 0; e < nnz; ++e)
            by_block[static_cast<size_t>(
                pos[static_cast<size_t>(gb[e])]++)] = e;
    }
    const int64_t sq = qc * 128;          // q values per panel
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> cnt(static_cast<size_t>(128 * sq) + 1);
        std::vector<int64_t> eord(static_cast<size_t>(128 * 128));
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
        for (int64_t b = 0; b < b_tot; ++b) {
            const int64_t lo = bptr[static_cast<size_t>(b)];
            const int64_t hi2 = bptr[static_cast<size_t>(b) + 1];
            const int64_t m = hi2 - lo;
            if (m == 0) continue;
            // counting sort block edges by key = l*sq + q (stable)
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t i = lo; i < hi2; ++i) {
                const int64_t e = by_block[static_cast<size_t>(i)];
                ++cnt[static_cast<size_t>(rl[e]) * sq + q[e] + 1];
            }
            for (size_t k = 0; k < static_cast<size_t>(128 * sq); ++k)
                cnt[k + 1] += cnt[k];
            for (int64_t i = lo; i < hi2; ++i) {
                const int64_t e = by_block[static_cast<size_t>(i)];
                eord[static_cast<size_t>(
                    cnt[static_cast<size_t>(rl[e]) * sq + q[e]]++)] = e;
            }
            int8_t* bm = bmeta + b * r_rows * 128;
            int8_t* src = bm;                               // rows [0,128)
            int8_t* slo = bm + 128 * 128;                   // sten low
            int8_t* shi = bm + (128 + sq) * 128;            // sten high
            int64_t i = 0;
            while (i < m) {
                const int64_t e0 = eord[static_cast<size_t>(i)];
                const int32_t l = rl[e0];
                // ranks restart per lane: find lane end
                int64_t lane_end = i;
                while (lane_end < m &&
                       rl[eord[static_cast<size_t>(lane_end)]] == l)
                    ++lane_end;
                int64_t rank = 0;
                int64_t j = i;
                while (j < lane_end) {
                    const int32_t qv = q[eord[static_cast<size_t>(j)]];
                    const int64_t seg_start_rank = rank;
                    while (j < lane_end &&
                           q[eord[static_cast<size_t>(j)]] == qv) {
                        src[l * 128 + rank] = static_cast<int8_t>(
                            rib[eord[static_cast<size_t>(j)]]);
                        ++rank;
                        ++j;
                    }
                    const int16_t code = static_cast<int16_t>(
                        (seg_start_rank + 1) * 128 + (rank - 1));
                    const int64_t row = (qv / 128) * 128 + l;
                    const int64_t col = qv % 128;
                    slo[row * 128 + col] =
                        static_cast<int8_t>(code & 0xff);
                    shi[row * 128 + col] =
                        static_cast<int8_t>((code >> 8) & 0xff);
                }
                i = lane_end;
            }
        }
    }
}

// G5 v3 post-pack: like gather_postpack but the per-(lane, q) segment
// boundaries are emitted as ONE running int8 plane EN with
// EN(l, q) = (# slots in lane l with destination <= q) - 1, forward-
// filled along q from -1 (amgx_tpu/ops/gather_spmv.py rev 3). The kernel
// then extracts contribution(q) = P[EN(q)] - P[EN(q-1)] with a single
// gather + shifted reuse per 128-q chunk — and the bmeta stream shrinks
// from 2 to 1 byte per (lane, q) cell.
//   bmeta : (B_tot, R, 128) int8 with R = 128 + qc*128; EN rows arrive
//           pre-filled with -1 (caller), src rows zeroed.
void gather_postpack_en(int64_t nnz, int64_t t_tot, int64_t b_tot,
                        int64_t d, int64_t qc, int32_t out_is_f32,
                        const int64_t* tile_of_edge,
                        const int32_t* row_in_tile,
                        const int32_t* rl, const int32_t* cl,
                        const int32_t* hi_local, const double* vals,
                        const int64_t* gb, const int32_t* rib,
                        const int32_t* q,
                        void* vals_a, int16_t* hl_a, int8_t* bmeta) {
    (void)t_tot;
    const int64_t r_rows = 128 + qc * 128;
    float* vf = static_cast<float*>(vals_a);
    double* vd = static_cast<double*>(vals_a);
    for (int64_t e = 0; e < nnz; ++e) {
        const int64_t base = (tile_of_edge[e] * d + row_in_tile[e]) * 128;
        if (out_is_f32)
            vf[base + rl[e]] = static_cast<float>(vals[e]);
        else
            vd[base + rl[e]] = vals[e];
        hl_a[base + cl[e]] |= static_cast<int16_t>(hi_local[e] << 8);
        hl_a[base + rl[e]] |= static_cast<int16_t>(cl[e]);
    }
    std::vector<int64_t> bptr(static_cast<size_t>(b_tot) + 1, 0);
    for (int64_t e = 0; e < nnz; ++e)
        ++bptr[static_cast<size_t>(gb[e]) + 1];
    for (int64_t b = 0; b < b_tot; ++b)
        bptr[static_cast<size_t>(b) + 1] += bptr[static_cast<size_t>(b)];
    std::vector<int64_t> by_block(static_cast<size_t>(nnz));
    {
        std::vector<int64_t> pos(bptr.begin(), bptr.end() - 1);
        for (int64_t e = 0; e < nnz; ++e)
            by_block[static_cast<size_t>(
                pos[static_cast<size_t>(gb[e])]++)] = e;
    }
    const int64_t sq = qc * 128;
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> cnt(static_cast<size_t>(128 * sq) + 1);
        std::vector<int64_t> eord(static_cast<size_t>(128 * 128));
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
        for (int64_t b = 0; b < b_tot; ++b) {
            const int64_t lo = bptr[static_cast<size_t>(b)];
            const int64_t hi2 = bptr[static_cast<size_t>(b) + 1];
            const int64_t m = hi2 - lo;
            if (m == 0) continue;
            std::fill(cnt.begin(), cnt.end(), 0);
            for (int64_t i = lo; i < hi2; ++i) {
                const int64_t e = by_block[static_cast<size_t>(i)];
                ++cnt[static_cast<size_t>(rl[e]) * sq + q[e] + 1];
            }
            for (size_t k = 0; k < static_cast<size_t>(128 * sq); ++k)
                cnt[k + 1] += cnt[k];
            for (int64_t i = lo; i < hi2; ++i) {
                const int64_t e = by_block[static_cast<size_t>(i)];
                eord[static_cast<size_t>(
                    cnt[static_cast<size_t>(rl[e]) * sq + q[e]]++)] = e;
            }
            int8_t* bm = bmeta + b * r_rows * 128;
            int8_t* src = bm;                               // rows [0,128)
            int8_t* en = bm + 128 * 128;                    // EN plane
            int64_t i = 0;
            while (i < m) {
                const int64_t e0 = eord[static_cast<size_t>(i)];
                const int32_t l = rl[e0];
                int64_t lane_end = i;
                while (lane_end < m &&
                       rl[eord[static_cast<size_t>(lane_end)]] == l)
                    ++lane_end;
                int64_t rank = 0;
                int64_t j = i;
                int32_t q_prev = -1;
                for (; j < lane_end; ++j) {
                    const int64_t e = eord[static_cast<size_t>(j)];
                    const int32_t qv = q[e];
                    if (qv != q_prev) {
                        // forward-fill [q_prev, qv): EN = rank-1 so far
                        for (int32_t qq = q_prev < 0 ? 0 : q_prev;
                             qq < qv; ++qq)
                            en[((qq / 128) * 128 + l) * 128 + qq % 128] =
                                static_cast<int8_t>(rank - 1);
                        q_prev = qv;
                    }
                    src[l * 128 + rank] = static_cast<int8_t>(rib[e]);
                    ++rank;
                }
                // tail fill [q_prev, sq)
                for (int32_t qq = q_prev < 0 ? 0 : q_prev; qq < sq; ++qq)
                    en[((qq / 128) * 128 + l) * 128 + qq % 128] =
                        static_cast<int8_t>(rank - 1);
                i = lane_end;
            }
        }
    }
}

// Interpolation-truncation keep mask (base/src/truncate.cu semantics):
// drop entries below factor*row_max and/or keep the max_elements
// largest per row, stable ties (original order) — exactly the numpy
// lexsort((-|v|, rows)) ranking. O(len^2) per row with len <= ~60.
void truncate_keep(int64_t n, const int64_t* indptr, const double* absv,
                   double factor, int64_t max_elements, uint8_t* keep) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 512)
#endif
    for (int64_t i = 0; i < n; ++i) {
        const int64_t s = indptr[i], e = indptr[i + 1];
        double thr = -1.0;
        if (factor > 0.0) {
            double mx = 0.0;
            for (int64_t k = s; k < e; ++k)
                if (absv[k] > mx) mx = absv[k];
            thr = factor * mx;
        }
        for (int64_t k = s; k < e; ++k) {
            uint8_t kp = (thr < 0.0) || (absv[k] >= thr);
            if (kp && max_elements > 0) {
                int64_t r = 0;
                for (int64_t j = s; j < e; ++j)
                    if (absv[j] > absv[k] ||
                        (absv[j] == absv[k] && j < k)) ++r;
                if (r >= max_elements) kp = 0;
            }
            keep[k] = kp;
        }
    }
}

// Fused Galerkin triple product Ac = R A P without materializing RA
// (reference: csr_galerkin_product, csr_multiply.cu:326). Per coarse
// row: accumulate the RA row with a marker (discovery order over R's
// entries then A's rows), SORT it by column, then contract the sorted
// row against P with a second marker — exactly the arithmetic order of
// spgemm_fill(spgemm_fill(R,A),P), so results are bitwise equal to the
// two-phase product while skipping the RA allocation+write+read.
// Pass 1 (symbolic): per-row distinct-column counts of Ac.
int64_t rap_nnz(int64_t n_coarse, int64_t n_fine, int64_t nc_cols,
                const int64_t* r_indptr, const int32_t* r_indices,
                const int64_t* a_indptr, const int32_t* a_indices,
                const int64_t* p_indptr, const int32_t* p_indices,
                int64_t* c_indptr) {
    c_indptr[0] = 0;
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> mark_f(static_cast<size_t>(n_fine), -1);
        std::vector<int64_t> mark_c(static_cast<size_t>(nc_cols), -1);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 128)
#endif
        for (int64_t I = 0; I < n_coarse; ++I) {
            // distinct fine columns j of (RA)[I,:]
            int64_t headf = -1;
            for (int64_t kr = r_indptr[I]; kr < r_indptr[I + 1]; ++kr) {
                const int32_t i = r_indices[kr];
                for (int64_t ka = a_indptr[i]; ka < a_indptr[i + 1];
                     ++ka) {
                    const int32_t j = a_indices[ka];
                    if (j >= n_fine) continue;  // outside P's row space
                    if (mark_f[j] == -1) {
                        mark_f[j] = headf;
                        headf = j;
                    }
                }
            }
            int64_t cnt = 0;
            while (headf != -1) {
                const int64_t j = headf;
                headf = mark_f[j];
                mark_f[j] = -1;
                for (int64_t kp = p_indptr[j]; kp < p_indptr[j + 1];
                     ++kp) {
                    const int32_t J = p_indices[kp];
                    if (mark_c[J] != I) {
                        mark_c[J] = I;
                        ++cnt;
                    }
                }
            }
            c_indptr[I + 1] = cnt;
        }
    }
    int64_t nnz = 0;
    for (int64_t I = 0; I < n_coarse; ++I) {
        nnz += c_indptr[I + 1];
        c_indptr[I + 1] = nnz;
    }
    return nnz;
}

// Pass 2 (numeric).
void rap_fill(int64_t n_coarse, int64_t n_fine, int64_t nc_cols,
              const int64_t* r_indptr, const int32_t* r_indices,
              const double* r_data,
              const int64_t* a_indptr, const int32_t* a_indices,
              const double* a_data,
              const int64_t* p_indptr, const int32_t* p_indices,
              const double* p_data,
              const int64_t* c_indptr, int32_t* c_indices,
              double* c_data) {
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> next_f(static_cast<size_t>(n_fine), -2);
        std::vector<double> sums_f(static_cast<size_t>(n_fine), 0.0);
        std::vector<int64_t> next_c(static_cast<size_t>(nc_cols), -2);
        std::vector<double> sums_c(static_cast<size_t>(nc_cols), 0.0);
        std::vector<int32_t> ra_cols;
        std::vector<double> ra_vals;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 128)
#endif
        for (int64_t I = 0; I < n_coarse; ++I) {
            // RA row: discovery-order accumulation (== spgemm_fill)
            int64_t headf = -1;
            int64_t lenf = 0;
            for (int64_t kr = r_indptr[I]; kr < r_indptr[I + 1]; ++kr) {
                const int32_t i = r_indices[kr];
                const double rv = r_data[kr];
                for (int64_t ka = a_indptr[i]; ka < a_indptr[i + 1];
                     ++ka) {
                    const int32_t j = a_indices[ka];
                    if (j >= n_fine) continue;  // outside P's row space
                    sums_f[j] += rv * a_data[ka];
                    if (next_f[j] == -2) {
                        next_f[j] = headf;
                        headf = j;
                        ++lenf;
                    }
                }
            }
            ra_cols.clear();
            ra_vals.clear();
            for (int64_t k = 0; k < lenf; ++k) {
                ra_cols.push_back(static_cast<int32_t>(headf));
                ra_vals.push_back(sums_f[headf]);
                const int64_t tmp = next_f[headf];
                next_f[headf] = -2;
                sums_f[headf] = 0.0;
                headf = tmp;
            }
            // sort the RA row by column (== spgemm_fill's row sort)
            for (size_t p2 = 1; p2 < ra_cols.size(); ++p2) {
                const int32_t ci = ra_cols[p2];
                const double cv = ra_vals[p2];
                int64_t q = static_cast<int64_t>(p2) - 1;
                while (q >= 0 && ra_cols[q] > ci) {
                    ra_cols[q + 1] = ra_cols[q];
                    ra_vals[q + 1] = ra_vals[q];
                    --q;
                }
                ra_cols[q + 1] = ci;
                ra_vals[q + 1] = cv;
            }
            // contract sorted RA row with P (== second spgemm_fill)
            int64_t headc = -1;
            int64_t lenc = 0;
            for (size_t k = 0; k < ra_cols.size(); ++k) {
                const int32_t j = ra_cols[k];
                const double va = ra_vals[k];
                for (int64_t kp = p_indptr[j]; kp < p_indptr[j + 1];
                     ++kp) {
                    const int32_t J = p_indices[kp];
                    sums_c[J] += va * p_data[kp];
                    if (next_c[J] == -2) {
                        next_c[J] = headc;
                        headc = J;
                        ++lenc;
                    }
                }
            }
            int64_t out = c_indptr[I];
            for (int64_t k = 0; k < lenc; ++k) {
                c_indices[out] = static_cast<int32_t>(headc);
                c_data[out] = sums_c[headc];
                ++out;
                const int64_t tmp = next_c[headc];
                next_c[headc] = -2;
                sums_c[headc] = 0.0;
                headc = tmp;
            }
            const int64_t s = c_indptr[I], e = c_indptr[I + 1];
            for (int64_t p2 = s + 1; p2 < e; ++p2) {
                const int32_t ci = c_indices[p2];
                const double cv = c_data[p2];
                int64_t q = p2 - 1;
                while (q >= s && c_indices[q] > ci) {
                    c_indices[q + 1] = c_indices[q];
                    c_data[q + 1] = c_data[q];
                    --q;
                }
                c_indices[q + 1] = ci;
                c_data[q + 1] = cv;
            }
        }
    }
}

// Distance-2 (extended) interpolation, fused (classical AMG setup
// hotspot; reference: interpolators/distance2.cu). Replaces the
// numpy pipeline's three COO assemblies + SpGEMM + csr_add with one
// marker pass per row. `sel` per stored entry: 1 = strong coupling to a
// C column, 2 = strong coupling to an F column that itself has strong C
// couplings (substitution path), 0 = other. Addition order matches the
// numpy formulation exactly: substitution products accumulate in (k,
// then k-row storage) order, the a_sc term is added last (one commute-
// safe fp add), and the row sum runs over the column-sorted row — so
// results are bitwise equal to the csr_add(a_sc, spgemm(a_sf, dist))
// path.
//
// Symbolic pass: per-row distinct coarse-column counts into p_indptr
// (prefix-summed); returns the total.
int64_t d2_nnz(int64_t n, int64_t nc,
               const int64_t* indptr, const int32_t* indices,
               const uint8_t* sel, const int64_t* cf_map,
               int64_t* p_indptr) {
    p_indptr[0] = 0;
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> marker(static_cast<size_t>(nc), -1);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 256)
#endif
        for (int64_t i = 0; i < n; ++i) {
            if (cf_map[i] >= 0) {
                p_indptr[i + 1] = 1;
                continue;
            }
            int64_t cnt = 0;
            for (int64_t ka = indptr[i]; ka < indptr[i + 1]; ++ka) {
                if (sel[ka] == 1) {
                    const int64_t j = cf_map[indices[ka]];
                    if (marker[j] != i) { marker[j] = i; ++cnt; }
                } else if (sel[ka] == 2) {
                    const int32_t k = indices[ka];
                    for (int64_t kb = indptr[k]; kb < indptr[k + 1]; ++kb) {
                        if (sel[kb] != 1) continue;
                        const int64_t j = cf_map[indices[kb]];
                        if (marker[j] != i) { marker[j] = i; ++cnt; }
                    }
                }
            }
            p_indptr[i + 1] = cnt;
        }
    }
    int64_t nnz = 0;
    for (int64_t i = 0; i < n; ++i) {
        nnz += p_indptr[i + 1];
        p_indptr[i + 1] = nnz;
    }
    return nnz;
}

// Numeric pass. `denom[k]` is the (safe) strong-C row sum of F row k,
// `scale_num[i]` the full negative-offdiagonal row sum, `diag_safe[i]`
// the (safe) diagonal. Entries whose scaled value is exactly 0.0 are
// dropped; actual per-row counts land in p_cnt (caller compacts).
void d2_fill(int64_t n,
             const int64_t* indptr, const int32_t* indices,
             const double* data, const uint8_t* sel,
             const int64_t* cf_map, const double* denom,
             const double* scale_num, const double* diag_safe,
             const int64_t* p_indptr, int32_t* p_cols, double* p_vals,
             int64_t* p_cnt) {
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> next(static_cast<size_t>(n) + 1, -2);
        std::vector<double> sums(static_cast<size_t>(n) + 1, 0.0);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 256)
#endif
        for (int64_t i = 0; i < n; ++i) {
            const int64_t s = p_indptr[i];
            if (cf_map[i] >= 0) {
                p_cols[s] = static_cast<int32_t>(cf_map[i]);
                p_vals[s] = 1.0;
                p_cnt[i] = 1;
                continue;
            }
            // substitution products first (matches spgemm(a_sf, dist))
            int64_t head = -1, length = 0;
            for (int64_t ka = indptr[i]; ka < indptr[i + 1]; ++ka) {
                if (sel[ka] != 2) continue;
                const int32_t k = indices[ka];
                const double va = data[ka];
                const double dk = denom[k];
                for (int64_t kb = indptr[k]; kb < indptr[k + 1]; ++kb) {
                    if (sel[kb] != 1) continue;
                    const int64_t j = cf_map[indices[kb]];
                    sums[j] += va * (data[kb] / dk);
                    if (next[j] == -2) { next[j] = head; head = j; ++length; }
                }
            }
            // a_sc added last: one fp add per shared column (csr_add)
            for (int64_t ka = indptr[i]; ka < indptr[i + 1]; ++ka) {
                if (sel[ka] != 1) continue;
                const int64_t j = cf_map[indices[ka]];
                sums[j] += data[ka];
                if (next[j] == -2) { next[j] = head; head = j; ++length; }
            }
            int64_t out = s;
            for (int64_t cnt = 0; cnt < length; ++cnt) {
                p_cols[out] = static_cast<int32_t>(head);
                p_vals[out] = sums[head];
                ++out;
                const int64_t tmp = next[head];
                next[head] = -2;
                sums[head] = 0.0;
                head = tmp;
            }
            for (int64_t p = s + 1; p < out; ++p) {  // column sort
                const int32_t ci = p_cols[p];
                const double cv = p_vals[p];
                int64_t q = p - 1;
                while (q >= s && p_cols[q] > ci) {
                    p_cols[q + 1] = p_cols[q];
                    p_vals[q + 1] = p_vals[q];
                    --q;
                }
                p_cols[q + 1] = ci;
                p_vals[q + 1] = cv;
            }
            double wsum = 0.0;  // over the SORTED row (numpy bincount order)
            for (int64_t p = s; p < out; ++p) wsum += p_vals[p];
            const double alpha = (wsum != 0.0)
                ? scale_num[i] / wsum : 0.0;
            const double fac = -alpha / diag_safe[i];
            int64_t keep = s;
            for (int64_t p = s; p < out; ++p) {
                const double v = p_vals[p] * fac;
                if (v != 0.0) {
                    p_cols[keep] = p_cols[p];
                    p_vals[keep] = v;
                    ++keep;
                }
            }
            p_cnt[i] = keep - s;
        }
    }
}

// COO -> CSR with stable duplicate summing (the setup phase's most common
// reshape: Galerkin triple products and permutations emit COO). Counting
// sort by row, per-row stable sort by column (rows over threads), then a
// left-to-right merge of equal columns — the same addition order as the
// numpy stable-argsort + reduceat fallback, so results are bitwise equal.
// `block` = doubles per entry (bx*by). Returns deduplicated nnz.
int64_t coo_to_csr(int64_t n_rows, int64_t nnz, const int64_t* rows,
                   const int64_t* cols, const double* vals, int64_t block,
                   int64_t* indptr, int32_t* out_cols, double* out_vals) {
    std::vector<int64_t> start(static_cast<size_t>(n_rows) + 1, 0);
    for (int64_t e = 0; e < nnz; ++e) ++start[static_cast<size_t>(rows[e]) + 1];
    for (int64_t i = 0; i < n_rows; ++i) start[static_cast<size_t>(i) + 1] += start[static_cast<size_t>(i)];
    std::vector<int64_t> perm(static_cast<size_t>(nnz));
    {
        std::vector<int64_t> pos(start.begin(), start.end() - 1);
        for (int64_t e = 0; e < nnz; ++e)
            perm[static_cast<size_t>(pos[static_cast<size_t>(rows[e])]++)] = e;
    }
    std::vector<int64_t> row_nnz(static_cast<size_t>(n_rows), 0);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 256)
#endif
    for (int64_t i = 0; i < n_rows; ++i) {
        int64_t* p = perm.data() + start[static_cast<size_t>(i)];
        const int64_t m = start[static_cast<size_t>(i) + 1] -
                          start[static_cast<size_t>(i)];
        std::stable_sort(p, p + m, [cols](int64_t a, int64_t b) {
            return cols[a] < cols[b];
        });
        int64_t uniq = 0;
        for (int64_t k = 0; k < m; ++k)
            if (k == 0 || cols[p[k]] != cols[p[k - 1]]) ++uniq;
        row_nnz[static_cast<size_t>(i)] = uniq;
    }
    indptr[0] = 0;
    for (int64_t i = 0; i < n_rows; ++i)
        indptr[i + 1] = indptr[i] + row_nnz[static_cast<size_t>(i)];
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 256)
#endif
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t* p = perm.data() + start[static_cast<size_t>(i)];
        const int64_t m = start[static_cast<size_t>(i) + 1] -
                          start[static_cast<size_t>(i)];
        int64_t o = indptr[i] - 1;
        for (int64_t k = 0; k < m; ++k) {
            const int64_t e = p[k];
            if (k == 0 || cols[e] != cols[p[k - 1]]) {
                ++o;
                out_cols[o] = static_cast<int32_t>(cols[e]);
                std::memcpy(out_vals + o * block, vals + e * block,
                            static_cast<size_t>(block) * sizeof(double));
            } else {
                double* dst = out_vals + o * block;
                const double* src = vals + e * block;
                for (int64_t c = 0; c < block; ++c) dst[c] += src[c];
            }
        }
    }
    return indptr[n_rows];
}

// Aggregation Galerkin product Ac[I,J] = sum_{agg[i]==I, agg[j]==J} A[i,j]
// (reference: aggregation coarseAgenerators LOW_DEG/THRUST,
// core/src/aggregation/coarseAgenerators/). Gustavson-style per coarse
// row with dense per-thread accumulators; entries with agg < 0 are
// dropped. Addition order matches the numpy COO fallback (ascending fine
// row, then storage order) so results are bitwise equal. Caller sizes
// out_cols/out_vals with an nnz(A) upper bound; returns coarse nnz.
int64_t agg_galerkin(int64_t n_rows, int64_t n_coarse,
                     const int64_t* indptr, const int32_t* indices,
                     const double* vals, const int64_t* agg,
                     int64_t* out_indptr, int32_t* out_cols,
                     double* out_vals) {
    // bucket fine rows by aggregate (counting sort: stable -> ascending i)
    std::vector<int64_t> bptr(static_cast<size_t>(n_coarse) + 1, 0);
    for (int64_t i = 0; i < n_rows; ++i)
        if (agg[i] >= 0) ++bptr[static_cast<size_t>(agg[i]) + 1];
    for (int64_t I = 0; I < n_coarse; ++I)
        bptr[static_cast<size_t>(I) + 1] += bptr[static_cast<size_t>(I)];
    std::vector<int64_t> brow(static_cast<size_t>(bptr[n_coarse]));
    {
        std::vector<int64_t> pos(bptr.begin(), bptr.end() - 1);
        for (int64_t i = 0; i < n_rows; ++i)
            if (agg[i] >= 0)
                brow[static_cast<size_t>(
                    pos[static_cast<size_t>(agg[i])]++)] = i;
    }
    // provisional (parking) offsets: prefix sums of each bucket's total
    // fine nnz — disjoint, ascending regions that bound each coarse row
    std::vector<int64_t> park(static_cast<size_t>(n_coarse) + 1, 0);
    for (int64_t I = 0; I < n_coarse; ++I) {
        int64_t tot = 0;
        for (int64_t b = bptr[static_cast<size_t>(I)];
             b < bptr[static_cast<size_t>(I) + 1]; ++b) {
            const int64_t i = brow[static_cast<size_t>(b)];
            tot += indptr[i + 1] - indptr[i];
        }
        park[static_cast<size_t>(I) + 1] =
            park[static_cast<size_t>(I)] + tot;
    }
    std::vector<int64_t> row_nnz(static_cast<size_t>(n_coarse), 0);
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        std::vector<int64_t> next(static_cast<size_t>(n_coarse), -2);
        std::vector<double> sums(static_cast<size_t>(n_coarse), 0.0);
        std::vector<int32_t> touched;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
        for (int64_t I = 0; I < n_coarse; ++I) {
            int64_t head = -1;
            int64_t length = 0;
            for (int64_t b = bptr[static_cast<size_t>(I)];
                 b < bptr[static_cast<size_t>(I) + 1]; ++b) {
                const int64_t i = brow[static_cast<size_t>(b)];
                for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
                    const int64_t J = agg[indices[k]];
                    if (J < 0) continue;
                    sums[static_cast<size_t>(J)] += vals[k];
                    if (next[static_cast<size_t>(J)] == -2) {
                        next[static_cast<size_t>(J)] = head;
                        head = J;
                        ++length;
                    }
                }
            }
            row_nnz[static_cast<size_t>(I)] = length;
            // stash (col, val) runs into the output scratch region later;
            // here record columns ascending via insertion into temp
            touched.clear();
            int64_t h = head;
            while (h != -1) {
                touched.push_back(static_cast<int32_t>(h));
                const int64_t t = next[static_cast<size_t>(h)];
                next[static_cast<size_t>(h)] = -2;
                h = t;
            }
            std::sort(touched.begin(), touched.end());
            // write the compacted row at its parking offset; the second
            // pass below shifts rows left into final CSR positions
            int64_t o = park[static_cast<size_t>(I)];
            for (const int32_t c : touched) {
                out_cols[o] = c;
                out_vals[o] = sums[static_cast<size_t>(c)];
                sums[static_cast<size_t>(c)] = 0.0;
                ++o;
            }
        }
    }
    out_indptr[0] = 0;
    for (int64_t I = 0; I < n_coarse; ++I)
        out_indptr[I + 1] = out_indptr[I] + row_nnz[static_cast<size_t>(I)];
    // compact rows (parked at ascending disjoint offsets) into contiguous
    // CSR: dst <= src always, so the forward shift never clobbers unread
    // rows.
    for (int64_t I = 0; I < n_coarse; ++I) {
        const int64_t src = park[static_cast<size_t>(I)];
        const int64_t dst = out_indptr[I];
        const int64_t m = row_nnz[static_cast<size_t>(I)];
        if (src != dst) {
            std::memmove(out_cols + dst, out_cols + src,
                         static_cast<size_t>(m) * sizeof(int32_t));
            std::memmove(out_vals + dst, out_vals + src,
                         static_cast<size_t>(m) * sizeof(double));
        }
    }
    return out_indptr[n_coarse];
}

// Handshake pairwise matching on a weight graph (reference:
// size2_selector.cu matchEdges/agreeOnProposal). `vals` carries the edge
// weights with the deterministic hash tiebreak already added, so native
// and numpy paths pick identical partners (first stored maximum). agg is
// filled with consecutive aggregate ids; returns the number of aggregates
// (pairs first, leftover singletons appended).
int64_t pairwise_match(int64_t n, const int64_t* indptr,
                       const int32_t* indices, const double* vals,
                       int64_t max_iters, double max_unassigned,
                       int64_t* agg) {
    for (int64_t i = 0; i < n; ++i) agg[i] = -1;
    std::vector<int64_t> cand(static_cast<size_t>(n));
    int64_t next_id = 0;
    int64_t n_un = n;
    for (int64_t it = 0; it < max_iters; ++it) {
        if (n_un == 0 || static_cast<double>(n_un) <= max_unassigned *
                             static_cast<double>(n)) break;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1024)
#endif
        for (int64_t i = 0; i < n; ++i) {
            int64_t best = -1;
            double best_v = 0.0;
            if (agg[i] < 0) {
                for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
                    const int32_t j = indices[k];
                    if (j == i || agg[j] >= 0) continue;
                    if (best < 0 || vals[k] > best_v) {
                        best = j;
                        best_v = vals[k];
                    }
                }
            }
            cand[static_cast<size_t>(i)] = best;
        }
        int64_t progress = 0;
        for (int64_t i = 0; i < n; ++i) {
            const int64_t j = cand[static_cast<size_t>(i)];
            if (j > i && cand[static_cast<size_t>(j)] == i) {
                agg[i] = agg[j] = next_id++;
                ++progress;
            }
        }
        if (progress == 0) break;
        n_un -= 2 * progress;
    }
    for (int64_t i = 0; i < n; ++i)
        if (agg[i] < 0) agg[i] = next_id++;
    return next_id;
}

// Jones-Plassmann round computation in closed form: processing nodes by
// descending effective weight, round(i) = 1 + max round of already-
// processed (higher-weight) neighbours, 0 if none. Equivalent to the
// round-parallel JP iteration (a node wins the first round after all its
// higher-weight neighbours are colored) without any per-round scans.
// `order_desc` = node ids sorted by weight descending (ties pre-broken).
void jp_rounds(int64_t n, const int64_t* indptr, const int32_t* indices,
               const int64_t* order_desc, int64_t* round_of) {
    std::vector<int64_t> rank(static_cast<size_t>(n));
    for (int64_t oi = 0; oi < n; ++oi)
        rank[static_cast<size_t>(order_desc[oi])] = oi;
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t i = order_desc[oi];
        int64_t r = 0;
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const int32_t j = indices[k];
            if (j == static_cast<int32_t>(i)) continue;
            if (rank[static_cast<size_t>(j)] < oi) {
                const int64_t rj = round_of[j] + 1;
                if (rj > r) r = rj;
            }
        }
        round_of[i] = r;
    }
}

// Greedy graph coloring in a caller-supplied order; returns #colors.
int32_t greedy_color(int64_t n, const int64_t* indptr,
                     const int32_t* indices, const int64_t* order,
                     int32_t* colors) {
    for (int64_t i = 0; i < n; ++i) colors[i] = -1;
    std::vector<int32_t> used;
    int32_t num = 0;
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t i = order[oi];
        used.assign(static_cast<size_t>(num) + 1, 0);
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const int32_t j = indices[k];
            if (j == i) continue;
            const int32_t c = colors[j];
            if (c >= 0 && c <= num) used[c] = 1;
        }
        int32_t c = 0;
        while (c <= num && used[c]) ++c;
        colors[i] = c;
        if (c == num) ++num;
    }
    return num;
}

}  // extern "C"
