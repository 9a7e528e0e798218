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

extern "C" {

// Gustavson row-by-row symbolic pass: fills c_indptr, returns total nnz.
int64_t spgemm_nnz(int64_t n_rows_a, int64_t n_cols_b,
                   const int64_t* a_indptr, const int32_t* a_indices,
                   const int64_t* b_indptr, const int32_t* b_indices,
                   int64_t* c_indptr) {
    std::vector<int64_t> marker(static_cast<size_t>(n_cols_b), -1);
    c_indptr[0] = 0;
    int64_t nnz = 0;
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
        nnz += row_nnz;
        c_indptr[i + 1] = nnz;
    }
    return nnz;
}

// Numeric pass: fills c_indices (sorted per row) and c_data.
void spgemm_fill(int64_t n_rows_a, int64_t n_cols_b,
                 const int64_t* a_indptr, const int32_t* a_indices,
                 const double* a_data,
                 const int64_t* b_indptr, const int32_t* b_indices,
                 const double* b_data,
                 const int64_t* c_indptr, int32_t* c_indices,
                 double* c_data) {
    std::vector<int64_t> next(static_cast<size_t>(n_cols_b), -2);
    std::vector<double> sums(static_cast<size_t>(n_cols_b), 0.0);
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
        for (int64_t p = s + 1; p < e; ++p) {  // insertion sort: rows short
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

}  // extern "C"
