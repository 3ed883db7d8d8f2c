// Native host kernels for the setup-phase hot loops.
//
// The reference keeps its performance-critical host sparse manipulation in
// a C layer (src/hypreExtension/*.c) and C++ assembly loops
// (DOFAgglomeration.cpp, DeRhamSequence.cpp hot loops). This library plays
// the same role for parelag_tpu: the CSR gather/scatter primitives that
// dominate coarsening profiles once the dense solves are batched on device.
// Loaded via ctypes (parelag_tpu/ops/native.py) with a pure-numpy fallback.
//
// Build: ./native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Dense submatrix extraction out[r, c] = A[rows[r], cols[c]] from CSR.
// pos: caller-provided scratch of size >= ncols_A filled with -1.
void csr_extract_dense(const int64_t* indptr, const int64_t* indices,
                       const double* data, const int64_t* rows,
                       int64_t n_rows, const int64_t* cols, int64_t n_cols,
                       int64_t* pos, double* out) {
    for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = j;
    for (int64_t r = 0; r < n_rows; ++r) {
        const int64_t row = rows[r];
        double* out_row = out + r * n_cols;
        for (int64_t k = indptr[row]; k < indptr[row + 1]; ++k) {
            const int64_t m = pos[indices[k]];
            if (m >= 0) out_row[m] = data[k];
        }
    }
    for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = -1;
}

// Batched agglomerate block assembly:
//   for each entity e in ents: M[pos[dofs_e], pos[dofs_e]] += blocks_e
// with uniform entity arity k. dofs: (n_ents_total, k) row-major;
// blocks: (n_ents_total, k, k); ents: member entity ids; pos: global->local
// scratch (>= ndofs, -1 filled); ae_dofs: this agglomerate's dof list.
void assemble_agglomerate_block(const int64_t* ents, int64_t n_ents,
                                const int64_t* dofs, const double* blocks,
                                int64_t k, const int64_t* ae_dofs,
                                int64_t n_ae_dofs, int64_t* pos,
                                double* out) {
    for (int64_t i = 0; i < n_ae_dofs; ++i) pos[ae_dofs[i]] = i;
    for (int64_t t = 0; t < n_ents; ++t) {
        const int64_t e = ents[t];
        const int64_t* d = dofs + e * k;
        const double* b = blocks + e * k * k;
        for (int64_t i = 0; i < k; ++i) {
            double* out_row = out + pos[d[i]] * n_ae_dofs;
            for (int64_t j = 0; j < k; ++j) {
                out_row[pos[d[j]]] += b[i * k + j];
            }
        }
    }
    for (int64_t i = 0; i < n_ae_dofs; ++i) pos[ae_dofs[i]] = -1;
}

// ELL SpMV on host (reference-quality check path):
// y[i] = sum_k vals[i*k..] * x[idx[i*k..]]
void ell_spmv(const int32_t* indices, const double* values, int64_t n,
              int64_t k, const double* x, double* y) {
    for (int64_t i = 0; i < n; ++i) {
        double acc = 0.0;
        const int32_t* idx = indices + i * k;
        const double* v = values + i * k;
        for (int64_t j = 0; j < k; ++j) acc += v[j] * x[idx[j]];
        y[i] = acc;
    }
}

// int32-index variant (scipy CSR default index dtype)
void csr_extract_dense_i32(const int32_t* indptr, const int32_t* indices,
                           const double* data, const int64_t* rows,
                           int64_t n_rows, const int64_t* cols,
                           int64_t n_cols, int64_t* pos, double* out) {
    for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = j;
    for (int64_t r = 0; r < n_rows; ++r) {
        const int64_t row = rows[r];
        double* out_row = out + r * n_cols;
        for (int32_t k = indptr[row]; k < indptr[row + 1]; ++k) {
            const int64_t m = pos[indices[k]];
            if (m >= 0) out_row[m] = data[k];
        }
    }
    for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = -1;
}

}  // extern "C"
