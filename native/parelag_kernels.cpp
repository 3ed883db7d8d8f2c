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

// Batched dense submatrix extraction: n_blocks independent (rows, cols)
// selections from ONE CSR matrix, concatenated index arrays with offset
// tables, outputs packed into out_cat at out_off. Removes the per-block
// FFI/pointer overhead that dominates the coarsening profile when blocks
// are small (one call per stage instead of one per agglomerate).
void csr_extract_dense_many_i32(const int32_t* indptr,
                                const int32_t* indices, const double* data,
                                const int64_t* rows_cat,
                                const int64_t* row_off,
                                const int64_t* cols_cat,
                                const int64_t* col_off, int64_t* pos,
                                double* out_cat, const int64_t* out_off,
                                int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t* rows = rows_cat + row_off[b];
        const int64_t n_rows = row_off[b + 1] - row_off[b];
        const int64_t* cols = cols_cat + col_off[b];
        const int64_t n_cols = col_off[b + 1] - col_off[b];
        double* out = out_cat + out_off[b];
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
}

void csr_extract_dense_many(const int64_t* indptr, const int64_t* indices,
                            const double* data, const int64_t* rows_cat,
                            const int64_t* row_off, const int64_t* cols_cat,
                            const int64_t* col_off, int64_t* pos,
                            double* out_cat, const int64_t* out_off,
                            int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t* rows = rows_cat + row_off[b];
        const int64_t n_rows = row_off[b + 1] - row_off[b];
        const int64_t* cols = cols_cat + col_off[b];
        const int64_t n_cols = col_off[b + 1] - col_off[b];
        double* out = out_cat + out_off[b];
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
}

// Batched agglomerate block assembly: all agglomerates of a stage in one
// call. ents_cat/ent_off: member entities per AE; ae_dofs_cat/ae_off: local
// dof lists per AE; out_cat/out_off: packed dense outputs.
void assemble_agglomerate_block_many(
    const int64_t* ents_cat, const int64_t* ent_off, const int64_t* dofs,
    const double* blocks, int64_t k, const int64_t* ae_dofs_cat,
    const int64_t* ae_off, int64_t* pos, double* out_cat,
    const int64_t* out_off, int64_t n_ae) {
    for (int64_t a = 0; a < n_ae; ++a) {
        const int64_t* ents = ents_cat + ent_off[a];
        const int64_t n_ents = ent_off[a + 1] - ent_off[a];
        const int64_t* ae_dofs = ae_dofs_cat + ae_off[a];
        const int64_t n_ae_dofs = ae_off[a + 1] - ae_off[a];
        double* out = out_cat + out_off[a];
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
}

}  // extern "C"

// Permutation-friendly batched extraction: per-block index ranges arrive
// as explicit (begin, end) arrays so the caller can present blocks in a
// row-locality order (sorted by first row) while outputs still land at
// each block's original out_beg slot. At ~10^6-dof scale the CSR arrays
// exceed cache and unsorted block order made extraction latency-bound.
// Templated over the index and value types (the f32 setup pipeline
// halves the streamed bytes end-to-end).
template <typename I, typename T>
static void extract_many2_impl(
    const I* indptr, const I* indices, const T* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, T* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks) {
    for (int64_t t = 0; t < n_blocks; ++t) {
        const int64_t b = order[t];
        const int64_t* rows = rows_cat + row_beg[b];
        const int64_t n_rows = row_end[b] - row_beg[b];
        const int64_t* cols = cols_cat + col_beg[b];
        const int64_t n_cols = col_end[b] - col_beg[b];
        T* out = out_cat + out_beg[b];
        for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = j;
        for (int64_t r = 0; r < n_rows; ++r) {
            const int64_t row = rows[r];
            T* out_row = out + r * n_cols;
            for (I k = indptr[row]; k < indptr[row + 1]; ++k) {
                const int64_t m = pos[indices[k]];
                if (m >= 0) out_row[m] = data[k];
            }
        }
        for (int64_t j = 0; j < n_cols; ++j) pos[cols[j]] = -1;
    }
}

extern "C" {

void csr_extract_dense_many2(
    const int64_t* indptr, const int64_t* indices, const double* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, double* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks) {
    extract_many2_impl<int64_t, double>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks);
}

void csr_extract_dense_many2_i32(
    const int32_t* indptr, const int32_t* indices, const double* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, double* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks) {
    extract_many2_impl<int32_t, double>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks);
}

void csr_extract_dense_many2_f32(
    const int64_t* indptr, const int64_t* indices, const float* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, float* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks) {
    extract_many2_impl<int64_t, float>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks);
}

void csr_extract_dense_many2_i32_f32(
    const int32_t* indptr, const int32_t* indices, const float* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, float* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks) {
    extract_many2_impl<int32_t, float>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks);
}

}  // extern "C"

// Variable-arity batched agglomerate assembly: per-entity dof lists and
// dense blocks arrive concatenated with offset tables (coarse-level local
// mass blocks have different sizes per entity).
template <typename T>
static void assemble_blocks_var_impl(
    const int64_t* ents_cat, const int64_t* ent_off,
    const int64_t* dof_cat, const int64_t* dof_off, const T* blk_cat,
    const int64_t* blk_off, const int64_t* ae_dofs_cat,
    const int64_t* ae_off, int64_t* pos, T* out_cat,
    const int64_t* out_off, int64_t n_ae) {
    for (int64_t a = 0; a < n_ae; ++a) {
        const int64_t* ents = ents_cat + ent_off[a];
        const int64_t n_ents = ent_off[a + 1] - ent_off[a];
        const int64_t* ae_dofs = ae_dofs_cat + ae_off[a];
        const int64_t n_ae_dofs = ae_off[a + 1] - ae_off[a];
        T* out = out_cat + out_off[a];
        for (int64_t i = 0; i < n_ae_dofs; ++i) pos[ae_dofs[i]] = i;
        for (int64_t t = 0; t < n_ents; ++t) {
            const int64_t e = ents[t];
            const int64_t* d = dof_cat + dof_off[e];
            const int64_t k = dof_off[e + 1] - dof_off[e];
            const T* b = blk_cat + blk_off[e];
            for (int64_t i = 0; i < k; ++i) {
                T* out_row = out + pos[d[i]] * n_ae_dofs;
                for (int64_t j = 0; j < k; ++j) {
                    out_row[pos[d[j]]] += b[i * k + j];
                }
            }
        }
        for (int64_t i = 0; i < n_ae_dofs; ++i) pos[ae_dofs[i]] = -1;
    }
}

extern "C" {

void assemble_agglomerate_blocks_var(
    const int64_t* ents_cat, const int64_t* ent_off,
    const int64_t* dof_cat, const int64_t* dof_off, const double* blk_cat,
    const int64_t* blk_off, const int64_t* ae_dofs_cat,
    const int64_t* ae_off, int64_t* pos, double* out_cat,
    const int64_t* out_off, int64_t n_ae) {
    assemble_blocks_var_impl<double>(
        ents_cat, ent_off, dof_cat, dof_off, blk_cat, blk_off,
        ae_dofs_cat, ae_off, pos, out_cat, out_off, n_ae);
}

void assemble_agglomerate_blocks_var_f32(
    const int64_t* ents_cat, const int64_t* ent_off,
    const int64_t* dof_cat, const int64_t* dof_off, const float* blk_cat,
    const int64_t* blk_off, const int64_t* ae_dofs_cat,
    const int64_t* ae_off, int64_t* pos, float* out_cat,
    const int64_t* out_off, int64_t n_ae) {
    assemble_blocks_var_impl<float>(
        ents_cat, ent_off, dof_cat, dof_off, blk_cat, blk_off,
        ae_dofs_cat, ae_off, pos, out_cat, out_off, n_ae);
}

}  // extern "C"
