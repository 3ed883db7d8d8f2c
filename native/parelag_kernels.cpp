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

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

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
    const int64_t* order, int64_t n_blocks, int64_t zero_out) {
    for (int64_t t = 0; t < n_blocks; ++t) {
        const int64_t b = order[t];
        const int64_t* rows = rows_cat + row_beg[b];
        const int64_t n_rows = row_end[b] - row_beg[b];
        const int64_t* cols = cols_cat + col_beg[b];
        const int64_t n_cols = col_end[b] - col_beg[b];
        T* out = out_cat + out_beg[b];
        if (zero_out) {
            // zero the block cache-hot, fused with the fill: callers
            // then allocate with np.empty instead of a separate
            // (host-phase-sensitive) zeros pass over the whole output
            for (int64_t i = 0; i < n_rows * n_cols; ++i) out[i] = (T)0;
        }
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
    const int64_t* order, int64_t n_blocks,
    int64_t zero_out) {
    extract_many2_impl<int64_t, double>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks, zero_out);
}

void csr_extract_dense_many2_i32(
    const int32_t* indptr, const int32_t* indices, const double* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, double* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks,
    int64_t zero_out) {
    extract_many2_impl<int32_t, double>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks, zero_out);
}

void csr_extract_dense_many2_f32(
    const int64_t* indptr, const int64_t* indices, const float* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, float* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks,
    int64_t zero_out) {
    extract_many2_impl<int64_t, float>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks, zero_out);
}

void csr_extract_dense_many2_i32_f32(
    const int32_t* indptr, const int32_t* indices, const float* data,
    const int64_t* rows_cat, const int64_t* row_beg, const int64_t* row_end,
    const int64_t* cols_cat, const int64_t* col_beg, const int64_t* col_end,
    int64_t* pos, float* out_cat, const int64_t* out_beg,
    const int64_t* order, int64_t n_blocks,
    int64_t zero_out) {
    extract_many2_impl<int32_t, float>(
        indptr, indices, data, rows_cat, row_beg, row_end, cols_cat,
        col_beg, col_end, pos, out_cat, out_beg, order, n_blocks, zero_out);
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
        // zero the block here, cache-hot and fused with the scatter:
        // a separate np.zeros pass over the (GB-scale) output was the
        // single most host-phase-sensitive cost of the setup
        for (int64_t i = 0; i < n_ae_dofs * n_ae_dofs; ++i) out[i] = (T)0;
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

// ---------------------------------------------------------------------- //
// Mesh entity derivation (the fine-topology build hot path; semantics
// identical to the numpy reference in parelag_tpu/mesh/entities.py:
// gids in ascending packed-key order, creator = first occurrence in
// original order, creator-cycle orientation signs).
// ---------------------------------------------------------------------- //

namespace {

struct KeyIdx {
    int64_t k1, k2, idx;
    bool operator<(const KeyIdx& o) const {
        if (k1 != o.k1) return k1 < o.k1;
        if (k2 != o.k2) return k2 < o.k2;
        return idx < o.idx;
    }
};

}  // namespace

// Unique global edges from element corner lists.
//   elems (ne, nvpe), loc_edges (n_le, 2) local corner pairs.
// Outputs: elem_edge (ne, n_le) edge gids, elem_edge_sign (ne, n_le) +-1
// (local direction vs global tail<head), edges (nedge, 2) tail<head rows in
// ascending key order (caller allocates ne*n_le*2 worst case).
// Returns nedge.
int64_t derive_edges(const int64_t* elems, int64_t ne, int64_t nvpe,
                     const int64_t* loc_edges, int64_t n_le, int64_t nv,
                     int64_t* elem_edge, double* elem_edge_sign,
                     int64_t* edges) {
    const int64_t N = ne * n_le;
    std::vector<KeyIdx> v(N);
    for (int64_t e = 0; e < ne; ++e) {
        const int64_t* verts = elems + e * nvpe;
        for (int64_t l = 0; l < n_le; ++l) {
            const int64_t a = verts[loc_edges[2 * l]];
            const int64_t b = verts[loc_edges[2 * l + 1]];
            const int64_t lo = a < b ? a : b;
            const int64_t hi = a < b ? b : a;
            const int64_t i = e * n_le + l;
            v[i] = KeyIdx{lo * nv + hi, 0, i};
            elem_edge_sign[i] = a < b ? 1.0 : -1.0;
        }
    }
    std::sort(v.begin(), v.end());
    int64_t gid = -1, prev = -1;
    for (int64_t t = 0; t < N; ++t) {
        if (v[t].k1 != prev) {
            prev = v[t].k1;
            ++gid;
            edges[2 * gid] = prev / nv;
            edges[2 * gid + 1] = prev % nv;
        }
        elem_edge[v[t].idx] = gid;
    }
    return gid + 1;
}

// Unique global faces (k-cycles, k <= 4) from element corner lists.
// Outputs: elem_face (ne, n_lf) face gids, elem_face_sign (ne, n_lf) +-1,
// face_verts (nface, k) creator cycles, face_sorted (nface, k) sorted keys
// (both allocated ne*n_lf*k worst case by the caller). Returns nface, or
// -1 if an occurrence is not a rotation of the creator cycle or its
// reversal, or -2 on a non-manifold face (>2 occurrences).
int64_t derive_faces(const int64_t* elems, int64_t ne, int64_t nvpe,
                     const int64_t* loc_faces, int64_t n_lf, int64_t k,
                     int64_t nv, int64_t* elem_face, double* elem_face_sign,
                     int64_t* face_verts, int64_t* face_sorted) {
    if (k < 3 || k > 4) return -3;
    const int64_t N = ne * n_lf;
    std::vector<KeyIdx> v(N);
    for (int64_t e = 0; e < ne; ++e) {
        const int64_t* verts = elems + e * nvpe;
        for (int64_t l = 0; l < n_lf; ++l) {
            int64_t c[4] = {0, 0, 0, 0};
            for (int64_t j = 0; j < k; ++j) c[j] = verts[loc_faces[l * k + j]];
            int64_t s[4];
            for (int64_t j = 0; j < k; ++j) s[j] = c[j];
            std::sort(s, s + k);
            const int64_t i = e * n_lf + l;
            v[i] = KeyIdx{s[0] * nv + s[1],
                          k == 4 ? s[2] * nv + s[3] : s[2], i};
        }
    }
    std::sort(v.begin(), v.end());
    // pass 1: gids + creator cycles (first occurrence within each group)
    int64_t gid = -1;
    int64_t prev1 = -1, prev2 = -1;
    int64_t count = 0;
    for (int64_t t = 0; t < N; ++t) {
        if (t == 0 || v[t].k1 != prev1 || v[t].k2 != prev2) {
            prev1 = v[t].k1;
            prev2 = v[t].k2;
            ++gid;
            count = 0;
            const int64_t i = v[t].idx;
            const int64_t e = i / n_lf, l = i % n_lf;
            const int64_t* verts = elems + e * nvpe;
            int64_t s[4];
            for (int64_t j = 0; j < k; ++j) {
                face_verts[gid * k + j] = verts[loc_faces[l * k + j]];
                s[j] = face_verts[gid * k + j];
            }
            std::sort(s, s + k);
            for (int64_t j = 0; j < k; ++j) face_sorted[gid * k + j] = s[j];
        }
        if (++count > 2) return -2;
        elem_face[v[t].idx] = gid;
    }
    const int64_t nface = gid + 1;
    // pass 2: orientation signs (fwd rotation of creator cycle -> +1,
    // rotation of its reversal -> -1)
    for (int64_t e = 0; e < ne; ++e) {
        const int64_t* verts = elems + e * nvpe;
        for (int64_t l = 0; l < n_lf; ++l) {
            const int64_t i = e * n_lf + l;
            const int64_t* st = face_verts + elem_face[i] * k;
            int64_t c[4];
            for (int64_t j = 0; j < k; ++j) c[j] = verts[loc_faces[l * k + j]];
            int64_t j0 = -1;
            for (int64_t j = 0; j < k; ++j)
                if (st[j] == c[0]) { j0 = j; break; }
            if (j0 < 0) return -1;
            bool fwd = true, bwd = true;
            for (int64_t t = 0; t < k; ++t) {
                if (st[(j0 + t) % k] != c[t]) fwd = false;
                if (st[(j0 - t + k) % k] != c[t]) bwd = false;
            }
            if (fwd) elem_face_sign[i] = 1.0;
            else if (bwd) elem_face_sign[i] = -1.0;
            else return -1;
        }
    }
    return nface;
}

// Edge gids + traversal signs of every face cycle edge: face f edge j runs
// face_verts[f,j] -> face_verts[f,(j+1)%k]; gid via binary search over the
// ascending edge keys (edges rows are tail<head in ascending key order).
void face_edges(const int64_t* face_verts, int64_t nface, int64_t k,
                const int64_t* edges, int64_t nedge, int64_t nv,
                int64_t* face_edge, double* face_edge_sign) {
    for (int64_t f = 0; f < nface; ++f) {
        const int64_t* c = face_verts + f * k;
        for (int64_t j = 0; j < k; ++j) {
            const int64_t a = c[j], b = c[(j + 1) % k];
            const int64_t lo = a < b ? a : b, hi = a < b ? b : a;
            const int64_t key = lo * nv + hi;
            int64_t lb = 0, ub = nedge;
            while (lb < ub) {
                const int64_t mid = (lb + ub) / 2;
                const int64_t mk = edges[2 * mid] * nv + edges[2 * mid + 1];
                if (mk < key) lb = mid + 1; else ub = mid;
            }
            face_edge[f * k + j] = lb;
            face_edge_sign[f * k + j] = a < b ? 1.0 : -1.0;
        }
    }
}

namespace {

int64_t uf_find(int64_t* parent, int64_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]];  // path halving
        x = parent[x];
    }
    return x;
}

}  // namespace

// Connected components of "fine entities sharing a sub-entity AND the same
// coarse label" (the _split_disconnected graph) WITHOUT forming B B^T:
// one pass over the B CSR rows with a last-seen-parent table per
// sub-entity; transitive union-find chains equal a clique union.
// comp ids are numbered by ascending smallest member (matching
// scipy.csgraph.connected_components' scan order). Returns n_comp.
// scratch last_label/last_ent: size n_sub, caller-filled with -2/-1.
int64_t split_components(const int64_t* indptr, const int64_t* indices,
                         int64_t n_ent, const int64_t* label,
                         int64_t* last_label, int64_t* last_ent,
                         int64_t* parent, int64_t* comp) {
    for (int64_t e = 0; e < n_ent; ++e) parent[e] = e;
    for (int64_t e = 0; e < n_ent; ++e) {
        const int64_t l = label[e];
        if (l < 0) continue;
        for (int64_t k = indptr[e]; k < indptr[e + 1]; ++k) {
            const int64_t s = indices[k];
            if (last_label[s] == l) {
                const int64_t ra = uf_find(parent, e);
                const int64_t rb = uf_find(parent, last_ent[s]);
                if (ra != rb) parent[rb < ra ? ra : rb] = rb < ra ? rb : ra;
            }
            last_label[s] = l;
            last_ent[s] = e;
        }
    }
    int64_t n_comp = 0;
    for (int64_t e = 0; e < n_ent; ++e) {
        if (uf_find(parent, e) == e) comp[e] = n_comp++;
    }
    for (int64_t e = 0; e < n_ent; ++e) comp[e] = comp[uf_find(parent, e)];
    return n_comp;
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// Batched dense solve for the per-agglomerate saddle systems (extension
// pass 2; reference ParELAG_SaddlePointSolver.cpp LDL role). LAPACK
// per-call overhead dominates at these sizes (n ~ 5-50, m ~ 10^4-10^5
// systems per shape group); one C++ pass with f64 internal accumulation
// is both faster and removes the f32 noise floor that triggered
// per-item lstsq fallbacks. Partial-pivot LU; bad[i]=1 flags a zero
// pivot (caller re-solves those items with lstsq).
template <typename T>
static void batched_solve_impl(const T* A, const T* B, T* X, int64_t m,
                               int64_t n, int64_t k, double* a, double* b,
                               uint8_t* bad, double* res = nullptr,
                               double* bmax = nullptr) {
    for (int64_t it = 0; it < m; ++it) {
        const T* As = A + it * n * n;
        const T* Bs = B + it * n * k;
        T* Xs = X + it * n * k;
        for (int64_t i = 0; i < n * n; ++i) a[i] = (double)As[i];
        for (int64_t i = 0; i < n * k; ++i) b[i] = (double)Bs[i];
        bad[it] = 0;
        for (int64_t c = 0; c < n; ++c) {
            // pivot search in column c
            int64_t p = c;
            double best = std::fabs(a[c * n + c]);
            for (int64_t r = c + 1; r < n; ++r) {
                const double v = std::fabs(a[r * n + c]);
                if (v > best) { best = v; p = r; }
            }
            if (best == 0.0) { bad[it] = 1; break; }
            if (p != c) {
                for (int64_t j = c; j < n; ++j)
                    std::swap(a[c * n + j], a[p * n + j]);
                for (int64_t j = 0; j < k; ++j)
                    std::swap(b[c * k + j], b[p * k + j]);
            }
            const double inv = 1.0 / a[c * n + c];
            for (int64_t r = c + 1; r < n; ++r) {
                const double f = a[r * n + c] * inv;
                if (f == 0.0) continue;
                a[r * n + c] = 0.0;
                for (int64_t j = c + 1; j < n; ++j)
                    a[r * n + j] -= f * a[c * n + j];
                for (int64_t j = 0; j < k; ++j)
                    b[r * k + j] -= f * b[c * k + j];
            }
        }
        if (bad[it]) {
            for (int64_t i = 0; i < n * k; ++i) Xs[i] = (T)0;
            if (res) {
                // honor the contract even for hard-singular systems
                // (X = 0 -> residual = max|B|); the wrapper allocates
                // res/bmax with np.empty
                double bm = 0.0;
                for (int64_t i = 0; i < n * k; ++i) {
                    const double v = std::fabs((double)Bs[i]);
                    if (v > bm) bm = v;
                }
                res[it] = bm;
                if (bmax) bmax[it] = bm;
            }
            continue;
        }
        for (int64_t c = n - 1; c >= 0; --c) {
            const double inv = 1.0 / a[c * n + c];
            for (int64_t j = 0; j < k; ++j) {
                double acc = b[c * k + j];
                for (int64_t r = c + 1; r < n; ++r)
                    acc -= a[c * n + r] * b[r * k + j];
                b[c * k + j] = acc * inv;
            }
        }
        for (int64_t i = 0; i < n * k; ++i) Xs[i] = (T)b[i];
        if (res) {
            // residual check while A/B/X are cache-hot: the numpy
            // equivalent (np.abs(A @ X - B).max) costs a full extra
            // batched-matmul pass over the group
            double r = 0.0, bm = 0.0;
            for (int64_t row = 0; row < n; ++row) {
                for (int64_t j = 0; j < k; ++j) {
                    double acc = -(double)Bs[row * k + j];
                    const double babs = std::fabs((double)Bs[row * k + j]);
                    if (babs > bm) bm = babs;
                    for (int64_t l = 0; l < n; ++l)
                        acc += (double)As[row * n + l]
                             * (double)Xs[l * k + j];
                    const double v = std::fabs(acc);
                    if (v > r) r = v;
                }
            }
            res[it] = r;
            if (bmax) bmax[it] = bm;
        }
    }
}

extern "C" {

void batched_solve_f64(const double* A, const double* B, double* X,
                       int64_t m, int64_t n, int64_t k, double* a,
                       double* b, uint8_t* bad) {
    batched_solve_impl<double>(A, B, X, m, n, k, a, b, bad);
}

void batched_solve_f32(const float* A, const float* B, float* X,
                       int64_t m, int64_t n, int64_t k, double* a,
                       double* b, uint8_t* bad) {
    batched_solve_impl<float>(A, B, X, m, n, k, a, b, bad);
}

void batched_solve_res_f64(const double* A, const double* B, double* X,
                           int64_t m, int64_t n, int64_t k, double* a,
                           double* b, uint8_t* bad, double* res,
                           double* bmax) {
    batched_solve_impl<double>(A, B, X, m, n, k, a, b, bad, res, bmax);
}

void batched_solve_res_f32(const float* A, const float* B, float* X,
                           int64_t m, int64_t n, int64_t k, double* a,
                           double* b, uint8_t* bad, double* res,
                           double* bmax) {
    batched_solve_impl<float>(A, B, X, m, n, k, a, b, bad, res, bmax);
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// Q1 hex local mass matrices, all four de Rham forms in ONE pass over the
// elements (DeRhamSequenceFE::assembleLocalMass role). Constant reference
// tables arrive from Python so the conventions stay defined in ONE place
// (parelag_tpu/amge/hexfe.py): dsh (nq,8,3) Q1 gradients, sh (nq,8) Q1
// shapes, ndE (nq,12,3) ND0 shapes, rtF (nq,6,3) RT0 shapes, qw (nq).
// coeffX: optional (ne, nq) coefficient values (null -> 1).
// Outputs: M0 (ne,8,8), M1 (ne,12,12) edge-sign folded, M2 (ne,6,6)
// face-sign folded, M3 (ne,1), vols (ne). Accumulation is always f64; OT
// selects the storage precision (f32 for a cast_setup(np.float32)
// pipeline — halves the stored bytes and skips the post-build re-cast).
template <typename OT>
static void hex_masses_impl(
                const double* coords, int64_t ne, const double* dsh,
                const double* sh, const double* ndE, const double* rtF,
                const double* qw, int64_t nq, const double* es,
                const double* fs, const double* c0, const double* c1,
                const double* c2, const double* c3, OT* M0, OT* M1,
                OT* M2, OT* M3, double* vols) {
    for (int64_t e = 0; e < ne; ++e) {
        const double* X = coords + e * 24;  // (8,3)
        double m0[64] = {0}, m1[144] = {0}, m2[36] = {0};
        double m3 = 0.0, vol = 0.0;
        for (int64_t q = 0; q < nq; ++q) {
            const double* d = dsh + q * 24;  // (8,3)
            double J[3][3] = {{0}};
            for (int64_t i = 0; i < 8; ++i) {
                const double x = X[3 * i], y = X[3 * i + 1],
                             z = X[3 * i + 2];
                for (int64_t b = 0; b < 3; ++b) {
                    const double db = d[3 * i + b];
                    J[0][b] += x * db;
                    J[1][b] += y * db;
                    J[2][b] += z * db;
                }
            }
            double adj[3][3];
            adj[0][0] = J[1][1] * J[2][2] - J[1][2] * J[2][1];
            adj[0][1] = J[0][2] * J[2][1] - J[0][1] * J[2][2];
            adj[0][2] = J[0][1] * J[1][2] - J[0][2] * J[1][1];
            adj[1][0] = J[1][2] * J[2][0] - J[1][0] * J[2][2];
            adj[1][1] = J[0][0] * J[2][2] - J[0][2] * J[2][0];
            adj[1][2] = J[0][2] * J[1][0] - J[0][0] * J[1][2];
            adj[2][0] = J[1][0] * J[2][1] - J[1][1] * J[2][0];
            adj[2][1] = J[0][1] * J[2][0] - J[0][0] * J[2][1];
            adj[2][2] = J[0][0] * J[1][1] - J[0][1] * J[1][0];
            const double det = J[0][0] * adj[0][0] + J[0][1] * adj[1][0]
                             + J[0][2] * adj[2][0];
            const double adet = std::fabs(det);
            const double w = qw[q] * adet;
            vol += w;
            // H1: M0 += w c0 N outer N
            {
                const double wq = c0 ? w * c0[e * nq + q] : w;
                const double* N = sh + q * 8;
                for (int64_t i = 0; i < 8; ++i) {
                    const double wi = wq * N[i];
                    for (int64_t j = 0; j <= i; ++j)
                        m0[i * 8 + j] += wi * N[j];
                }
            }
            // ND0 (covariant): V_i = E_i @ Jinv, M1 += w c1 V V^T
            {
                const double wq = (c1 ? w * c1[e * nq + q] : w)
                                / (det * det);
                const double* E = ndE + q * 36;
                double V[12][3];
                for (int64_t i = 0; i < 12; ++i)
                    for (int64_t a = 0; a < 3; ++a)
                        V[i][a] = E[3 * i] * adj[0][a]
                                + E[3 * i + 1] * adj[1][a]
                                + E[3 * i + 2] * adj[2][a];
                for (int64_t i = 0; i < 12; ++i)
                    for (int64_t j = 0; j <= i; ++j)
                        m1[i * 12 + j] += wq * (V[i][0] * V[j][0]
                                                + V[i][1] * V[j][1]
                                                + V[i][2] * V[j][2]);
            }
            // RT0 (contravariant Piola): V_i = J @ F_i, weight w c2 / det^2
            {
                const double wq = (c2 ? w * c2[e * nq + q] : w)
                                / (det * det);
                const double* F = rtF + q * 18;
                double V[6][3];
                for (int64_t i = 0; i < 6; ++i)
                    for (int64_t a = 0; a < 3; ++a)
                        V[i][a] = J[a][0] * F[3 * i] + J[a][1] * F[3 * i + 1]
                                + J[a][2] * F[3 * i + 2];
                for (int64_t i = 0; i < 6; ++i)
                    for (int64_t j = 0; j <= i; ++j)
                        m2[i * 6 + j] += wq * (V[i][0] * V[j][0]
                                               + V[i][1] * V[j][1]
                                               + V[i][2] * V[j][2]);
            }
            m3 += c3 ? w * c3[e * nq + q] : w;
        }
        // symmetrize + fold orientation signs
        OT* o0 = M0 + e * 64;
        for (int64_t i = 0; i < 8; ++i)
            for (int64_t j = 0; j <= i; ++j)
                o0[i * 8 + j] = o0[j * 8 + i] = OT(m0[i * 8 + j]);
        OT* o1 = M1 + e * 144;
        const double* esig = es + e * 12;
        for (int64_t i = 0; i < 12; ++i)
            for (int64_t j = 0; j <= i; ++j) {
                const OT val = OT(m1[i * 12 + j] * esig[i] * esig[j]);
                o1[i * 12 + j] = o1[j * 12 + i] = val;
            }
        OT* o2 = M2 + e * 36;
        const double* fsig = fs + e * 6;
        for (int64_t i = 0; i < 6; ++i)
            for (int64_t j = 0; j <= i; ++j) {
                const OT val = OT(m2[i * 6 + j] * fsig[i] * fsig[j]);
                o2[i * 6 + j] = o2[j * 6 + i] = val;
            }
        M3[e] = OT(m3);
        vols[e] = vol;
    }
}

extern "C" {

void hex_masses(const double* coords, int64_t ne, const double* dsh,
                const double* sh, const double* ndE, const double* rtF,
                const double* qw, int64_t nq, const double* es,
                const double* fs, const double* c0, const double* c1,
                const double* c2, const double* c3, double* M0, double* M1,
                double* M2, double* M3, double* vols) {
    hex_masses_impl<double>(coords, ne, dsh, sh, ndE, rtF, qw, nq, es, fs,
                            c0, c1, c2, c3, M0, M1, M2, M3, vols);
}

void hex_masses_f32(const double* coords, int64_t ne, const double* dsh,
                    const double* sh, const double* ndE, const double* rtF,
                    const double* qw, int64_t nq, const double* es,
                    const double* fs, const double* c0, const double* c1,
                    const double* c2, const double* c3, float* M0,
                    float* M1, float* M2, float* M3, double* vols) {
    hex_masses_impl<float>(coords, ne, dsh, sh, ndE, rtF, qw, nq, es, fs,
                           c0, c1, c2, c3, M0, M1, M2, M3, vols);
}

}  // extern "C"

// Quad-face trace masses, all three in one pass (bilinIntegrators role):
// fh1 (nf,4,4) Q1 surface mass, fnd (nf,4,4) tangential ND trace mass
// (edge-sign folded), frt (nf,1) integral of 1/W. Tables: fsh (nq,4) quad
// shapes, fE (nq,4,2) 2D ND0 shapes, q2 (nq,2) points, qw2 (nq).
// f64 accumulation, OT storage (see hex_masses_impl).
template <typename OT>
static void face_masses_impl(
                 const double* coords4, int64_t nf, const double* fsh,
                 const double* fE, const double* q2, const double* qw2,
                 int64_t nq, const double* es, OT* fh1, OT* fnd,
                 OT* frt) {
    for (int64_t f = 0; f < nf; ++f) {
        const double* X = coords4 + f * 12;  // (4,3)
        double h1[16] = {0}, nd[16] = {0};
        double rt = 0.0;
        for (int64_t q = 0; q < nq; ++q) {
            const double s = q2[2 * q], t = q2[2 * q + 1];
            double F[3][2];
            for (int64_t a = 0; a < 3; ++a) {
                const double v0 = X[a], v1 = X[3 + a], v2 = X[6 + a],
                             v3 = X[9 + a];
                F[a][0] = -(1 - t) * v0 + (1 - t) * v1 + t * v2 - t * v3;
                F[a][1] = -(1 - s) * v0 - s * v1 + s * v2 + (1 - s) * v3;
            }
            double G[2][2] = {{0}};
            for (int64_t a = 0; a < 3; ++a) {
                G[0][0] += F[a][0] * F[a][0];
                G[0][1] += F[a][0] * F[a][1];
                G[1][1] += F[a][1] * F[a][1];
            }
            G[1][0] = G[0][1];
            const double detG = G[0][0] * G[1][1] - G[0][1] * G[1][0];
            const double W = std::sqrt(detG);
            const double w = qw2[q] * W;
            const double* N = fsh + q * 4;
            for (int64_t i = 0; i < 4; ++i)
                for (int64_t j = 0; j <= i; ++j)
                    h1[i * 4 + j] += w * N[i] * N[j];
            // ND trace: M += w * E Ginv E^T; Ginv = [[G11,-G01],[-G01,G00]]/detG
            const double* E = fE + q * 8;
            const double wg = w / detG;
            for (int64_t i = 0; i < 4; ++i) {
                const double a0 = E[2 * i], a1 = E[2 * i + 1];
                const double b0 = G[1][1] * a0 - G[0][1] * a1;
                const double b1 = -G[1][0] * a0 + G[0][0] * a1;
                for (int64_t j = 0; j <= i; ++j)
                    nd[i * 4 + j] += wg * (E[2 * j] * b0 + E[2 * j + 1] * b1);
            }
            rt += qw2[q] / W;
        }
        OT* oh = fh1 + f * 16;
        for (int64_t i = 0; i < 4; ++i)
            for (int64_t j = 0; j <= i; ++j)
                oh[i * 4 + j] = oh[j * 4 + i] = OT(h1[i * 4 + j]);
        OT* on = fnd + f * 16;
        const double* esig = es + f * 4;
        for (int64_t i = 0; i < 4; ++i)
            for (int64_t j = 0; j <= i; ++j) {
                const OT val = OT(nd[i * 4 + j] * esig[i] * esig[j]);
                on[i * 4 + j] = on[j * 4 + i] = val;
            }
        frt[f] = OT(rt);
    }
}

extern "C" {

void face_masses(const double* coords4, int64_t nf, const double* fsh,
                 const double* fE, const double* q2, const double* qw2,
                 int64_t nq, const double* es, double* fh1, double* fnd,
                 double* frt) {
    face_masses_impl<double>(coords4, nf, fsh, fE, q2, qw2, nq, es,
                             fh1, fnd, frt);
}

void face_masses_f32(const double* coords4, int64_t nf, const double* fsh,
                     const double* fE, const double* q2, const double* qw2,
                     int64_t nq, const double* es, float* fh1, float* fnd,
                     float* frt) {
    face_masses_impl<float>(coords4, nf, fsh, fE, q2, qw2, nq, es,
                            fh1, fnd, frt);
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

// ---------------------------------------------------------------------- //
// Chunked COO -> CSR (the _CooBuilder.tocsr hot path). The builder holds
// many (rows, cols, vals) chunks appended stage by stage; scipy's
// coo_matrix(...).tocsr() first concatenates them, then validates/copies
// the index arrays, then sorts and de-duplicates — all O(nnz) passes the
// setup pays per P-snapshot refresh. Here: one counting pass per chunk,
// one scatter pass per chunk (no concatenation), then an in-place
// per-row insertion sort by column (rows are short and arrive mostly
// ordered, so the sort is near-linear). Duplicates are a caller bug by
// builder contract (checked under PARELAG_DEBUG in Python).

template <typename T>
static void coo_fill_impl(const int64_t* r, const int64_t* c, const T* v,
                          int64_t nnz, int64_t* cursor, int64_t* indices,
                          T* vals) {
    for (int64_t i = 0; i < nnz; ++i) {
        const int64_t p = cursor[r[i]]++;
        indices[p] = c[i];
        vals[p] = v[i];
    }
}

template <typename T>
static void csr_sortrows_impl(int64_t nrows, const int64_t* indptr,
                              int64_t* indices, T* vals) {
    for (int64_t row = 0; row < nrows; ++row) {
        const int64_t b = indptr[row], e = indptr[row + 1];
        for (int64_t i = b + 1; i < e; ++i) {
            const int64_t ci = indices[i];
            const T vi = vals[i];
            int64_t j = i - 1;
            while (j >= b && indices[j] > ci) {
                indices[j + 1] = indices[j];
                vals[j + 1] = vals[j];
                --j;
            }
            indices[j + 1] = ci;
            vals[j + 1] = vi;
        }
    }
}

extern "C" {

void coo_count(const int64_t* r, int64_t nnz, int64_t* counts) {
    for (int64_t i = 0; i < nnz; ++i) counts[r[i]]++;
}

void coo_fill_f64(const int64_t* r, const int64_t* c, const double* v,
                  int64_t nnz, int64_t* cursor, int64_t* indices,
                  double* vals) {
    coo_fill_impl<double>(r, c, v, nnz, cursor, indices, vals);
}

void coo_fill_f32(const int64_t* r, const int64_t* c, const float* v,
                  int64_t nnz, int64_t* cursor, int64_t* indices,
                  float* vals) {
    coo_fill_impl<float>(r, c, v, nnz, cursor, indices, vals);
}

void csr_sortrows_f64(int64_t nrows, const int64_t* indptr,
                      int64_t* indices, double* vals) {
    csr_sortrows_impl<double>(nrows, indptr, indices, vals);
}

void csr_sortrows_f32(int64_t nrows, const int64_t* indptr,
                      int64_t* indices, float* vals) {
    csr_sortrows_impl<float>(nrows, indptr, indices, vals);
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// Block-lazy COO chunks. add_blocks_var used to EXPAND every dense block
// into per-entry (row, col) arrays with numpy repeat/tile — at flagship
// scale that expansion alone costs seconds per coarsening stage. These
// kernels consume the block structure directly: block b covers
// rows_cat[row_beg[b]:row_end[b]] x cols_cat[col_beg[b]:col_end[b]] with
// row-major values, so counting and scattering read each index exactly
// once and the expanded COO arrays are never materialized.

template <typename T>
static void coo_fill_blocks_impl(const int64_t* rows_cat,
                                 const int64_t* row_beg,
                                 const int64_t* row_end,
                                 const int64_t* cols_cat,
                                 const int64_t* col_beg,
                                 const int64_t* col_end, const T* v,
                                 int64_t nb, int64_t* cursor,
                                 int64_t* indices, T* vals) {
    int64_t voff = 0;
    for (int64_t b = 0; b < nb; ++b) {
        const int64_t cb = col_beg[b], clen = col_end[b] - cb;
        for (int64_t i = row_beg[b]; i < row_end[b]; ++i) {
            const int64_t r = rows_cat[i];
            int64_t p = cursor[r];
            cursor[r] = p + clen;
            for (int64_t j = 0; j < clen; ++j) {
                indices[p + j] = cols_cat[cb + j];
                vals[p + j] = v[voff + j];
            }
            voff += clen;
        }
    }
}

// Row-wise merge of two sorted CSRs with the same row count (the
// incremental P-snapshot refresh: `a` is the cached snapshot, `b` the
// delta built from the chunks appended since). Two-pointer merge keeps
// every output row sorted whether or not the inputs' rows are disjoint;
// duplicate (row, col) pairs are a caller bug by builder contract.
template <typename T>
static void csr_merge_rows_impl(int64_t nrows, const int64_t* ap,
                                const int64_t* ai, const T* av,
                                const int64_t* bp, const int64_t* bi,
                                const T* bv, const int64_t* cp,
                                int64_t* ci, T* cv) {
    for (int64_t r = 0; r < nrows; ++r) {
        int64_t i = ap[r], j = bp[r], o = cp[r];
        const int64_t ie = ap[r + 1], je = bp[r + 1];
        while (i < ie && j < je) {
            if (ai[i] <= bi[j]) {
                ci[o] = ai[i]; cv[o++] = av[i++];
            } else {
                ci[o] = bi[j]; cv[o++] = bv[j++];
            }
        }
        for (; i < ie; ++i, ++o) { ci[o] = ai[i]; cv[o] = av[i]; }
        for (; j < je; ++j, ++o) { ci[o] = bi[j]; cv[o] = bv[j]; }
    }
}

extern "C" {

void coo_count_blocks(const int64_t* rows_cat, const int64_t* row_beg,
                      const int64_t* row_end, const int64_t* col_beg,
                      const int64_t* col_end, int64_t nb, int64_t* counts) {
    for (int64_t b = 0; b < nb; ++b) {
        const int64_t clen = col_end[b] - col_beg[b];
        for (int64_t i = row_beg[b]; i < row_end[b]; ++i)
            counts[rows_cat[i]] += clen;
    }
}

void coo_fill_blocks_f64(const int64_t* rows_cat, const int64_t* row_beg,
                         const int64_t* row_end, const int64_t* cols_cat,
                         const int64_t* col_beg, const int64_t* col_end,
                         const double* v, int64_t nb, int64_t* cursor,
                         int64_t* indices, double* vals) {
    coo_fill_blocks_impl<double>(rows_cat, row_beg, row_end, cols_cat,
                                 col_beg, col_end, v, nb, cursor, indices,
                                 vals);
}

void coo_fill_blocks_f32(const int64_t* rows_cat, const int64_t* row_beg,
                         const int64_t* row_end, const int64_t* cols_cat,
                         const int64_t* col_beg, const int64_t* col_end,
                         const float* v, int64_t nb, int64_t* cursor,
                         int64_t* indices, float* vals) {
    coo_fill_blocks_impl<float>(rows_cat, row_beg, row_end, cols_cat,
                                col_beg, col_end, v, nb, cursor, indices,
                                vals);
}

void csr_merge_rows_f64(int64_t nrows, const int64_t* ap, const int64_t* ai,
                        const double* av, const int64_t* bp,
                        const int64_t* bi, const double* bv,
                        const int64_t* cp, int64_t* ci, double* cv) {
    csr_merge_rows_impl<double>(nrows, ap, ai, av, bp, bi, bv, cp, ci, cv);
}

void csr_merge_rows_f32(int64_t nrows, const int64_t* ap, const int64_t* ai,
                        const float* av, const int64_t* bp,
                        const int64_t* bi, const float* bv,
                        const int64_t* cp, int64_t* ci, float* cv) {
    csr_merge_rows_impl<float>(nrows, ap, ai, av, bp, bi, bv, cp, ci, cv);
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// Fused coarse-mass gram blocks for the extension stage (pass 3). The
// coarse basis on one agglomerate is B (nu_all x nloc) with structure
//   B[:nu,  :k_ext]              = X[:nu, :k_ext]        (interior ext)
//   B[nu:,  :k_ext]              = Pb                    (boundary traces)
//   B[:nu,  k_ext:k_ext+n_rt]    = X[:nu, k_ext:...]     (RangeT bubbles)
//   B[:nu,  k_ext+n_rt:]         = UN                    (null bubbles)
//   B[nu:,  k_ext:]              = 0
// and the coarse mass block is sym(B^T M B). The numpy version
// materializes the zero-padded basis stack, runs two stacked GEMMs and a
// symmetrization pass (6+ full passes over group-sized temporaries);
// here each item is one cache-resident pass, the bubble columns skip the
// boundary rows entirely, and the output lands straight in the flat
// blk_cat layout. X rows are read through the solution stack's leading
// dimensions (nsys, K) so the Python side passes views, not copies.

template <typename T>
static void ext_gram_impl(const T* Mst, const T* Pbst, const T* Xst,
                          const T* UNst, int64_t nsys, int64_t K,
                          int64_t ldun, int64_t nu_all, int64_t nu,
                          int64_t k_ext, int64_t n_rt, int64_t nn,
                          const int64_t* items, const int64_t* out_pos,
                          int64_t ms, T* out_cat, double* t1) {
    const int64_t nloc = k_ext + n_rt + nn;
    const int64_t nb = nu_all - nu;
    // numpy computed sym(B^T M B) as (C + C^T)/2, which equals
    // B^T ((M + M^T)/2) B — symmetrize M once per item so the mirrored
    // upper triangle below reproduces that result exactly
    std::vector<double> msym((size_t)(nu_all * nu_all));
    double* Ms = msym.data();
    for (int64_t t = 0; t < ms; ++t) {
        const int64_t i = items[t];
        const T* M = Mst + i * nu_all * nu_all;
        const T* Pb = Pbst + i * nb * k_ext;
        const T* X = Xst + i * nsys * K;
        const T* UN = UNst ? UNst + i * nu * ldun : nullptr;
        for (int64_t r = 0; r < nu_all; ++r)
            for (int64_t l = 0; l < nu_all; ++l)
                Ms[r * nu_all + l] = 0.5 * ((double)M[r * nu_all + l]
                                            + (double)M[l * nu_all + r]);
        // T1 = Msym @ B (nu_all x nloc), exploiting the zero boundary
        // rows of the bubble columns
        for (int64_t r = 0; r < nu_all; ++r) {
            const double* Mr = Ms + r * nu_all;
            double* t1r = t1 + r * nloc;
            for (int64_t j = 0; j < k_ext; ++j) {
                double acc = 0.0;
                for (int64_t l = 0; l < nu; ++l)
                    acc += (double)Mr[l] * (double)X[l * K + j];
                for (int64_t l = 0; l < nb; ++l)
                    acc += (double)Mr[nu + l] * (double)Pb[l * k_ext + j];
                t1r[j] = acc;
            }
            for (int64_t j = 0; j < n_rt; ++j) {
                double acc = 0.0;
                for (int64_t l = 0; l < nu; ++l)
                    acc += (double)Mr[l] * (double)X[l * K + k_ext + j];
                t1r[k_ext + j] = acc;
            }
            for (int64_t j = 0; j < nn; ++j) {
                double acc = 0.0;
                for (int64_t l = 0; l < nu; ++l)
                    acc += (double)Mr[l] * (double)UN[l * ldun + j];
                t1r[k_ext + n_rt + j] = acc;
            }
        }
        // out = sym(B^T @ T1): ext rows read all nu_all basis rows,
        // bubble rows only the nu interior ones
        T* o = out_cat + out_pos[t];
        for (int64_t a = 0; a < nloc; ++a) {
            for (int64_t b = a; b < nloc; ++b) {
                double acc = 0.0;
                if (a < k_ext) {
                    for (int64_t l = 0; l < nu; ++l)
                        acc += (double)X[l * K + a] * t1[l * nloc + b];
                    for (int64_t l = 0; l < nb; ++l)
                        acc += (double)Pb[l * k_ext + a]
                             * t1[(nu + l) * nloc + b];
                } else if (a < k_ext + n_rt) {
                    for (int64_t l = 0; l < nu; ++l)
                        acc += (double)X[l * K + k_ext + (a - k_ext)]
                             * t1[l * nloc + b];
                } else {
                    for (int64_t l = 0; l < nu; ++l)
                        acc += (double)UN[l * ldun + (a - k_ext - n_rt)]
                             * t1[l * nloc + b];
                }
                // sym(B^T M B) via the (b, a) transpose pair: for exact
                // symmetry average with the mirrored accumulation
                o[a * nloc + b] = (T)acc;
            }
        }
        // mirror the strict upper triangle (B^T M B is symmetric up to
        // roundoff in M itself; M is symmetrized upstream, and averaging
        // (C + C^T)/2 of an exactly-computed product equals the product
        // when M = M^T, so mirroring the upper triangle is exact)
        for (int64_t a = 0; a < nloc; ++a)
            for (int64_t b = a + 1; b < nloc; ++b)
                o[b * nloc + a] = o[a * nloc + b];
    }
}

// B = W[:n_pint, :] * Dloc per agglomerate, straight from the fine
// derivative CSR. Dloc (the AE-local dense derivative block) is never
// materialized: the extension stage used to dense-extract D into
// (np_all x nu_all) blocks (hundreds of MB per stage at flagship scale)
// only to multiply them once — here each AE's B accumulates from D's
// 2-4 nonzeros per row while W is cache-hot.
template <typename I, typename T>
static void wd_blocks_impl(const I* Dp, const I* Di, const T* Dv,
                           const int64_t* p_cat, const int64_t* p_off,
                           const int64_t* u_cat, const int64_t* u_off,
                           const int64_t* n_pint, const T* W_cat,
                           const int64_t* W_off, int64_t* pos, T* out_cat,
                           const int64_t* out_off, int64_t n_ae) {
    for (int64_t a = 0; a < n_ae; ++a) {
        const int64_t nu = u_off[a + 1] - u_off[a];
        const int64_t np = p_off[a + 1] - p_off[a];
        const int64_t ni = n_pint[a];
        const int64_t* us = u_cat + u_off[a];
        const int64_t* ps = p_cat + p_off[a];
        const T* W = W_cat + W_off[a];
        T* out = out_cat + out_off[a];
        for (int64_t j = 0; j < nu; ++j) pos[us[j]] = j;
        for (int64_t k = 0; k < ni * nu; ++k) out[k] = (T)0;
        for (int64_t p = 0; p < np; ++p) {
            const I row = (I)ps[p];
            for (I e = Dp[row]; e < Dp[row + 1]; ++e) {
                const int64_t j = pos[Di[e]];
                if (j < 0) continue;
                const T v = Dv[e];
                for (int64_t q = 0; q < ni; ++q)
                    out[q * nu + j] += W[q * np + p] * v;
            }
        }
        for (int64_t j = 0; j < nu; ++j) pos[us[j]] = -1;
    }
}

extern "C" {

void wd_blocks_f64(const int64_t* Dp, const int64_t* Di, const double* Dv,
                   const int64_t* p_cat, const int64_t* p_off,
                   const int64_t* u_cat, const int64_t* u_off,
                   const int64_t* n_pint, const double* W_cat,
                   const int64_t* W_off, int64_t* pos, double* out_cat,
                   const int64_t* out_off, int64_t n_ae) {
    wd_blocks_impl<int64_t, double>(Dp, Di, Dv, p_cat, p_off, u_cat, u_off,
                                    n_pint, W_cat, W_off, pos, out_cat,
                                    out_off, n_ae);
}

void wd_blocks_f32(const int64_t* Dp, const int64_t* Di, const float* Dv,
                   const int64_t* p_cat, const int64_t* p_off,
                   const int64_t* u_cat, const int64_t* u_off,
                   const int64_t* n_pint, const float* W_cat,
                   const int64_t* W_off, int64_t* pos, float* out_cat,
                   const int64_t* out_off, int64_t n_ae) {
    wd_blocks_impl<int64_t, float>(Dp, Di, Dv, p_cat, p_off, u_cat, u_off,
                                   n_pint, W_cat, W_off, pos, out_cat,
                                   out_off, n_ae);
}

void wd_blocks_i32_f64(const int32_t* Dp, const int32_t* Di,
                       const double* Dv, const int64_t* p_cat,
                       const int64_t* p_off, const int64_t* u_cat,
                       const int64_t* u_off, const int64_t* n_pint,
                       const double* W_cat, const int64_t* W_off,
                       int64_t* pos, double* out_cat,
                       const int64_t* out_off, int64_t n_ae) {
    wd_blocks_impl<int32_t, double>(Dp, Di, Dv, p_cat, p_off, u_cat, u_off,
                                    n_pint, W_cat, W_off, pos, out_cat,
                                    out_off, n_ae);
}

void wd_blocks_i32_f32(const int32_t* Dp, const int32_t* Di,
                       const float* Dv, const int64_t* p_cat,
                       const int64_t* p_off, const int64_t* u_cat,
                       const int64_t* u_off, const int64_t* n_pint,
                       const float* W_cat, const int64_t* W_off,
                       int64_t* pos, float* out_cat,
                       const int64_t* out_off, int64_t n_ae) {
    wd_blocks_impl<int32_t, float>(Dp, Di, Dv, p_cat, p_off, u_cat, u_off,
                                   n_pint, W_cat, W_off, pos, out_cat,
                                   out_off, n_ae);
}

void ext_gram_f64(const double* Mst, const double* Pbst, const double* Xst,
                  const double* UNst, int64_t nsys, int64_t K, int64_t ldun,
                  int64_t nu_all, int64_t nu, int64_t k_ext, int64_t n_rt,
                  int64_t nn, const int64_t* items, const int64_t* out_pos,
                  int64_t ms, double* out_cat, double* t1) {
    ext_gram_impl<double>(Mst, Pbst, Xst, UNst, nsys, K, ldun, nu_all, nu,
                          k_ext, n_rt, nn, items, out_pos, ms, out_cat, t1);
}

void ext_gram_f32(const float* Mst, const float* Pbst, const float* Xst,
                  const float* UNst, int64_t nsys, int64_t K, int64_t ldun,
                  int64_t nu_all, int64_t nu, int64_t k_ext, int64_t n_rt,
                  int64_t nn, const int64_t* items, const int64_t* out_pos,
                  int64_t ms, float* out_cat, double* t1) {
    ext_gram_impl<float>(Mst, Pbst, Xst, UNst, nsys, K, ldun, nu_all, nu,
                         k_ext, n_rt, nn, items, out_pos, ms, out_cat, t1);
}

}  // extern "C"
