// Native CSR -> packed-dense densifier for the infercnv host pipeline.
//
// The Python fallback (ops/infercnv_kernel.py:pack_csr) materializes four
// full-nnz temporaries (lut gather, keep mask, row repeat, boolean filter)
// before a single-threaded fancy-index scatter.  This version makes ONE pass
// over the nnz per row and scatters straight into the (row-major) output,
// parallelized over row ranges (rows are disjoint, so no synchronization).
//
// The output buffer must be pre-zeroed by the caller (np.zeros -> calloc:
// untouched columns stay on the kernel zero page, so the scatter only pays
// for the ~density fraction of the matrix it actually writes).
//
// Replaces the densification the reference performs per worker chunk
// (reference: tl/_infercnv.py:115-137,419 — scipy CSR slice + densify).

#include <cstdint>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// lut: masked-gene index -> packed output column, -1 = gene unused.
// Returns the number of values written (nnz kept).
int64_t pack_csr_f32(const int64_t* indptr, const int32_t* indices,
                     const float* data, int64_t n_rows, const int64_t* lut,
                     int64_t out_width, float* out) {
  int64_t kept = 0;
#pragma omp parallel for schedule(static) reduction(+ : kept)
  for (int64_t r = 0; r < n_rows; ++r) {
    float* row = out + r * out_width;
    const int64_t lo = indptr[r], hi = indptr[r + 1];
    for (int64_t j = lo; j < hi; ++j) {
      const int64_t c = lut[indices[j]];
      if (c >= 0) {
        row[c] = data[j];
        ++kept;
      }
    }
  }
  return kept;
}

int64_t pack_csr_f64(const int64_t* indptr, const int32_t* indices,
                     const double* data, int64_t n_rows, const int64_t* lut,
                     int64_t out_width, double* out) {
  int64_t kept = 0;
#pragma omp parallel for schedule(static) reduction(+ : kept)
  for (int64_t r = 0; r < n_rows; ++r) {
    double* row = out + r * out_width;
    const int64_t lo = indptr[r], hi = indptr[r + 1];
    for (int64_t j = lo; j < hi; ++j) {
      const int64_t c = lut[indices[j]];
      if (c >= 0) {
        row[c] = data[j];
        ++kept;
      }
    }
  }
  return kept;
}

// Dense (row-major src, any stride = n_cols) -> packed-dense column remap.
// Used for dense expression blocks; same LUT contract as pack_csr_*.
void pack_dense_f32(const float* src, int64_t n_rows, int64_t n_cols,
                    const int64_t* lut, int64_t out_width, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* in_row = src + r * n_cols;
    float* row = out + r * out_width;
    for (int64_t c = 0; c < n_cols; ++c) {
      const int64_t p = lut[c];
      if (p >= 0) row[p] = in_row[c];
    }
  }
}

void pack_dense_f64(const double* src, int64_t n_rows, int64_t n_cols,
                    const int64_t* lut, int64_t out_width, double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const double* in_row = src + r * n_cols;
    double* row = out + r * out_width;
    for (int64_t c = 0; c < n_cols; ++c) {
      const int64_t p = lut[c];
      if (p >= 0) row[p] = in_row[c];
    }
  }
}

}  // extern "C"
