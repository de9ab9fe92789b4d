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

// ---------------------------------------------------------------------------
// CSR batch -> compact remapped COO (cols/vals/counts) for the device-side
// densify path (ops/sparse_ingest.py).  The numpy version materializes a
// full-nnz lut gather + keep mask + compaction; this makes one counting pass
// and one writing pass, both parallel over rows (disjoint output ranges via
// a serial prefix over the per-row kept counts).
//
// cols_is16:   write int16 column ids (packed width < 32768) else int32.
// vals_mode:   0 = float32 out, 1 = bfloat16 (round-to-nearest-even) out
//              packed as uint16 — the reduced-precision transfer path
//              converts during the same pass instead of a numpy astype.
// cap:         capacity of cols_out/vals_out.  Checked BETWEEN the counting
//              and writing passes: on overflow returns -(needed nnz) having
//              written nothing to cols/vals (counts_out is still filled) —
//              the caller must never learn about an overflow from a
//              corrupted heap.
// Returns total kept nnz, or its negation on capacity overflow.
// ---------------------------------------------------------------------------

static inline uint16_t f32_to_bf16(float v) {
  uint32_t u;
  __builtin_memcpy(&u, &v, 4);
  if ((u & 0x7fffffffu) > 0x7f800000u) {
    // NaN: rounding would carry into the exponent (-> Inf) or the sign bit.
    // ml_dtypes canonicalizes EVERY NaN to 0x7FC0/0xFFC0 (payload dropped);
    // emit the same so native and numpy transfer buffers stay bitwise-equal.
    return (uint16_t)(0x7fc0u | ((u >> 16) & 0x8000u));
  }
  const uint32_t rounding = 0x7fffu + ((u >> 16) & 1u);
  return (uint16_t)((u + rounding) >> 16);
}

int64_t coo_remap_f32(const int64_t* indptr, const int32_t* indices,
                      const float* data, int64_t n_rows, const int64_t* lut,
                      int64_t cap, int64_t* row_offsets /* scratch, n_rows+1 */,
                      void* cols_out, int32_t cols_is16, void* vals_out,
                      int32_t vals_mode, int32_t* counts_out) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t kept = 0;
    for (int64_t j = indptr[r]; j < indptr[r + 1]; ++j) {
      kept += (lut[indices[j]] >= 0);
    }
    counts_out[r] = (int32_t)kept;
  }
  row_offsets[0] = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    row_offsets[r + 1] = row_offsets[r] + counts_out[r];
  }
  if (row_offsets[n_rows] > cap) return -row_offsets[n_rows];
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t w = row_offsets[r];
    for (int64_t j = indptr[r]; j < indptr[r + 1]; ++j) {
      const int64_t c = lut[indices[j]];
      if (c < 0) continue;
      if (cols_is16) {
        ((int16_t*)cols_out)[w] = (int16_t)c;
      } else {
        ((int32_t*)cols_out)[w] = (int32_t)c;
      }
      if (vals_mode == 1) {
        ((uint16_t*)vals_out)[w] = f32_to_bf16(data[j]);
      } else {
        ((float*)vals_out)[w] = data[j];
      }
      ++w;
    }
  }
  return row_offsets[n_rows];
}

// ---------------------------------------------------------------------------
// Dense (rows x cols) f32 -> CSR triple, for the result assembly after the
// device noise gate zeroes most entries (scipy's csr_matrix(dense) scans
// single-threaded; this is two parallel passes).
// ---------------------------------------------------------------------------

void dense_nnz_rows_f32(const float* src, int64_t n_rows, int64_t n_cols,
                        int64_t* row_nnz) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* row = src + r * n_cols;
    int64_t k = 0;
    for (int64_t c = 0; c < n_cols; ++c) k += (row[c] != 0.0f);
    row_nnz[r] = k;
  }
}

void dense_fill_csr_f32(const float* src, int64_t n_rows, int64_t n_cols,
                        const int64_t* indptr, int32_t* indices, float* data) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* row = src + r * n_cols;
    int64_t w = indptr[r];
    for (int64_t c = 0; c < n_cols; ++c) {
      if (row[c] != 0.0f) {
        indices[w] = (int32_t)c;
        data[w] = row[c];
        ++w;
      }
    }
  }
}

}  // extern "C"
