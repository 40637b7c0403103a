// Host-side sparse assembly kernels (COO -> padded ELL).
//
// The TPU framework's native runtime layer: the reference's only native
// code is the external LAPACK/BLAS binary it links against
// (/root/reference CMakeLists.txt:29-49); the device-side equivalents of
// those routines live in XLA/Pallas, while THIS file covers the
// host-side data path — one-time operator assembly, which for the
// north-star scales (1e7+ rows, ~5e8 nnz) is worth doing without
// numpy's intermediate fancy-index copies.
//
// Exposed via ctypes (see __init__.py); every function is exercised
// against the pure-numpy fallback in tests/test_native.py.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

template <typename T>
int64_t ell_from_coo(int64_t n, int64_t nnz, const int64_t* rows,
                     const int64_t* cols, const T* vals, int64_t L,
                     int32_t* indices_out, T* values_out) {
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    return cols[a] < cols[b];
  });

  if (L > 0) {
    for (int64_t r = 0; r < n; ++r) {
      for (int64_t l = 0; l < L; ++l) {
        indices_out[r * L + l] = static_cast<int32_t>(r);
        values_out[r * L + l] = T(0);
      }
    }
  }

  int64_t maxcount = 0;
  int64_t i = 0;
  while (i < nnz) {
    const int64_t r = rows[order[i]];
    if (r < 0 || r >= n) return -1;
    int64_t slot = 0;
    while (i < nnz && rows[order[i]] == r) {
      const int64_t c = cols[order[i]];
      if (c < 0 || c >= n) return -1;
      T s = T(0);
      while (i < nnz && rows[order[i]] == r && cols[order[i]] == c) {
        s += vals[order[i]];
        ++i;
      }
      if (L > 0 && slot < L) {
        indices_out[r * L + slot] = static_cast<int32_t>(c);
        values_out[r * L + slot] = s;
      }
      ++slot;
    }
    maxcount = std::max(maxcount, slot);
  }
  return maxcount;
}

}  // namespace

extern "C" {

// Returns the max number of unique columns in any row (the required ELL
// width), or -1 on out-of-range indices. With L == 0 only counts; with
// L > 0 also fills the (n, L) row-major padded tables (padded slots:
// index = own row, value = 0). Duplicate (row, col) entries are summed.
int64_t ell_from_coo_f64(int64_t n, int64_t nnz, const int64_t* rows,
                         const int64_t* cols, const double* vals, int64_t L,
                         int32_t* indices_out, double* values_out) {
  return ell_from_coo<double>(n, nnz, rows, cols, vals, L, indices_out,
                              values_out);
}

int64_t ell_from_coo_f32(int64_t n, int64_t nnz, const int64_t* rows,
                         const int64_t* cols, const float* vals, int64_t L,
                         int32_t* indices_out, float* values_out) {
  return ell_from_coo<float>(n, nnz, rows, cols, vals, L, indices_out,
                             values_out);
}

}  // extern "C"
