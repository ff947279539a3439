// Native blocked-ELL packer.
//
// Packs a CSR matrix into the blocked-ELL layout consumed by the Pallas
// SpMM kernel (see stgcn_tpu/kernels/spmm.py): per block-row, the distinct
// nonzero 128x128 tiles in ascending block-column order, padded to a
// rectangular [n_block_rows, max_b] shape.
//
// The scipy path (csr.tobsr + python fill loop) takes tens of seconds at
// 100k vertices; this runs the same packing in a single pass over the CSR
// arrays. Exposed through ctypes (stgcn_tpu/native/__init__.py) with the
// python packer as a behaviour-identical fallback.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pass 1: distinct block-columns per block-row. Returns max over rows.
int bcsr_analyze(const int32_t* indptr, const int32_t* indices,
                 int64_t n_rows, int64_t n_cols, int32_t bs,
                 int32_t* counts /* [nbr] */) {
  const int64_t nbr = (n_rows + bs - 1) / bs;
  const int64_t nbc = (n_cols + bs - 1) / bs;
  std::vector<int64_t> stamp(nbc, -1);
  int32_t max_b = 0;
  for (int64_t br = 0; br < nbr; ++br) {
    int32_t n_slots = 0;
    const int64_t row_end = std::min<int64_t>((br + 1) * bs, n_rows);
    for (int64_t r = br * bs; r < row_end; ++r) {
      for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
        const int64_t bc = indices[p] / bs;
        if (stamp[bc] != br) {
          stamp[bc] = br;
          ++n_slots;
        }
      }
    }
    counts[br] = n_slots;
    max_b = std::max(max_b, n_slots);
  }
  return max_b;
}

// Pass 2: fill tiles. data must be zero-initialized,
// shape [nbr, max_b, bs, bs]; cols zero-initialized [nbr, max_b].
void bcsr_pack(const int32_t* indptr, const int32_t* indices,
               const float* vals, int64_t n_rows, int64_t n_cols,
               int32_t bs, int32_t max_b,
               float* data, int32_t* cols, const int32_t* counts) {
  const int64_t nbr = (n_rows + bs - 1) / bs;
  const int64_t nbc = (n_cols + bs - 1) / bs;
  std::vector<int32_t> slot_of(nbc);
  std::vector<int64_t> stamp(nbc, -1);
  std::vector<int64_t> bcs;
  for (int64_t br = 0; br < nbr; ++br) {
    // collect distinct block-cols, ascending (match scipy tobsr ordering)
    bcs.clear();
    const int64_t row_end = std::min<int64_t>((br + 1) * bs, n_rows);
    for (int64_t r = br * bs; r < row_end; ++r) {
      for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
        const int64_t bc = indices[p] / bs;
        if (stamp[bc] != br) {
          stamp[bc] = br;
          bcs.push_back(bc);
        }
      }
    }
    std::sort(bcs.begin(), bcs.end());
    for (size_t s = 0; s < bcs.size(); ++s) {
      slot_of[bcs[s]] = static_cast<int32_t>(s);
      cols[br * max_b + s] = static_cast<int32_t>(bcs[s]);
    }
    // fill
    for (int64_t r = br * bs; r < row_end; ++r) {
      const int64_t local_r = r - br * bs;
      for (int32_t p = indptr[r]; p < indptr[r + 1]; ++p) {
        const int64_t c = indices[p];
        const int64_t bc = c / bs;
        const int64_t slot = slot_of[bc];
        data[((br * max_b + slot) * bs + local_r) * bs + (c - bc * bs)] =
            vals[p];
      }
    }
  }
}

}  // extern "C"
