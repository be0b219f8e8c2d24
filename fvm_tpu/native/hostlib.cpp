// fvm_tpu native host library: mesh-graph setup loops that are O(n) but
// python-loop-bound at 1M+ cells (AMG aggregation, graph coloring).
//
// TPU-native counterpart of the reference's C++ host-side setup code
// (reference: src/fvm/src/modules/fvmbase/CRMatrix.h:468 createCoarsening;
// the reference runs these loops in C++ too — only the *solve* moved to the
// TPU).  Built by fvm_tpu.native.build with g++ -O3; loaded via ctypes with
// a pure-numpy fallback, so the package works without a toolchain.
//
// All functions are extern "C", operate on caller-allocated buffers, and
// must produce bit-identical results to the python reference
// implementations (fvm_tpu/linear/amg.py:aggregate,
// fvm_tpu/ops/ell.py:greedy_coloring) — the tests compare convergence
// behavior that depends on the exact aggregate/color assignment.

#include <cstdint>
#include <vector>

extern "C" {

// Greedy aggregation of an ELL row graph (cols: n x K, mask: n x K).
// agg_out: n entries, filled with compressed aggregate ids.
// Returns the number of aggregates.
int64_t fvm_aggregate(int64_t n, int64_t K, const int64_t* cols,
                      const uint8_t* mask, int64_t* agg) {
  for (int64_t i = 0; i < n; ++i) agg[i] = -1;
  int64_t next_agg = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    agg[i] = next_agg;
    const int64_t* ci = cols + i * K;
    const uint8_t* mi = mask + i * K;
    for (int64_t k = 0; k < K; ++k) {
      if (mi[k]) {
        int64_t j = ci[k];
        if (agg[j] < 0) agg[j] = next_agg;
      }
    }
    ++next_agg;
  }
  // attach singleton aggregates to a neighbor (same order as python ref)
  std::vector<int64_t> sizes(next_agg, 0);
  for (int64_t i = 0; i < n; ++i) ++sizes[agg[i]];
  for (int64_t i = 0; i < n; ++i) {
    if (sizes[agg[i]] == 1) {
      const int64_t* ci = cols + i * K;
      const uint8_t* mi = mask + i * K;
      for (int64_t k = 0; k < K; ++k) {
        if (mi[k] && agg[ci[k]] != agg[i]) {
          int64_t old = agg[i];
          agg[i] = agg[ci[k]];
          --sizes[old];
          ++sizes[agg[i]];
          break;
        }
      }
    }
  }
  // compress ids preserving order of first appearance by id value
  // (python: np.unique(agg) -> sorted used ids -> remap)
  std::vector<int64_t> remap(next_agg, -1);
  int64_t nc = 0;
  for (int64_t a = 0; a < next_agg; ++a) {
    if (sizes[a] > 0) remap[a] = nc++;
  }
  for (int64_t i = 0; i < n; ++i) agg[i] = remap[agg[i]];
  return nc;
}

// Greedy graph coloring; color_out: n entries. Returns number of colors.
int64_t fvm_greedy_color(int64_t n, int64_t K, const int64_t* cols,
                         const uint8_t* mask, int64_t* color) {
  for (int64_t i = 0; i < n; ++i) color[i] = -1;
  int64_t ncolors = 0;
  std::vector<uint8_t> used;
  for (int64_t i = 0; i < n; ++i) {
    used.assign(ncolors + 1, 0);
    const int64_t* ci = cols + i * K;
    const uint8_t* mi = mask + i * K;
    for (int64_t k = 0; k < K; ++k) {
      if (mi[k]) {
        int64_t c = color[ci[k]];
        if (c >= 0) used[c] = 1;
      }
    }
    int64_t c = 0;
    while (used[c]) ++c;
    color[i] = c;
    if (c + 1 > ncolors) ncolors = c + 1;
  }
  return ncolors;
}

}  // extern "C"
