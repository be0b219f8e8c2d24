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

// Cell->face ELL table construction (the mesh/device.py assembly block):
// each face lands in its owner's row and, when the neighbor is a distinct
// cell, in the neighbor's row.  Row-slot order matches the python
// stable-sort layout: all owner entries first (face order), then all
// neighbor entries (face order).  Replaces an argsort over 2*nf entries.
// cf_face/cf_mask/cf_is_owner/cf_nbr: n_cells*K caller-allocated buffers,
// zero/self-initialized here.  face_valid may be null (all valid).
void fvm_cf_build(int64_t n_cells, int64_t nf, int64_t K,
                  const int64_t* owner, const int64_t* nbr,
                  const uint8_t* face_valid, int64_t* cf_face,
                  uint8_t* cf_mask, uint8_t* cf_is_owner, int64_t* cf_nbr) {
  for (int64_t i = 0; i < n_cells; ++i) {
    int64_t* cf = cf_face + i * K;
    uint8_t* cm = cf_mask + i * K;
    uint8_t* co = cf_is_owner + i * K;
    int64_t* cn = cf_nbr + i * K;
    for (int64_t k = 0; k < K; ++k) {
      cf[k] = 0;
      cm[k] = 0;
      co[k] = 0;
      cn[k] = i;
    }
  }
  std::vector<int64_t> fill(n_cells, 0);
  for (int64_t f = 0; f < nf; ++f) {
    if (face_valid && !face_valid[f]) continue;
    int64_t o = owner[f];
    int64_t s = fill[o]++;
    cf_face[o * K + s] = f;
    cf_mask[o * K + s] = 1;
    cf_is_owner[o * K + s] = 1;
    cf_nbr[o * K + s] = nbr[f];
  }
  for (int64_t f = 0; f < nf; ++f) {
    if (face_valid && !face_valid[f]) continue;
    int64_t o = owner[f];
    int64_t nb = nbr[f];
    if (nb == o) continue;
    int64_t s = fill[nb]++;
    cf_face[nb * K + s] = f;
    cf_mask[nb * K + s] = 1;
    cf_is_owner[nb * K + s] = 0;
    cf_nbr[nb * K + s] = o;
  }
  // cf_is_owner semantics for padded slots follow the python layout
  // (owner[0] == cell 0 comparisons); padded slots stay mask=0 and the
  // callers never read their is_owner, but match python for slot 0 pads
  for (int64_t i = 0; i < n_cells; ++i) {
    for (int64_t k = fill[i]; k < K; ++k) {
      cf_is_owner[i * K + k] = (owner[0] == i) ? 1 : 0;
    }
  }
}

}  // extern "C"
