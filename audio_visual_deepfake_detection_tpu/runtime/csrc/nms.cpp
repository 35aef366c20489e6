// Host-side 1-D (soft-)NMS — native C++ oracle and CPU fallback.
//
// Semantics match the reference extension (libs/utils/csrc/nms_cpu.cpp):
// greedy max-score selection; per-pass decay of the remaining candidates
// (hard / linear / gaussian); elimination when a decayed score falls below
// min_score; segment areas carry a +1e-6 epsilon. Implemented as a plain
// C ABI (no torch, no pybind) loaded via ctypes.
//
// Edge semantics kept REFERENCE-exact on purpose (nms_cpu.cpp:90-151):
//  - exact score ties resolve in the swap-mutated array order (strict `<`
//    selection), which can differ from the device path's argmax over fixed
//    original positions — only on bit-equal floats;
//  - elimination uses `sc[p] < min_score`, so with min_score <= 0 a hard-NMS
//    (method 0) suppressed candidate survives at score 0 and can be
//    re-emitted, exactly like the reference. Production wrappers always pass
//    min_score > 0 (test_cfg.min_score, config.py defaults).
//
// Build: see runtime/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Greedy soft-NMS.
//   segs:    n x 2 (start, end), row-major
//   scores:  n
//   method:  0 = hard, 1 = linear, 2 = gaussian
// Outputs (caller-allocated, capacity max_out):
//   out_segs: max_out x 2, out_scores: max_out
// Returns the number of emitted detections (<= max_out).
int softnms_1d(const float* segs, const float* scores, int n,
               float iou_threshold, float sigma, float min_score, int method,
               int max_out, float* out_segs, float* out_scores,
               int64_t* out_inds) {
  std::vector<float> x1(n), x2(n), sc(scores, scores + n), area(n);
  std::vector<int64_t> ind(n);
  for (int i = 0; i < n; ++i) {
    x1[i] = segs[2 * i];
    x2[i] = segs[2 * i + 1];
    area[i] = x2[i] - x1[i] + 1e-6f;
    ind[i] = i;
  }

  int count = 0;
  int alive = n;
  for (int i = 0; i < alive && count < max_out; ++i) {
    // selection: max score among [i, alive)
    int best = i;
    for (int p = i + 1; p < alive; ++p)
      if (sc[p] > sc[best]) best = p;
    std::swap(x1[i], x1[best]);
    std::swap(x2[i], x2[best]);
    std::swap(sc[i], sc[best]);
    std::swap(area[i], area[best]);
    std::swap(ind[i], ind[best]);

    out_segs[2 * count] = x1[i];
    out_segs[2 * count + 1] = x2[i];
    out_scores[count] = sc[i];
    out_inds[count] = ind[i];
    ++count;

    // decay + eliminate the tail
    for (int p = i + 1; p < alive; ++p) {
      float xx1 = std::max(x1[i], x1[p]);
      float xx2 = std::min(x2[i], x2[p]);
      float inter = std::max(0.0f, xx2 - xx1);
      float ovr = inter / (area[i] + area[p] - inter);
      float w = 1.0f;
      if (method == 0) {
        if (ovr >= iou_threshold) w = 0.0f;
      } else if (method == 1) {
        if (ovr >= iou_threshold) w = 1.0f - ovr;
      } else {
        w = std::exp(-(ovr * ovr) / sigma);
      }
      sc[p] *= w;
      if (sc[p] < min_score) {
        // swap-with-last elimination
        --alive;
        x1[p] = x1[alive];
        x2[p] = x2[alive];
        sc[p] = sc[alive];
        area[p] = area[alive];
        ind[p] = ind[alive];
        --p;
      }
    }
  }
  return count;
}

// Vanilla greedy NMS on pre-sorted-by-score candidates.
// Returns number of kept indices written to out_inds (capacity max_out).
int nms_1d(const float* segs, const float* scores, int n, float iou_threshold,
           int max_out, int64_t* out_inds) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> keep(n, 1);
  int count = 0;
  for (int oi = 0; oi < n && count < max_out; ++oi) {
    int i = order[oi];
    if (!keep[oi]) continue;
    out_inds[count++] = i;
    float a1 = segs[2 * i], a2 = segs[2 * i + 1];
    float ai = a2 - a1 + 1e-6f;
    for (int oj = oi + 1; oj < n; ++oj) {
      if (!keep[oj]) continue;
      int j = order[oj];
      float b1 = segs[2 * j], b2 = segs[2 * j + 1];
      float inter = std::max(0.0f, std::min(a2, b2) - std::max(a1, b1));
      float ovr = inter / (ai + (b2 - b1 + 1e-6f) - inter);
      if (ovr >= iou_threshold) keep[oj] = 0;
    }
  }
  return count;
}

}  // extern "C"
