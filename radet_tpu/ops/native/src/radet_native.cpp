// radet-tpu native host ops (C ABI, loaded via ctypes).
//
// TPU-native equivalents of the reference's libtorch CPU extensions
// (/root/reference/radet/ops/{bbox2distance,vote,cluster}/*.cpp), written
// against plain buffers so they need no torch:
//   - mbd_transform: raster-scan Minimum Barrier Distance from seed points
//     (FastMBD: Zhang et al., "Minimum Barrier Salient Object Detection at
//     80 FPS"), with the reference's spatial penalty alpha^2/size_factor*d^2
//     (bbox2distance_ext.cpp:7-124);
//   - gdt_transform: two-pass chamfer geodesic distance over an edge-cost
//     map, weights 1/2 and sqrt(2)/2 (bbox2distance_ext.cpp:135-228);
//   - vote_nms: greedy per-class clustering by descending cluster score with
//     weighted coordinate voting + 1-sigma outlier rejection
//     (vote_ext.cpp:70-207), optional global single-instance-per-class mode
//     (:210-353);
//   - nms_cluster: greedy NMS that labels every box with its cluster id and
//     reports cluster sizes instead of suppressing (cluster_ext.cpp:4-87).
//
// These are host-side utilities: the hot inference path runs vote-NMS on
// device (radet_tpu/ops/vote_nms.py); this library serves the data pipeline
// (mask-free distance maps), CPU fallbacks, and oracle cross-checks.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Minimum Barrier Distance (raster-scan approximation)
// ---------------------------------------------------------------------------
void mbd_transform(const uint8_t* image,  // HxWx3
                   int h, int w,
                   const int64_t* seeds_x, const int64_t* seeds_y, int n_seeds,
                   float alpha, int niter, int base_size,
                   double* dmap /* HxW out */) {
  const int n = h * w;
  double size_factor = 400.0;
  if ((double)h * w >= (double)base_size * base_size)
    size_factor = 400.0 * ((double)(w * h) / ((double)base_size * base_size));
  const double factor = (double)alpha * alpha / size_factor;

  std::vector<int32_t> label(n, -1);
  std::vector<uint8_t> hi(image, image + 3 * n);  // running barrier max
  std::vector<uint8_t> lo(image, image + 3 * n);  // running barrier min
  std::fill(dmap, dmap + n, 255.0);
  for (int s = 0; s < n_seeds; s++) {
    const int idx = (int)seeds_y[s] * w + (int)seeds_x[s];
    label[idx] = s;
    dmap[idx] = 0.0;
  }

  for (int it = 0; it < niter; it++) {
    const bool fwd = (it % 2 == 0);
    const int y0 = fwd ? 0 : h - 1, y1 = fwd ? h : -1;
    const int x0 = fwd ? 0 : w - 1, x1 = fwd ? w : -1;
    const int step = fwd ? 1 : -1;
    // forward pass looks at (x-1, y) and (x, y-1); backward at (x+1, y), (x, y+1)
    const int offs[2][2] = {{fwd ? -1 : 1, 0}, {0, fwd ? -1 : 1}};  // (dx, dy)

    for (int y = y0; y != y1; y += step) {
      for (int x = x0; x != x1; x += step) {
        const int ci = y * w + x;
        const uint8_t* cur = image + 3 * ci;
        for (int k = 0; k < 2; k++) {
          const int nx = x + offs[k][0];
          const int ny = y + offs[k][1];
          if (nx < 0 || nx >= w || ny < 0 || ny >= h) continue;
          const int nbr = ny * w + nx;
          const int32_t nlabel = label[nbr];
          if (nlabel < 0) continue;
          uint8_t maxc[3], minc[3];
          int barrier = 0;
          for (int c = 0; c < 3; c++) {
            maxc[c] = std::max(hi[3 * nbr + c], cur[c]);
            minc[c] = std::min(lo[3 * nbr + c], cur[c]);
            barrier = std::max(barrier, (int)maxc[c] - (int)minc[c]);
          }
          double cost = barrier / 255.0;
          cost *= cost;
          const double dy = (double)seeds_y[nlabel] - y;
          const double dx = (double)seeds_x[nlabel] - x;
          cost += factor * (dy * dy + dx * dx);
          if (cost < dmap[ci]) {
            dmap[ci] = cost;
            label[ci] = nlabel;
            std::memcpy(&hi[3 * ci], maxc, 3);
            std::memcpy(&lo[3 * ci], minc, 3);
          }
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Geodesic distance transform (two-pass chamfer over an edge-cost map)
// ---------------------------------------------------------------------------
void gdt_transform(const float* cost,  // HxW edge cost
                   int h, int w,
                   const int64_t* seeds_x, const int64_t* seeds_y, int n_seeds,
                   float* dist /* HxW out */) {
  const float C1 = 0.5f;
  const float C2 = std::sqrt(2.0f) / 2.0f;
  const int n = h * w;
  std::fill(dist, dist + n, 255.0f);
  for (int s = 0; s < n_seeds; s++) {
    const int idx = (int)seeds_y[s] * w + (int)seeds_x[s];
    dist[idx] = cost[idx];
  }
  auto relax = [&](int cur, int prev, float coef) {
    const float d = dist[prev] + coef * (cost[cur] + cost[prev]);
    if (dist[cur] > d) dist[cur] = d;
  };
  // forward: left-to-right, top-to-bottom
  for (int j = 1; j < w; j++) relax(j, j - 1, C1);
  for (int i = 1; i < h; i++) {
    const int r = i * w, p = (i - 1) * w;
    relax(r, p, C1);
    if (w > 1) relax(r, p + 1, C2);
    for (int j = 1; j < w - 1; j++) {
      relax(r + j, r + j - 1, C1);
      relax(r + j, p + j - 1, C2);
      relax(r + j, p + j, C1);
      relax(r + j, p + j + 1, C2);
    }
    if (w > 1) {
      const int j = w - 1;
      relax(r + j, r + j - 1, C1);
      relax(r + j, p + j - 1, C2);
      relax(r + j, p + j, C1);
    }
  }
  // backward: right-to-left, bottom-to-top
  {
    const int r = (h - 1) * w;
    for (int j = w - 2; j >= 0; j--) relax(r + j, r + j + 1, C1);
  }
  for (int i = h - 2; i >= 0; i--) {
    const int r = i * w, p = (i + 1) * w;
    const int jl = w - 1;
    relax(r + jl, p + jl, C1);
    if (w > 1) relax(r + jl, p + jl - 1, C2);
    for (int j = w - 2; j > 0; j--) {
      relax(r + j, r + j + 1, C1);
      relax(r + j, p + j + 1, C2);
      relax(r + j, p + j, C1);
      relax(r + j, p + j - 1, C2);
    }
    if (w > 1) {
      relax(r, r + 1, C1);
      relax(r, p + 1, C2);
      relax(r, p, C1);
    }
  }
}

// ---------------------------------------------------------------------------
// Vote-NMS (host fallback / oracle)
// ---------------------------------------------------------------------------
static double vote_single_dim(const std::vector<double>& s, const std::vector<double>& x) {
  double ssum = 0, mean = 0;
  for (size_t i = 0; i < s.size(); i++) {
    ssum += s[i];
    mean += s[i] * x[i];
  }
  mean /= ssum;
  double var = 0;
  for (size_t i = 0; i < s.size(); i++) var += s[i] * (x[i] - mean) * (x[i] - mean);
  const double sigma = std::sqrt(var / ssum);
  double fsum = 0, fx = 0;
  for (size_t i = 0; i < s.size(); i++) {
    if (x[i] >= mean - sigma && x[i] <= mean + sigma) {
      fx += s[i] * x[i];
      fsum += s[i];
    }
  }
  return fsum > 0 ? fx / fsum : mean;
}

// returns number of output detections (<= n)
int vote_nms(const float* boxes,           // n x 4 xyxy
             const float* cluster_scores,  // n
             const float* vote_scores,     // n
             const int64_t* labels,        // n
             int n, float iou_threshold, int iou_enable, float sigma,
             int global_mode,
             float* out_boxes,   // n x 4
             int64_t* out_labels,  // n
             float* out_scores) {  // n
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return cluster_scores[a] > cluster_scores[b]; });
  std::vector<char> suppressed(n, 0);
  std::vector<double> areas(n);
  for (int i = 0; i < n; i++)
    areas[i] = std::max(0.f, boxes[4 * i + 2] - boxes[4 * i]) *
               std::max(0.f, boxes[4 * i + 3] - boxes[4 * i + 1]);
  std::set<int64_t> done_labels;
  int m = 0;
  for (int oi = 0; oi < n; oi++) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    const int64_t li = labels[i];
    if (global_mode && done_labels.count(li)) {
      suppressed[i] = 1;
      continue;
    }
    suppressed[i] = 1;
    std::vector<double> vs{(double)vote_scores[i]};
    std::vector<double> cs{(double)cluster_scores[i]};
    std::vector<double> xs[4];
    for (int c = 0; c < 4; c++) xs[c].push_back(boxes[4 * i + c]);
    for (int oj = oi + 1; oj < n; oj++) {
      const int j = order[oj];
      if (labels[j] != li || suppressed[j]) continue;
      const double xl = std::max(boxes[4 * i], boxes[4 * j]);
      const double yt = std::max(boxes[4 * i + 1], boxes[4 * j + 1]);
      const double xr = std::min(boxes[4 * i + 2], boxes[4 * j + 2]);
      const double yb = std::min(boxes[4 * i + 3], boxes[4 * j + 3]);
      const double inter = std::max(0.0, xr - xl) * std::max(0.0, yb - yt);
      const double iou = inter / (areas[i] + areas[j] - inter);
      double vj = vote_scores[j];
      if (iou_enable) vj *= std::exp(-(1 - iou) * (1 - iou) / sigma);
      if (iou > iou_threshold) {
        suppressed[j] = 1;
        vs.push_back(vj);
        cs.push_back(cluster_scores[j]);
        for (int c = 0; c < 4; c++) xs[c].push_back(boxes[4 * j + c]);
      }
    }
    for (int c = 0; c < 4; c++) out_boxes[4 * m + c] = (float)vote_single_dim(vs, xs[c]);
    out_labels[m] = li;
    out_scores[m] = (float)*std::max_element(cs.begin(), cs.end());
    m++;
    if (global_mode) done_labels.insert(li);
  }
  return m;
}

// ---------------------------------------------------------------------------
// Cluster-NMS: label each box with its cluster id + size (no suppression)
// ---------------------------------------------------------------------------
void nms_cluster(const float* boxes,   // n x 4
                 const float* scores,  // n
                 int n, float iou_threshold,
                 int64_t* instance_ids,    // n out
                 int64_t* cluster_sizes) {  // n out (per box: its cluster's size)
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> assigned(n, 0);
  std::vector<double> areas(n);
  for (int i = 0; i < n; i++)
    areas[i] = std::max(0.f, boxes[4 * i + 2] - boxes[4 * i]) *
               std::max(0.f, boxes[4 * i + 3] - boxes[4 * i + 1]);
  std::vector<std::vector<int>> clusters;
  for (int oi = 0; oi < n; oi++) {
    const int i = order[oi];
    if (assigned[i]) continue;
    assigned[i] = 1;
    const int64_t cid = (int64_t)clusters.size();
    clusters.push_back({i});
    instance_ids[i] = cid;
    for (int oj = oi + 1; oj < n; oj++) {
      const int j = order[oj];
      if (assigned[j]) continue;
      const double xl = std::max(boxes[4 * i], boxes[4 * j]);
      const double yt = std::max(boxes[4 * i + 1], boxes[4 * j + 1]);
      const double xr = std::min(boxes[4 * i + 2], boxes[4 * j + 2]);
      const double yb = std::min(boxes[4 * i + 3], boxes[4 * j + 3]);
      const double inter = std::max(0.0, xr - xl) * std::max(0.0, yb - yt);
      const double iou = inter / (areas[i] + areas[j] - inter);
      if (iou > iou_threshold) {
        assigned[j] = 1;
        instance_ids[j] = cid;
        clusters.back().push_back(j);
      }
    }
  }
  for (const auto& cl : clusters)
    for (int idx : cl) cluster_sizes[idx] = (int64_t)cl.size();
}

}  // extern "C"
