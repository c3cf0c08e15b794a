// Native DB (Differentiable Binarization) postprocess.
//
// The reference implements this host-side stage in C++ with OpenCV
// (findContours/minAreaRect) plus the embedded 4.6k-line Clipper library
// for polygon offsetting (ppocrv5/src/postprocess.cpp:10-160, dbnet/clipper/).
// This is the equivalent for the TPU runtime: connected components
// (4-connectivity union-find, scipy.ndimage.label semantics) → convex hull
// (Andrew's monotone chain) → rotating-calipers min-area rect → component
// mean-probability score → rectangle unclip (area·ratio/perimeter offset).
// Bit-compatible with the numpy implementation in ops/db.py (double math,
// same tie rules); that file stays as the portable fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt {
  double x, y;
};

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew's monotone chain, matching ops/db.py convex_hull: points sorted by
// (x, y), duplicates removed, colinear points dropped (cross <= 0 pops).
std::vector<Pt> convex_hull(std::vector<Pt> pts) {
  std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
    return a.x != b.x ? a.x < b.x : a.y < b.y;
  });
  pts.erase(std::unique(pts.begin(), pts.end(),
                        [](const Pt& a, const Pt& b) {
                          return a.x == b.x && a.y == b.y;
                        }),
            pts.end());
  const size_t n = pts.size();
  if (n <= 2) return pts;
  std::vector<Pt> hull(2 * n);
  size_t k = 0;
  for (size_t i = 0; i < n; ++i) {  // lower
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  for (size_t i = n - 1, t = k + 1; i-- > 0;) {  // upper
    while (k >= t && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  hull.resize(k - 1);
  return hull;
}

struct Rect {
  double cx, cy, w, h, theta;
};

// Rotating calipers over hull edges (cv::minAreaRect analog; matches
// ops/db.py min_area_rect including the 1- and 2-point degenerate cases
// and the strict-< first-minimum tie rule).
Rect min_area_rect(const std::vector<Pt>& pts_in) {
  std::vector<Pt> hull = convex_hull(pts_in);
  const size_t n = hull.size();
  if (n == 1) return {hull[0].x, hull[0].y, 0.0, 0.0, 0.0};
  if (n == 2) {
    const double dx = hull[1].x - hull[0].x, dy = hull[1].y - hull[0].y;
    return {(hull[0].x + hull[1].x) / 2, (hull[0].y + hull[1].y) / 2,
            std::hypot(dx, dy), 0.0, std::atan2(dy, dx)};
  }
  Rect best{};
  double best_area = -1.0;
  for (size_t i = 0; i < n; ++i) {
    const Pt& p0 = hull[i];
    const Pt& p1 = hull[(i + 1) % n];
    const double theta = std::atan2(p1.y - p0.y, p1.x - p0.x);
    const double c = std::cos(-theta), s = std::sin(-theta);
    double x1 = 1e300, y1 = 1e300, x2 = -1e300, y2 = -1e300;
    for (const Pt& p : hull) {
      const double rx = p.x * c - p.y * s;
      const double ry = p.x * s + p.y * c;
      x1 = std::min(x1, rx); x2 = std::max(x2, rx);
      y1 = std::min(y1, ry); y2 = std::max(y2, ry);
    }
    const double area = (x2 - x1) * (y2 - y1);
    if (best_area < 0 || area < best_area) {
      best_area = area;
      const double cx = (x1 + x2) / 2, cy = (y1 + y2) / 2;
      // inverse rotation of the rect center back to image coords
      best = {cx * c + cy * s, -cx * s + cy * c, x2 - x1, y2 - y1, theta};
    }
  }
  return best;
}

}  // namespace

extern "C" {

// prob: (h, w) float32 row-major. Boxes written as 4 corner points (x, y)
// each (8 floats/box, ops/db.py _rect_points order). Returns the number of
// boxes written (<= max_out).
int64_t db_boxes(const float* prob, int64_t h, int64_t w, float bin_thresh,
                 float box_thresh, float unclip_ratio, int64_t max_candidates,
                 int64_t min_size, float* out_boxes, float* out_scores,
                 int64_t max_out) {
  const int64_t npx = h * w;
  // two-pass 4-connectivity union-find labeling (ndimage.label semantics)
  std::vector<int32_t> label(npx, 0);
  std::vector<int32_t> parent(1, 0);  // parent[0] unused
  auto find = [&](int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  };
  int32_t next = 1;
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      const int64_t i = y * w + x;
      if (!(prob[i] > bin_thresh)) continue;
      const int32_t up = y > 0 ? label[i - w] : 0;
      const int32_t left = x > 0 ? label[i - 1] : 0;
      if (!up && !left) {
        label[i] = next;
        parent.push_back(next);
        ++next;
      } else if (up && left) {
        const int32_t ru = find(up), rl = find(left);
        label[i] = rl;
        if (ru != rl) parent[std::max(ru, rl)] = std::min(ru, rl);
      } else {
        label[i] = up ? up : left;
      }
    }
  }
  // compact labels in raster-first-seen order of their roots
  std::vector<int32_t> compact(next, 0);
  int32_t ncomp = 0;
  std::vector<std::vector<Pt>> comp_pts;
  std::vector<double> comp_sum;
  std::vector<int64_t> comp_cnt;
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      const int64_t i = y * w + x;
      if (!label[i]) continue;
      const int32_t r = find(label[i]);
      int32_t c = compact[r];
      if (!c) {
        c = compact[r] = ++ncomp;
        comp_pts.emplace_back();
        comp_sum.push_back(0.0);
        comp_cnt.push_back(0);
      }
      comp_pts[c - 1].push_back(
          {static_cast<double>(x) + 0.5, static_cast<double>(y) + 0.5});
      comp_sum[c - 1] += prob[i];
      ++comp_cnt[c - 1];
    }
  }
  int64_t nout = 0;
  const int64_t ncand = std::min<int64_t>(ncomp, max_candidates);
  for (int64_t c = 0; c < ncand && nout < max_out; ++c) {
    if (comp_cnt[c] < min_size) continue;
    const Rect r = min_area_rect(comp_pts[c]);
    if (std::min(r.w, r.h) < static_cast<double>(min_size)) continue;
    const double score = comp_sum[c] / static_cast<double>(comp_cnt[c]);
    if (score < box_thresh) continue;
    const double area = r.w * r.h;
    const double perim = 2.0 * (r.w + r.h);
    const double delta =
        area * static_cast<double>(unclip_ratio) / std::max(perim, 1e-6);
    const double wd = r.w + 2 * delta, hd = r.h + 2 * delta;
    const double cth = std::cos(r.theta), sth = std::sin(r.theta);
    const double dxx = cth * wd / 2, dxy = sth * wd / 2;
    const double dyx = -sth * hd / 2, dyy = cth * hd / 2;
    const double px[4] = {r.cx - dxx - dyx, r.cx + dxx - dyx,
                          r.cx + dxx + dyx, r.cx - dxx + dyx};
    const double py[4] = {r.cy - dxy - dyy, r.cy + dxy - dyy,
                          r.cy + dxy + dyy, r.cy - dxy + dyy};
    float* ob = out_boxes + nout * 8;
    for (int k = 0; k < 4; ++k) {
      ob[2 * k] = static_cast<float>(
          std::min(std::max(px[k], 0.0), static_cast<double>(w)));
      ob[2 * k + 1] = static_cast<float>(
          std::min(std::max(py[k], 0.0), static_cast<double>(h)));
    }
    out_scores[nout] = static_cast<float>(score);
    ++nout;
  }
  return nout;
}

}  // extern "C"
