// Native map-compiler: PGM occupancy image -> obstacle rectangles,
// inflated polygons, and half-space parameters, in one pass.
//
// The reference's map pipeline leans on three native libraries (Clipper for
// polygon offsetting, GEOS via shapely for collision geometry, and
// skimage's C filters for contour extraction).  This single C++ translation
// unit provides the equivalent hot operations behind a C ABI consumed via
// ctypes (no pybind11 in this image):
//
//   mc_process_map       : invert/threshold/border-close a raw PGM raster
//   mc_extract_obstacles : connected components -> convex hull ->
//                          rotating-calipers min-area rectangle per blob
//   mc_inflate_polygon   : convex miter offsetting
//   mc_halfspaces        : H-representation (b | a0 | a1) of a convex poly
//
// Everything is deterministic and allocation-free at steady state: callers
// pass preallocated output buffers and receive counts back.
//
// Build: see build.sh (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Invert (optional), threshold at 10 -> {0,255}, close the border ring.
void mc_process_map(const uint8_t* raw, int height, int width,
                    int inversed, uint8_t* out) {
  for (int i = 0; i < height * width; ++i) {
    int v = inversed ? 255 - raw[i] : raw[i];
    out[i] = v > 10 ? 255 : 0;
  }
  for (int x = 0; x < width; ++x) {
    out[x] = 0;
    out[(height - 1) * width + x] = 0;
  }
  for (int y = 0; y < height; ++y) {
    out[y * width] = 0;
    out[y * width + width - 1] = 0;
  }
}

}  // extern "C"

namespace {

struct Pt {
  double x, y;
};

double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Andrew's monotone chain; returns CCW hull.
std::vector<Pt> convex_hull(std::vector<Pt> pts) {
  std::sort(pts.begin(), pts.end(), [](const Pt& a, const Pt& b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  pts.erase(std::unique(pts.begin(), pts.end(),
                        [](const Pt& a, const Pt& b) {
                          return a.x == b.x && a.y == b.y;
                        }),
            pts.end());
  int n = static_cast<int>(pts.size());
  if (n <= 2) return pts;
  std::vector<Pt> hull(2 * n);
  int k = 0;
  for (int i = 0; i < n; ++i) {
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  int lower = k + 1;
  for (int i = n - 2; i >= 0; --i) {
    while (k >= lower && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  hull.resize(k - 1);
  return hull;
}

// Rotating-calipers smallest-area bounding rectangle of a hull -> 4 pts.
void min_area_rect(const std::vector<Pt>& hull, Pt out[4]) {
  int n = static_cast<int>(hull.size());
  if (n == 0) return;
  if (n <= 2) {
    Pt mn = hull[0], mx = hull[0];
    for (const Pt& p : hull) {
      mn.x = std::min(mn.x, p.x); mn.y = std::min(mn.y, p.y);
      mx.x = std::max(mx.x, p.x); mx.y = std::max(mx.y, p.y);
    }
    out[0] = {mn.x, mn.y}; out[1] = {mx.x, mn.y};
    out[2] = {mx.x, mx.y}; out[3] = {mn.x, mx.y};
    return;
  }
  double best_area = 1e300;
  for (int i = 0; i < n; ++i) {
    const Pt& p = hull[i];
    const Pt& q = hull[(i + 1) % n];
    double ang = std::fmod(std::fabs(std::atan2(q.y - p.y, q.x - p.x)),
                           M_PI / 2.0);
    double c = std::cos(ang), s = std::sin(ang);
    double min_x = 1e300, max_x = -1e300, min_y = 1e300, max_y = -1e300;
    for (const Pt& v : hull) {
      double rx = c * v.x + s * v.y;     // rotate by -ang
      double ry = -s * v.x + c * v.y;
      min_x = std::min(min_x, rx); max_x = std::max(max_x, rx);
      min_y = std::min(min_y, ry); max_y = std::max(max_y, ry);
    }
    double area = (max_x - min_x) * (max_y - min_y);
    if (area < best_area) {
      best_area = area;
      const double cs[4][2] = {{min_x, min_y}, {max_x, min_y},
                               {max_x, max_y}, {min_x, max_y}};
      for (int k = 0; k < 4; ++k) {
        out[k] = {c * cs[k][0] - s * cs[k][1],
                  s * cs[k][0] + c * cs[k][1]};  // rotate back by +ang
      }
    }
  }
}

}  // namespace

extern "C" {

// Label occupied (value > threshold) blobs, emit a min-area rectangle per
// blob with at least `min_pixels` pixels.  `rects` holds max_rects * 8
// doubles (x0,y0,...,x3,y3).  Returns the number of rectangles written.
int mc_extract_obstacles(const uint8_t* image, int height, int width,
                         int threshold, int min_pixels, double* rects,
                         int max_rects) {
  std::vector<int32_t> label(static_cast<size_t>(height) * width, -1);
  std::vector<int> stack;
  int n_rects = 0;
  for (int y0 = 0; y0 < height && n_rects < max_rects; ++y0) {
    for (int x0 = 0; x0 < width && n_rects < max_rects; ++x0) {
      int idx0 = y0 * width + x0;
      if (image[idx0] <= threshold || label[idx0] >= 0) continue;
      // Flood fill (4-connectivity, matching scipy.ndimage.label default).
      stack.clear();
      stack.push_back(idx0);
      label[idx0] = n_rects;
      std::vector<Pt> blob;
      while (!stack.empty()) {
        int idx = stack.back();
        stack.pop_back();
        int y = idx / width, x = idx % width;
        blob.push_back({static_cast<double>(x), static_cast<double>(y)});
        const int nbr[4] = {idx - 1, idx + 1, idx - width, idx + width};
        const bool ok[4] = {x > 0, x < width - 1, y > 0, y < height - 1};
        for (int k = 0; k < 4; ++k) {
          if (ok[k] && image[nbr[k]] > threshold && label[nbr[k]] < 0) {
            label[nbr[k]] = n_rects;
            stack.push_back(nbr[k]);
          }
        }
      }
      if (static_cast<int>(blob.size()) < min_pixels) continue;
      Pt rect[4];
      min_area_rect(convex_hull(blob), rect);
      for (int k = 0; k < 4; ++k) {
        rects[n_rects * 8 + 2 * k] = rect[k].x;
        rects[n_rects * 8 + 2 * k + 1] = rect[k].y;
      }
      ++n_rects;
    }
  }
  return n_rects;
}

// Convex miter offset of a polygon (n_in points, xy interleaved).  Returns
// the number of output points written to `out` (capacity n_in).
int mc_inflate_polygon(const double* poly_xy, int n_in, double margin,
                       double* out) {
  std::vector<Pt> pts(n_in);
  for (int i = 0; i < n_in; ++i) pts[i] = {poly_xy[2 * i], poly_xy[2 * i + 1]};
  std::vector<Pt> hull = convex_hull(pts);
  int n = static_cast<int>(hull.size());
  if (n < 3) return 0;   // caller falls back to the degenerate-blob path
  std::vector<Pt> sp, sq;
  for (int i = 0; i < n; ++i) {
    Pt p = hull[i], q = hull[(i + 1) % n];
    double ex = q.x - p.x, ey = q.y - p.y;
    double len = std::hypot(ex, ey);
    if (len < 1e-12) continue;
    double nx = ey / len, ny = -ex / len;   // outward normal (CCW hull)
    sp.push_back({p.x + margin * nx, p.y + margin * ny});
    sq.push_back({q.x + margin * nx, q.y + margin * ny});
  }
  int m = static_cast<int>(sp.size());
  int n_out = 0;
  for (int i = 0; i < m; ++i) {
    Pt p1 = sp[i], q1 = sq[i];
    Pt p2 = sp[(i + 1) % m], q2 = sq[(i + 1) % m];
    double d1x = q1.x - p1.x, d1y = q1.y - p1.y;
    double d2x = q2.x - p2.x, d2y = q2.y - p2.y;
    double denom = d1x * d2y - d1y * d2x;
    Pt v;
    if (std::fabs(denom) < 1e-12) {
      v = q1;
    } else {
      double t = ((p2.x - p1.x) * d2y - (p2.y - p1.y) * d2x) / denom;
      v = {p1.x + t * d1x, p1.y + t * d1y};
    }
    out[2 * n_out] = v.x;
    out[2 * n_out + 1] = v.y;
    ++n_out;
  }
  return n_out;
}

// Half-space representation of a convex polygon: per facet, interior
// satisfies a0*x + a1*y <= b with the reference's centroid scaling
// (residual == 1 at the hull centroid).  Outputs b, a0, a1 (capacity n_in
// each); returns the facet count.
int mc_halfspaces(const double* poly_xy, int n_in, double* b, double* a0,
                  double* a1) {
  std::vector<Pt> pts(n_in);
  for (int i = 0; i < n_in; ++i) pts[i] = {poly_xy[2 * i], poly_xy[2 * i + 1]};
  std::vector<Pt> hull = convex_hull(pts);
  int n = static_cast<int>(hull.size());
  if (n < 3) return 0;
  Pt c{0, 0};
  for (const Pt& p : hull) { c.x += p.x; c.y += p.y; }
  c.x /= n; c.y /= n;
  int m = 0;
  for (int i = 0; i < n; ++i) {
    Pt p = hull[i], q = hull[(i + 1) % n];
    double nx = q.y - p.y, ny = -(q.x - p.x);   // outward normal (CCW)
    double off = nx * (p.x - c.x) + ny * (p.y - c.y);
    if (std::fabs(off) < 1e-12) continue;
    double ax = nx / off, ay = ny / off;
    b[m] = ax * c.x + ay * c.y + 1.0;
    a0[m] = ax;
    a1[m] = ay;
    ++m;
  }
  return m;
}

}  // extern "C"
