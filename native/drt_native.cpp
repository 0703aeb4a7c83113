// Native runtime components for the TPU ray tracer.
//
// The reference implements its accelerator builds and scene parsing in C++
// (bvh.cpp:27-227, grid.cpp:30-97, scene.cpp:474-740); these are init-time
// host paths that feed static tables to the TPU, and Python is too slow for
// them at dragon scale (100k triangles).  This library provides:
//
//  - drt_build_bvh: 12-bucket SAH BVH over object AABBs, flat array layout
//    (left child = i, right = i+1; leaf index = first-object offset) exactly
//    matching bvh.cpp's build_recursive semantics and the NumPy fallback
//    builder in accel/bvh.py (stable centroid sorts, double-precision SAH).
//  - drt_grid_insert: uniform-grid cell insertion (grid.cpp:75-92) emitting
//    CSR arrays.
//  - drt_parse_floats: bulk whitespace-separated float tokenizer for P3F
//    mesh blocks (scene.cpp:565-594).
//
// C ABI only; loaded from Python via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kLeafThreshold = 2;  // bvh.cpp:65
constexpr int kBuckets = 12;       // bvh.cpp:66

struct Node {
  double bmin[3], bmax[3];
  bool leaf = false;
  int index = 0;
  int nobjs = 0;
};

inline double area(const double lo[3], const double hi[3]) {
  double e0 = hi[0] - lo[0], e1 = hi[1] - lo[1], e2 = hi[2] - lo[2];
  return 2.0 * (e0 * e1 + e0 * e2 + e1 * e2);
}

struct Builder {
  const float* bmin;
  const float* bmax;
  std::vector<double> centroid;  // n*3
  std::vector<int64_t> order;
  std::vector<Node> nodes;

  void build(int64_t n) {
    centroid.resize(n * 3);
    order.resize(n);
    for (int64_t i = 0; i < n; i++) {
      order[i] = i;
      for (int a = 0; a < 3; a++)
        centroid[i * 3 + a] = 0.5 * ((double)bmin[i * 3 + a] +
                                     (double)bmax[i * 3 + a]);
    }
    Node root;
    for (int a = 0; a < 3; a++) {
      double lo = std::numeric_limits<double>::infinity();
      double hi = -lo;
      for (int64_t i = 0; i < n; i++) {
        lo = std::min(lo, (double)bmin[i * 3 + a]);
        hi = std::max(hi, (double)bmax[i * 3 + a]);
      }
      root.bmin[a] = lo - 1e-3;  // EPSILON pad (bvh.cpp:39-40)
      root.bmax[a] = hi + 1e-3;
    }
    nodes.push_back(root);
    recurse(0, n, 0);
  }

  void obj_bounds(int64_t i, double lo[3], double hi[3]) const {
    for (int a = 0; a < 3; a++) {
      lo[a] = bmin[i * 3 + a];
      hi[a] = bmax[i * 3 + a];
    }
  }

  void recurse(int64_t left, int64_t right, int node) {
    int64_t n = right - left;
    if (n <= kLeafThreshold) {
      nodes[node].leaf = true;
      nodes[node].index = (int)left;
      nodes[node].nobjs = (int)n;
      return;
    }
    double parent_area = area(nodes[node].bmin, nodes[node].bmax);

    double best_cost = std::numeric_limits<double>::infinity();
    int best_axis = 0;
    int64_t best_split = left;

    for (int axis = 0; axis < 3; axis++) {
      std::stable_sort(order.begin() + left, order.begin() + right,
                       [&](int64_t a, int64_t b) {
                         return centroid[a * 3 + axis] <
                                centroid[b * 3 + axis];
                       });
      double lo_b = nodes[node].bmin[axis];
      double hi_b = nodes[node].bmax[axis];
      double scale = (hi_b - lo_b) > 0.0 ? kBuckets / (hi_b - lo_b) : 0.0;

      int64_t counts[kBuckets] = {0};
      double blo[kBuckets][3], bhi[kBuckets][3];
      for (int b = 0; b < kBuckets; b++)
        for (int a = 0; a < 3; a++) {
          blo[b][a] = std::numeric_limits<double>::infinity();
          bhi[b][a] = -blo[b][a];
        }
      for (int64_t i = left; i < right; i++) {
        int64_t o = order[i];
        int bi = std::min((int64_t)(kBuckets - 1),
                          (int64_t)((centroid[o * 3 + axis] - lo_b) * scale));
        if (bi < 0) bi = 0;
        counts[bi]++;
        for (int a = 0; a < 3; a++) {
          blo[bi][a] = std::min(blo[bi][a], (double)bmin[o * 3 + a]);
          bhi[bi][a] = std::max(bhi[bi][a], (double)bmax[o * 3 + a]);
        }
      }
      for (int i = 1; i < kBuckets; i++) {
        double llo[3], lhi[3], rlo[3], rhi[3];
        for (int a = 0; a < 3; a++) {
          llo[a] = std::numeric_limits<double>::infinity();
          lhi[a] = -llo[a];
          rlo[a] = llo[a];
          rhi[a] = -llo[a];
        }
        int64_t lc = 0, rc = 0;
        for (int j = 0; j < i; j++) {
          lc += counts[j];
          for (int a = 0; a < 3; a++) {
            llo[a] = std::min(llo[a], blo[j][a]);
            lhi[a] = std::max(lhi[a], bhi[j][a]);
          }
        }
        for (int j = i; j < kBuckets; j++) {
          rc += counts[j];
          for (int a = 0; a < 3; a++) {
            rlo[a] = std::min(rlo[a], blo[j][a]);
            rhi[a] = std::max(rhi[a], bhi[j][a]);
          }
        }
        double cost =
            1.0 + (lc * area(llo, lhi) + rc * area(rlo, rhi)) / parent_area;
        // 0 * inf = nan never beats (matches bvh.cpp FLT_MAX arithmetic)
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_split = left + lc;
        }
      }
    }

    if (best_split <= left || best_split >= right ||
        best_cost >= (double)n) {  // fallback leaf (bvh.cpp:193-196)
      nodes[node].leaf = true;
      nodes[node].index = (int)left;
      nodes[node].nobjs = (int)n;
      return;
    }

    std::stable_sort(order.begin() + left, order.begin() + right,
                     [&](int64_t a, int64_t b) {
                       return centroid[a * 3 + best_axis] <
                              centroid[b * 3 + best_axis];
                     });

    int li = (int)nodes.size();
    nodes[node].leaf = false;
    nodes[node].index = li;

    Node ln, rn;
    for (int a = 0; a < 3; a++) {
      ln.bmin[a] = std::numeric_limits<double>::infinity();
      ln.bmax[a] = -ln.bmin[a];
      rn.bmin[a] = ln.bmin[a];
      rn.bmax[a] = -ln.bmin[a];
    }
    for (int64_t i = left; i < best_split; i++) {
      int64_t o = order[i];
      for (int a = 0; a < 3; a++) {
        ln.bmin[a] = std::min(ln.bmin[a], (double)bmin[o * 3 + a]);
        ln.bmax[a] = std::max(ln.bmax[a], (double)bmax[o * 3 + a]);
      }
    }
    for (int64_t i = best_split; i < right; i++) {
      int64_t o = order[i];
      for (int a = 0; a < 3; a++) {
        rn.bmin[a] = std::min(rn.bmin[a], (double)bmin[o * 3 + a]);
        rn.bmax[a] = std::max(rn.bmax[a], (double)bmax[o * 3 + a]);
      }
    }
    nodes.push_back(ln);
    nodes.push_back(rn);
    recurse(left, best_split, li);
    recurse(best_split, right, li + 1);
  }
};

}  // namespace

extern "C" {

// Returns node count (<= 2n); caller provides capacity-2n output buffers.
int64_t drt_build_bvh(int64_t n, const float* bmin, const float* bmax,
                      float* node_min, float* node_max, uint8_t* node_leaf,
                      int32_t* node_index, int32_t* node_nobjs,
                      int32_t* order_out) {
  Builder b;
  b.bmin = bmin;
  b.bmax = bmax;
  b.build(n);
  int64_t nn = (int64_t)b.nodes.size();
  for (int64_t i = 0; i < nn; i++) {
    const Node& nd = b.nodes[i];
    for (int a = 0; a < 3; a++) {
      node_min[i * 3 + a] = (float)nd.bmin[a];
      node_max[i * 3 + a] = (float)nd.bmax[a];
    }
    node_leaf[i] = nd.leaf ? 1 : 0;
    node_index[i] = nd.index;
    node_nobjs[i] = nd.nobjs;
  }
  for (int64_t i = 0; i < n; i++) order_out[i] = (int32_t)b.order[i];
  return nn;
}

// Uniform grid insertion (grid.cpp:75-92).  Phase 1 (entries=null): returns
// the total entry count.  Phase 2: fills cell_of_entry/obj_of_entry.
int64_t drt_grid_insert(int64_t n, const float* bmin, const float* bmax,
                        const double* gmin, const double* gmax,
                        int32_t nx, int32_t ny, int32_t nz,
                        int64_t* cell_of_entry, int32_t* obj_of_entry) {
  const int64_t dims[3] = {nx, ny, nz};
  int64_t total = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t lo[3], hi[3];
    for (int a = 0; a < 3; a++) {
      double w = gmax[a] - gmin[a];
      double flo = ((double)bmin[i * 3 + a] - gmin[a]) * dims[a] / w;
      double fhi = ((double)bmax[i * 3 + a] - gmin[a]) * dims[a] / w;
      // clamp then truncate, as grid.cpp:80-85
      flo = flo < 0 ? 0 : (flo > dims[a] - 1 ? dims[a] - 1 : flo);
      fhi = fhi < 0 ? 0 : (fhi > dims[a] - 1 ? dims[a] - 1 : fhi);
      lo[a] = (int64_t)flo;
      hi[a] = (int64_t)fhi;
    }
    if (cell_of_entry) {
      for (int64_t z = lo[2]; z <= hi[2]; z++)
        for (int64_t y = lo[1]; y <= hi[1]; y++)
          for (int64_t x = lo[0]; x <= hi[0]; x++) {
            cell_of_entry[total] = x + nx * (y + (int64_t)ny * z);
            obj_of_entry[total] = (int32_t)i;
            total++;
          }
    } else {
      total += (hi[0] - lo[0] + 1) * (hi[1] - lo[1] + 1) * (hi[2] - lo[2] + 1);
    }
  }
  return total;
}

// Chebyshev (chessboard) distance transform over the grid's occupancy mask,
// for proximity-cloud empty-space skipping in the TPU DDA (grid traversal).
// Exact for the chessboard metric via the classic two-pass chamfer scan with
// unit weights over the 26-neighbourhood.  dist[c] = 0 for occupied cells,
// else the chebyshev distance to the nearest occupied cell, clamped to cap.
void drt_chebyshev_dist(int32_t nx, int32_t ny, int32_t nz,
                        const uint8_t* occupied, int32_t* dist, int32_t cap) {
  const int64_t sx = 1, sy = nx, sz = (int64_t)nx * ny;
  const int64_t total = sz * nz;
  for (int64_t i = 0; i < total; i++) dist[i] = occupied[i] ? 0 : cap;
  // forward pass: neighbours with (dz,dy,dx) lexicographically before (0,0,0)
  for (int64_t z = 0; z < nz; z++)
    for (int64_t y = 0; y < ny; y++)
      for (int64_t x = 0; x < nx; x++) {
        int64_t c = x * sx + y * sy + z * sz;
        int32_t d = dist[c];
        if (d == 0) continue;
        for (int dz = -1; dz <= 0; dz++)
          for (int dy = -1; dy <= 1; dy++)
            for (int dx = -1; dx <= 1; dx++) {
              if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
              int64_t X = x + dx, Y = y + dy, Z = z + dz;
              if (X < 0 || X >= nx || Y < 0 || Y >= ny || Z < 0) continue;
              int32_t v = dist[X * sx + Y * sy + Z * sz] + 1;
              if (v < d) d = v;
            }
        dist[c] = d;
      }
  // backward pass: the mirrored neighbour half-set
  for (int64_t z = nz - 1; z >= 0; z--)
    for (int64_t y = ny - 1; y >= 0; y--)
      for (int64_t x = nx - 1; x >= 0; x--) {
        int64_t c = x * sx + y * sy + z * sz;
        int32_t d = dist[c];
        if (d == 0) continue;
        for (int dz = 0; dz <= 1; dz++)
          for (int dy = -1; dy <= 1; dy++)
            for (int dx = -1; dx <= 1; dx++) {
              if (dz == 0 && (dy < 0 || (dy == 0 && dx <= 0))) continue;
              int64_t X = x + dx, Y = y + dy, Z = z + dz;
              if (X < 0 || X >= nx || Y < 0 || Y >= ny || Z >= nz) continue;
              int32_t v = dist[X * sx + Y * sy + Z * sz] + 1;
              if (v < d) d = v;
            }
        if (d > cap) d = cap;
        dist[c] = d;
      }
}

// Bulk float tokenizer: parses up to max_out whitespace-separated floats
// starting at text[*pos]; advances *pos past the last consumed token.
// Returns the number parsed.
int64_t drt_parse_floats(const char* text, int64_t len, int64_t* pos,
                         double* out, int64_t max_out) {
  const char* p = text + *pos;
  const char* end = text + len;
  int64_t count = 0;
  while (count < max_out) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      p++;
    if (p >= end) break;
    char* after = nullptr;
    double v = strtod(p, &after);
    if (after == p) break;  // not a number
    out[count++] = v;
    p = after;
  }
  *pos = p - text;
  return count;
}

}  // extern "C"
