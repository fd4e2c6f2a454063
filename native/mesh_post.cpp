// d2dgs native host runtime: mesh post-processing kernels.
//
// The reference performs these steps in native code via Open3D's C++
// TSDF/mesh pipeline (reference utils/mesh_utils.py:24-45,158-199): weld
// the marching-cubes triangle soup into an indexed mesh, find connected
// components, and keep the largest cluster(s).  On TPU the fusion itself
// runs in JAX (d2dgs_tpu/mesh/tsdf.py); these host-side finalization loops
// are latency-bound pointer-chasing work that belongs in C++, not Python.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// All functions are single-threaded and allocation-free: the Python caller
// provides worst-case-sized output buffers and receives actual counts.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    for (int32_t i = 0; i < n; ++i) parent[i] = i;
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {  // path compression
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// Weld a triangle soup into an indexed mesh.
//
// tris:      [n_tris * 9] float32, 3 vertices x xyz per triangle.
// cell:      quantization cell size (vertices within one cell merge).
// out_verts: [n_tris * 9] float32 buffer; receives welded vertex positions
//            (mean of all soup vertices that mapped to the cell).
// out_faces: [n_tris * 3] int32 buffer; receives vertex indices.
// Returns the number of welded vertices; *n_faces_out receives the number
// of non-degenerate faces kept.
int64_t d2dgs_weld_mesh(const float* tris, int64_t n_tris, double cell,
                        float* out_verts, int32_t* out_faces,
                        int64_t* n_faces_out) {
  const double inv = 1.0 / cell;
  std::unordered_map<uint64_t, int32_t> lut;
  lut.reserve(static_cast<size_t>(n_tris) * 2);
  std::vector<double> accum;   // xyz sums per welded vertex
  std::vector<int32_t> count;  // soup vertices per welded vertex
  accum.reserve(static_cast<size_t>(n_tris) * 3);

  int64_t n_faces = 0;
  for (int64_t t = 0; t < n_tris; ++t) {
    int32_t idx[3];
    for (int k = 0; k < 3; ++k) {
      const float* p = tris + t * 9 + k * 3;
      // Exact key: pack the three quantized coords as clamped 21-bit
      // ints into one uint64 — collision-free (unlike hashing the
      // cell, which could silently weld distant vertices).
      uint64_t h = 0;
      for (int d = 0; d < 3; ++d) {
        auto q = static_cast<int64_t>(
            p[d] * inv + (p[d] >= 0 ? 0.5 : -0.5));  // round-half-away
        constexpr int64_t kLim = (1LL << 20) - 1;    // |q| <= 2^20-1
        q = q < -kLim ? -kLim : (q > kLim ? kLim : q);
        h = (h << 21) | static_cast<uint64_t>(q + kLim);
      }
      auto it = lut.find(h);
      if (it == lut.end()) {
        int32_t vid = static_cast<int32_t>(count.size());
        lut.emplace(h, vid);
        accum.insert(accum.end(), {p[0], p[1], p[2]});
        count.push_back(1);
        idx[k] = vid;
      } else {
        int32_t vid = it->second;
        for (int d = 0; d < 3; ++d) accum[vid * 3 + d] += p[d];
        ++count[vid];
        idx[k] = vid;
      }
    }
    if (idx[0] != idx[1] && idx[1] != idx[2] && idx[0] != idx[2]) {
      out_faces[n_faces * 3 + 0] = idx[0];
      out_faces[n_faces * 3 + 1] = idx[1];
      out_faces[n_faces * 3 + 2] = idx[2];
      ++n_faces;
    }
  }
  const auto n_verts = static_cast<int64_t>(count.size());
  for (int64_t v = 0; v < n_verts; ++v)
    for (int d = 0; d < 3; ++d)
      out_verts[v * 3 + d] = static_cast<float>(accum[v * 3 + d] / count[v]);
  *n_faces_out = n_faces;
  return n_verts;
}

// Label mesh connected components (edge-connected faces share a label).
// faces: [n_faces * 3] int32.  labels: [n_verts] int32 out (root-relabeled
// to consecutive 0..n_components-1).  Returns component count.
int32_t d2dgs_connected_components(const int32_t* faces, int64_t n_faces,
                                   int32_t n_verts, int32_t* labels) {
  UnionFind uf(n_verts);
  for (int64_t f = 0; f < n_faces; ++f) {
    uf.unite(faces[f * 3 + 0], faces[f * 3 + 1]);
    uf.unite(faces[f * 3 + 1], faces[f * 3 + 2]);
  }
  std::unordered_map<int32_t, int32_t> remap;
  for (int32_t v = 0; v < n_verts; ++v) {
    int32_t root = uf.find(v);
    auto it = remap.find(root);
    if (it == remap.end()) {
      int32_t lbl = static_cast<int32_t>(remap.size());
      remap.emplace(root, lbl);
      labels[v] = lbl;
    } else {
      labels[v] = it->second;
    }
  }
  return static_cast<int32_t>(remap.size());
}

// Keep faces whose component is among the `keep` largest by face count,
// or has >= min_ratio * max_size faces.  Compacts vertices.
// In/out sizes: faces [n_faces*3], verts [n_verts*3].
// out_face_mask: [n_faces] uint8 — which input faces survived (lets the
// caller filter per-face attributes).  new_index: [n_verts] int32 — old
// vertex id -> new id or -1.  Returns new vertex count; *n_faces_out gets
// the kept face count (faces are compacted in place into out_faces).
int64_t d2dgs_filter_components(const float* verts, int32_t n_verts,
                                const int32_t* faces, int64_t n_faces,
                                int32_t keep, double min_ratio,
                                float* out_verts, int32_t* out_faces,
                                int64_t* n_faces_out, uint8_t* out_face_mask,
                                int32_t* new_index) {
  std::vector<int32_t> labels(n_verts);
  int32_t n_comp =
      d2dgs_connected_components(faces, n_faces, n_verts, labels.data());
  std::vector<int64_t> sizes(n_comp, 0);
  for (int64_t f = 0; f < n_faces; ++f) ++sizes[labels[faces[f * 3]]];

  // selection: top-`keep` + ratio threshold
  std::vector<int32_t> order(n_comp);
  for (int32_t i = 0; i < n_comp; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int32_t a, int32_t b) { return sizes[a] > sizes[b]; });
  int64_t max_size = n_comp ? sizes[order[0]] : 0;
  std::vector<uint8_t> chosen(n_comp, 0);
  for (int32_t i = 0; i < n_comp && i < keep; ++i) chosen[order[i]] = 1;
  if (min_ratio > 0)
    for (int32_t c = 0; c < n_comp; ++c)
      if (sizes[c] >= min_ratio * static_cast<double>(max_size))
        chosen[c] = 1;

  for (int32_t v = 0; v < n_verts; ++v) new_index[v] = -1;
  int64_t kept_faces = 0;
  int32_t kept_verts = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    bool ok = chosen[labels[faces[f * 3]]];
    out_face_mask[f] = ok ? 1 : 0;
    if (!ok) continue;
    for (int k = 0; k < 3; ++k) {
      int32_t v = faces[f * 3 + k];
      if (new_index[v] < 0) {
        new_index[v] = kept_verts;
        std::memcpy(out_verts + static_cast<int64_t>(kept_verts) * 3,
                    verts + static_cast<int64_t>(v) * 3, 3 * sizeof(float));
        ++kept_verts;
      }
      out_faces[kept_faces * 3 + k] = new_index[v];
    }
    ++kept_faces;
  }
  *n_faces_out = kept_faces;
  return kept_verts;
}

}  // extern "C"
