// libscene — native scene compiler for shader_ray_tpu.
//
// C++ implementation of the host-side hot path: binned-SAH BVH build,
// DFS in-order index assignment, and 8-octant stackless hit/miss link
// precomputation.  Functionally equivalent to the reference's
// bvh.cpp:288-358 + world.cpp:145-288 pipeline and bit-compatible with
// the pure-numpy builder in shader_ray_tpu/models/{bvh,flatten}.py
// (same float32 arithmetic order, same stable partition), so the two
// paths are interchangeable and cross-checked by tests.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxBinCount = 40;   // bvh.cpp:200
constexpr int kHitmissDirs = 8;
constexpr int32_t kSentinel = -1;  // numpy flatten.py stop sentinel

struct Node {
  float bmin[3];
  float bmax[3];
  int32_t axis = -1;      // split axis, -1 = leaf
  int32_t neg = -1;       // child node ids (creation order), -1 = leaf
  int32_t pos = -1;
  int32_t start = 0;      // leaf triangle range
  int32_t count = 0;
  bool is_leaf() const { return neg < 0; }
};

struct Builder {
  // mutable copies, permuted in place during partitioning (T x 3 each)
  std::vector<float> bmin, bmax, bary;
  std::vector<int32_t> order;
  int32_t T = 0;
  int32_t leaf_max = 10;
  int32_t max_depth = 30;
  float ctrav = 1.0f;
  float cisec = 4.0f;

  std::vector<Node> nodes;
  int32_t root = -1;
  int32_t leaf_count = 0;
  int32_t large_leaf_no_split = 0;
  int32_t large_leaf_one_side = 0;
  int error = 0;  // nonzero: hitmiss stack overflow etc.

  // DFS in-order numbering (filled by assign_indices)
  std::vector<int32_t> perm;  // creation id -> DFS index

  static float surface_area(const float d[3]) {
    return 2.0f * (d[0] * d[1] + d[0] * d[2] + d[1] * d[2]);
  }

  int32_t make_leaf(int32_t start, int32_t count) {
    Node n;
    for (int d = 0; d < 3; ++d) {
      n.bmin[d] = FLT_MAX;
      n.bmax[d] = -FLT_MAX;
    }
    for (int32_t i = start; i < start + count; ++i) {
      for (int d = 0; d < 3; ++d) {
        n.bmin[d] = std::min(n.bmin[d], bmin[i * 3 + d]);
        n.bmax[d] = std::max(n.bmax[d], bmax[i * 3 + d]);
      }
    }
    n.start = start;
    n.count = count;
    nodes.push_back(n);
    ++leaf_count;
    return (int32_t)nodes.size() - 1;
  }

  int32_t build(int32_t start, int32_t count, int level) {
    if (level >= max_depth || count <= leaf_max) return make_leaf(start, count);

    float vmin[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float vmax[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    float bmn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float bmx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int32_t i = start; i < start + count; ++i) {
      for (int d = 0; d < 3; ++d) {
        vmin[d] = std::min(vmin[d], bmin[i * 3 + d]);
        vmax[d] = std::max(vmax[d], bmax[i * 3 + d]);
        bmn[d] = std::min(bmn[d], bary[i * 3 + d]);
        bmx[d] = std::max(bmx[d], bary[i * 3 + d]);
      }
    }
    float bd[3];
    for (int d = 0; d < 3; ++d) bd[d] = std::max(0.0f, bmx[d] - bmn[d]);
    // widest barycenter extent, same comparison order as bvh.cpp:318-327
    int axis;
    if (bd[0] > bd[1] && bd[0] > bd[2]) axis = 0;
    else if (bd[1] > bd[2]) axis = 1;
    else axis = 2;

    const float leaf_cost = ctrav + cisec * (float)count;
    const int bin_count = std::min(kMaxBinCount, (int)count * 2);
    const double lo = (double)vmin[axis];
    const double hi = (double)vmax[axis];

    bool have_split = false;
    float split_x = 0.0f;
    if (hi > lo) {
      std::vector<int32_t> bin_cnt(bin_count, 0);
      std::vector<float> bin_min(bin_count * 3, FLT_MAX);
      std::vector<float> bin_max(bin_count * 3, -FLT_MAX);
      const float lof = (float)lo;
      const float denom = (float)(hi - lo);
      for (int32_t i = start; i < start + count; ++i) {
        float x = bary[i * 3 + axis];
        int b = (int)std::floor((x - lof) * (float)bin_count / denom);
        b = std::min(std::max(b, 0), bin_count - 1);
        ++bin_cnt[b];
        for (int d = 0; d < 3; ++d) {
          bin_min[b * 3 + d] = std::min(bin_min[b * 3 + d], bmin[i * 3 + d]);
          bin_max[b * 3 + d] = std::max(bin_max[b * 3 + d], bmax[i * 3 + d]);
        }
      }
      // suffix scan: right boxes/counts (bvh.cpp:213-222)
      std::vector<float> right_min(bin_count * 3), right_max(bin_count * 3);
      std::vector<int32_t> right_cnt(bin_count);
      for (int b = bin_count - 1; b >= 0; --b) {
        for (int d = 0; d < 3; ++d) {
          float rm = bin_min[b * 3 + d], rM = bin_max[b * 3 + d];
          if (b + 1 < bin_count) {
            rm = std::min(rm, right_min[(b + 1) * 3 + d]);
            rM = std::max(rM, right_max[(b + 1) * 3 + d]);
          }
          right_min[b * 3 + d] = rm;
          right_max[b * 3 + d] = rM;
        }
        right_cnt[b] = bin_cnt[b] + (b + 1 < bin_count ? right_cnt[b + 1] : 0);
      }
      // prefix scan: left boxes, picking min cost (bvh.cpp:226-246)
      float dim[3];
      for (int d = 0; d < 3; ++d) dim[d] = std::max(0.0f, vmax[d] - vmin[d]);
      const float area = surface_area(dim);
      float best = leaf_cost;
      float left_min[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
      float left_max[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      for (int i = 1; i < bin_count; ++i) {
        for (int d = 0; d < 3; ++d) {
          left_min[d] = std::min(left_min[d], bin_min[(i - 1) * 3 + d]);
          left_max[d] = std::max(left_max[d], bin_max[(i - 1) * 3 + d]);
        }
        const int32_t rtri = right_cnt[i];
        const int32_t ltri = count - rtri;
        if (rtri == 0 || ltri == 0) continue;
        float ldim[3], rdim[3];
        for (int d = 0; d < 3; ++d) {
          ldim[d] = std::max(0.0f, left_max[d] - left_min[d]);
          rdim[d] = std::max(0.0f, right_max[i * 3 + d] - right_min[i * 3 + d]);
        }
        const float cost =
            ctrav + cisec * (surface_area(ldim) / area * (float)ltri +
                             surface_area(rdim) / area * (float)rtri);
        if (cost < best) {
          best = cost;
          // split plane position computed in double like the numpy
          // builder (bvh.cpp:187 analog), compared in float below
          split_x = (float)(lo + (double)i * (hi - lo) / (double)bin_count);
          have_split = true;
        }
      }
    }

    if (!have_split) {
      ++large_leaf_no_split;
      return make_leaf(start, count);
    }

    // stable partition by barycenter vs. split plane (bvh.cpp:249-286;
    // numpy uses a stable index-gather — replicated here)
    std::vector<int32_t> idx(count);
    int32_t countA = 0;
    for (int32_t i = 0; i < count; ++i)
      if (bary[(start + i) * 3 + axis] < split_x) idx[countA++] = i;
    int32_t k = countA;
    for (int32_t i = 0; i < count; ++i)
      if (!(bary[(start + i) * 3 + axis] < split_x)) idx[k++] = i;
    const int32_t countB = count - countA;
    if (countA == 0 || countB == 0) {
      ++large_leaf_one_side;
      return make_leaf(start, count);
    }
    apply_permutation(start, count, idx);

    const int32_t neg = build(start, countA, level + 1);
    const int32_t pos = build(start + countA, countB, level + 1);
    Node n;
    std::memcpy(n.bmin, vmin, sizeof(vmin));
    std::memcpy(n.bmax, vmax, sizeof(vmax));
    n.axis = axis;
    n.neg = neg;
    n.pos = pos;
    nodes.push_back(n);
    return (int32_t)nodes.size() - 1;
  }

  void apply_permutation(int32_t start, int32_t count,
                         const std::vector<int32_t>& idx) {
    std::vector<float> tmp3(count * 3);
    std::vector<int32_t> tmpi(count);
    auto permute3 = [&](std::vector<float>& a) {
      for (int32_t i = 0; i < count; ++i)
        for (int d = 0; d < 3; ++d)
          tmp3[i * 3 + d] = a[(start + idx[i]) * 3 + d];
      std::memcpy(&a[start * 3], tmp3.data(), sizeof(float) * count * 3);
    };
    permute3(bmin);
    permute3(bmax);
    permute3(bary);
    for (int32_t i = 0; i < count; ++i) tmpi[i] = order[start + idx[i]];
    std::memcpy(&order[start], tmpi.data(), sizeof(int32_t) * count);
  }

  // DFS in-order numbering: negative subtree, self, positive subtree
  // (world.cpp:145-177)
  void assign_indices() {
    perm.assign(nodes.size(), -1);
    int32_t counter = 0;
    struct Frame { int32_t id; bool expanded; };
    std::vector<Frame> stack;
    stack.push_back({root, false});
    while (!stack.empty()) {
      Frame f = stack.back();
      stack.pop_back();
      const Node& n = nodes[f.id];
      if (n.is_leaf() || f.expanded) {
        perm[f.id] = counter++;
        continue;
      }
      stack.push_back({n.pos, false});
      stack.push_back({f.id, true});
      stack.push_back({n.neg, false});
    }
    if (counter != (int32_t)nodes.size()) error = 2;
  }

  // One octant's (hit_next, miss_next) bank in DFS numbering
  // (world.cpp:215-278); near child by sign of dot(octant, axis)
  void hitmiss_octant(int dircode, int32_t* out /* N*2 */) const {
    const int32_t n = (int32_t)nodes.size();
    for (int32_t i = 0; i < 2 * n; ++i) out[i] = kSentinel;
    const float sign[3] = {
        (dircode & 1) ? 1.0f : -1.0f,
        (dircode & 2) ? 1.0f : -1.0f,
        (dircode & 4) ? 1.0f : -1.0f,
    };
    std::vector<int32_t> stack;
    int32_t g = root;
    while (g != -1) {
      const int32_t miss = stack.empty() ? -1 : stack.back();
      const Node& node = nodes[g];
      const int32_t gi = perm[g];
      if (node.is_leaf()) {
        out[gi * 2 + 0] = (miss != -1) ? perm[miss] : kSentinel;
        out[gi * 2 + 1] = out[gi * 2 + 0];
        if (stack.empty()) {
          g = -1;
        } else {
          g = stack.back();
          stack.pop_back();
        }
      } else {
        int32_t near, far;
        if (sign[node.axis] < 0) {
          near = node.pos;
          far = node.neg;
        } else {
          near = node.neg;
          far = node.pos;
        }
        out[gi * 2 + 0] = perm[near];
        out[gi * 2 + 1] = (miss != -1) ? perm[miss] : kSentinel;
        stack.push_back(far);
        g = near;
      }
    }
  }
};

}  // namespace

extern "C" {

// Build the BVH. Returns an opaque handle (srt_bvh_free to release).
// order must hold tri_count int32 (receives the BVH triangle
// permutation: order[k] = original index of BVH-slot k).
void* srt_bvh_build(const float* tri_boxmin, const float* tri_boxmax,
                    const float* barycenters, int32_t tri_count,
                    int32_t leaf_max, int32_t max_depth, float ctrav,
                    float cisec, int32_t* out_node_count, int32_t* out_root,
                    int32_t* order) {
  Builder* b = new Builder();
  b->T = tri_count;
  b->leaf_max = leaf_max;
  b->max_depth = max_depth;
  b->ctrav = ctrav;
  b->cisec = cisec;
  b->bmin.assign(tri_boxmin, tri_boxmin + (size_t)tri_count * 3);
  b->bmax.assign(tri_boxmax, tri_boxmax + (size_t)tri_count * 3);
  b->bary.assign(barycenters, barycenters + (size_t)tri_count * 3);
  b->order.resize(tri_count);
  for (int32_t i = 0; i < tri_count; ++i) b->order[i] = i;

  b->nodes.reserve(tri_count / 4 + 8);
  b->root = (tri_count == 0) ? b->make_leaf(0, 0) : b->build(0, tri_count, 0);
  b->assign_indices();

  *out_node_count = (int32_t)b->nodes.size();
  *out_root = (b->error == 0) ? b->perm[b->root] : -1;
  std::memcpy(order, b->order.data(), sizeof(int32_t) * tri_count);
  return b;
}

// Fill flattened arrays in DFS numbering.  boxmin/boxmax are N*3,
// start/count/axis N, children N*2, hitmiss 8*N*2.  Returns 0 on
// success.
int32_t srt_bvh_fill(void* handle, float* boxmin, float* boxmax,
                     int32_t* start, int32_t* count, int32_t* children,
                     int32_t* axis, int32_t* hitmiss) {
  Builder* b = static_cast<Builder*>(handle);
  if (b->error) return b->error;
  const int32_t n = (int32_t)b->nodes.size();
  for (int32_t old_id = 0; old_id < n; ++old_id) {
    const Node& node = b->nodes[old_id];
    const int32_t i = b->perm[old_id];
    std::memcpy(&boxmin[i * 3], node.bmin, sizeof(node.bmin));
    std::memcpy(&boxmax[i * 3], node.bmax, sizeof(node.bmax));
    if (node.is_leaf()) {
      start[i] = node.start;
      count[i] = node.count;
      children[i * 2 + 0] = kSentinel;
      children[i * 2 + 1] = kSentinel;
      axis[i] = -1;
    } else {
      start[i] = 0;
      count[i] = 0;
      children[i * 2 + 0] = b->perm[node.neg];
      children[i * 2 + 1] = b->perm[node.pos];
      axis[i] = node.axis;
    }
  }
  for (int d = 0; d < kHitmissDirs; ++d)
    b->hitmiss_octant(d, hitmiss + (size_t)d * n * 2);
  return 0;
}

int32_t srt_bvh_leaf_count(void* handle) {
  return static_cast<Builder*>(handle)->leaf_count;
}

void srt_bvh_free(void* handle) { delete static_cast<Builder*>(handle); }

}  // extern "C"
