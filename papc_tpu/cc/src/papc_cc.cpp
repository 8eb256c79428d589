// papc_cc — native host kernels for the papc_tpu input pipeline & eval.
//
// C++ replacements for the reference's native tier (SURVEY §2.4):
//   * points_to_voxel      — libs/ops/cc/point_cloud_ops.h + the numba
//                            twin point_cloud_ops.py:7-103 (first-come
//                            voxel hashing with a dense coor→idx table)
//   * rbbox_iou            — libs/ops/cc/box_ops.h (exact rotated IoU,
//                            standup prefilter; Sutherland–Hodgman 4-gon
//                            clip instead of boost::geometry)
//   * nms_cpu              — libs/ops/cc/nms/nms_cpu.h:23-70 (greedy
//                            standup NMS)
//   * rotate_nms_cpu       — nms_cpu.h:72-168 (exact rotated NMS)
//   * points_in_polygon3d  — libs/ops/geometry.py numba kernels
//   * box_collision_test   — libs/preprocess.py:808-887
//
// Exposed with C linkage over raw buffers; Python binds via ctypes
// (papc_tpu/cc/__init__.py). Built ahead-of-time — no import-time
// compilation (unlike the reference's pybind11_build.py JIT).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- voxelize
// points: [N, ndim] float32 (xyz first); returns K = number of voxels.
// voxels: [max_voxels, max_points, ndim]; coords: [max_voxels, 3] (zyx);
// num_points_per_voxel: [max_voxels]. All outputs must be zeroed by the
// caller. coor_to_voxelidx: [nz*ny*nx] int32 scratch filled with -1.
int points_to_voxel(
    const float* points, int64_t num_points, int64_t ndim,
    const float* voxel_size, const float* coors_range,
    const int64_t* grid_dims,
    int32_t* coor_to_voxelidx,
    float* voxels, int32_t* coords, int32_t* num_points_per_voxel,
    int64_t max_points, int64_t max_voxels) {
  // grid dims come from the CALLER (who sized the scratch tables):
  // recomputing them here with C float round once disagreed with
  // numpy's float64 half-to-even round on exact .5 extents, making the
  // kernel index past the python-allocated scratch.
  const int64_t grid[3] = {grid_dims[0], grid_dims[1], grid_dims[2]};
  const int64_t nx = grid[0], ny = grid[1];
  int voxel_num = 0;
  int64_t c[3];
  for (int64_t p = 0; p < num_points; ++p) {
    bool failed = false;
    for (int i = 0; i < 3; ++i) {
      c[i] = (int64_t)std::floor(
          (points[p * ndim + i] - coors_range[i]) / voxel_size[i]);
      if (c[i] < 0 || c[i] >= grid[i]) { failed = true; break; }
    }
    if (failed) continue;
    const int64_t lin = c[2] * ny * nx + c[1] * nx + c[0];
    int32_t voxelidx = coor_to_voxelidx[lin];
    if (voxelidx == -1) {
      if (voxel_num >= max_voxels) continue;
      voxelidx = voxel_num++;
      coor_to_voxelidx[lin] = voxelidx;
      coords[voxelidx * 3 + 0] = (int32_t)c[2];
      coords[voxelidx * 3 + 1] = (int32_t)c[1];
      coords[voxelidx * 3 + 2] = (int32_t)c[0];
    }
    int32_t& num = num_points_per_voxel[voxelidx];
    if (num < max_points) {
      std::memcpy(
          voxels + (voxelidx * max_points + num) * ndim,
          points + p * ndim, sizeof(float) * ndim);
      ++num;
    }
  }
  return voxel_num;
}

// Amortized voxelizer for hot per-frame use: all buffers persist across
// calls in the Python wrapper, so per-call work is proportional to the
// points actually PROCESSED rather than to the full output capacity:
//   * scratch table entries are validated by an epoch tag instead of a
//     full table refill;
//   * the all-zero invariant of `voxels` is restored by clearing only
//     the slots the PREVIOUS call wrote (prev_k + num_points_per_voxel),
//     not the whole [max_voxels, max_points, ndim] block;
//   * the cell-coordinate pass is split out over `lin_buf` so the
//     float work auto-vectorizes; the sequential first-come assignment
//     (identical semantics to points_to_voxel above) runs second.
int points_to_voxel_epoch(
    const float* points, int64_t num_points, int64_t ndim,
    const float* voxel_size, const float* coors_range,
    const int64_t* grid_dims,
    int32_t* scratch_epoch, int32_t* scratch_idx, int32_t epoch,
    int64_t* lin_buf,
    float* voxels, int32_t* coords, int32_t* num_points_per_voxel,
    int64_t max_points, int64_t max_voxels, int32_t prev_k) {
  // grid dims from the caller — see points_to_voxel's note
  const int64_t nx = grid_dims[0], ny = grid_dims[1], nz = grid_dims[2];

  // restore the all-zero invariant from the previous call's write set
  for (int64_t v = 0; v < prev_k; ++v) {
    const int32_t n = num_points_per_voxel[v];
    if (n > 0) {
      std::memset(voxels + v * max_points * ndim, 0,
                  sizeof(float) * (size_t)n * ndim);
    }
    num_points_per_voxel[v] = 0;
    coords[v * 3 + 0] = coords[v * 3 + 1] = coords[v * 3 + 2] = 0;
  }

  // pass 1: cell ids (vectorizable; float32 division exactly as the
  // numpy oracle computes it)
  const float r0 = coors_range[0], r1 = coors_range[1],
              r2 = coors_range[2];
  const float v0 = voxel_size[0], v1 = voxel_size[1],
              v2 = voxel_size[2];
  for (int64_t p = 0; p < num_points; ++p) {
    const float* pt = points + p * ndim;
    const int64_t c0 = (int64_t)std::floor((pt[0] - r0) / v0);
    const int64_t c1 = (int64_t)std::floor((pt[1] - r1) / v1);
    const int64_t c2 = (int64_t)std::floor((pt[2] - r2) / v2);
    const bool ok = c0 >= 0 && c0 < nx && c1 >= 0 && c1 < ny &&
                    c2 >= 0 && c2 < nz;
    lin_buf[p] = ok ? c2 * ny * nx + c1 * nx + c0 : -1;
  }

  // pass 2: sequential first-come assignment (epoch-tagged scratch)
  int voxel_num = 0;
  for (int64_t p = 0; p < num_points; ++p) {
    const int64_t lin = lin_buf[p];
    if (lin < 0) continue;
    int32_t voxelidx =
        scratch_epoch[lin] == epoch ? scratch_idx[lin] : -1;
    if (voxelidx == -1) {
      if (voxel_num >= max_voxels) continue;
      voxelidx = voxel_num++;
      scratch_epoch[lin] = epoch;
      scratch_idx[lin] = voxelidx;
      coords[voxelidx * 3 + 0] = (int32_t)(lin / (ny * nx));
      coords[voxelidx * 3 + 1] = (int32_t)((lin / nx) % ny);
      coords[voxelidx * 3 + 2] = (int32_t)(lin % nx);
    }
    int32_t& num = num_points_per_voxel[voxelidx];
    if (num < max_points) {
      std::memcpy(voxels + (voxelidx * max_points + num) * ndim,
                  points + p * ndim, sizeof(float) * ndim);
      ++num;
    }
  }
  return voxel_num;
}

// Flat-mode voxelizer for the flat-points PFN: identical first-come
// pillar assignment and per-pillar max_points truncation as
// points_to_voxel_epoch, but the accepted points stream into a flat
// [n_cap, ndim] array with a per-point pillar-row index instead of the
// mostly-padded [max_voxels, max_points, ndim] grid (which at the KITTI
// workload is ~98% zeros that the host then fills, ships, and the
// device re-reads). Points accepted once the flat cap is full are
// dropped ENTIRELY (not counted in num_points_per_voxel) so the flat
// view and the counts always agree. Writes the accepted-point count to
// *out_n; returns the voxel count K.
int points_to_voxel_flat_epoch(
    const float* points, int64_t num_points, int64_t ndim,
    const float* voxel_size, const float* coors_range,
    const int64_t* grid_dims,
    int32_t* scratch_epoch, int32_t* scratch_idx, int32_t epoch,
    int64_t* lin_buf,
    float* flat_points, int32_t* flat_owner,
    int32_t* coords, int32_t* num_points_per_voxel,
    int64_t max_points, int64_t max_voxels, int64_t n_cap,
    int32_t* out_n) {
  const int64_t nx = grid_dims[0], ny = grid_dims[1], nz = grid_dims[2];

  const float r0 = coors_range[0], r1 = coors_range[1],
              r2 = coors_range[2];
  const float v0 = voxel_size[0], v1 = voxel_size[1],
              v2 = voxel_size[2];
  for (int64_t p = 0; p < num_points; ++p) {
    const float* pt = points + p * ndim;
    const int64_t c0 = (int64_t)std::floor((pt[0] - r0) / v0);
    const int64_t c1 = (int64_t)std::floor((pt[1] - r1) / v1);
    const int64_t c2 = (int64_t)std::floor((pt[2] - r2) / v2);
    const bool ok = c0 >= 0 && c0 < nx && c1 >= 0 && c1 < ny &&
                    c2 >= 0 && c2 < nz;
    lin_buf[p] = ok ? c2 * ny * nx + c1 * nx + c0 : -1;
  }

  int voxel_num = 0;
  int64_t n = 0;
  for (int64_t p = 0; p < num_points; ++p) {
    const int64_t lin = lin_buf[p];
    if (lin < 0) continue;
    int32_t voxelidx =
        scratch_epoch[lin] == epoch ? scratch_idx[lin] : -1;
    if (voxelidx == -1) {
      if (voxel_num >= max_voxels) continue;
      voxelidx = voxel_num++;
      scratch_epoch[lin] = epoch;
      scratch_idx[lin] = voxelidx;
      coords[voxelidx * 3 + 0] = (int32_t)(lin / (ny * nx));
      coords[voxelidx * 3 + 1] = (int32_t)((lin / nx) % ny);
      coords[voxelidx * 3 + 2] = (int32_t)(lin % nx);
    }
    int32_t& num = num_points_per_voxel[voxelidx];
    if (num < max_points && n < n_cap) {
      std::memcpy(flat_points + n * ndim, points + p * ndim,
                  sizeof(float) * ndim);
      flat_owner[n] = voxelidx;
      ++n;
      ++num;
    }
  }
  // Stable counting sort by owner: the flat view comes out grouped by
  // pillar in ascending first-seen id order, within-pillar point order
  // preserved (== the grid voxelizer's slot order, so per-pillar
  // reductions stay bit-identical). Sorted rows let the device
  // segment scatters carry indices_are_sorted=True.
  if (n > 0) {
    std::vector<int64_t> offsets(voxel_num + 1, 0);
    for (int64_t i = 0; i < n; ++i) offsets[flat_owner[i] + 1]++;
    for (int v = 0; v < voxel_num; ++v) offsets[v + 1] += offsets[v];
    std::vector<float> tmp_pts((size_t)(n * ndim));
    std::vector<int32_t> tmp_own((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
      const int64_t dst = offsets[flat_owner[i]]++;
      std::memcpy(tmp_pts.data() + dst * ndim, flat_points + i * ndim,
                  sizeof(float) * ndim);
      tmp_own[(size_t)dst] = flat_owner[i];
    }
    std::memcpy(flat_points, tmp_pts.data(),
                sizeof(float) * (size_t)(n * ndim));
    std::memcpy(flat_owner, tmp_own.data(),
                sizeof(int32_t) * (size_t)n);
  }
  *out_n = (int32_t)n;
  return voxel_num;
}

// --------------------------------------------------------- polygon helpers
namespace {

struct P2d { double x, y; };

inline double cross(const P2d& o, const P2d& a, const P2d& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// corners of a (x, y, w, l, yaw) box, clockwise from min corner in the
// unrotated frame — matches box_np.center_to_corner_box2d.
inline void box_corners(const float* b, P2d* out) {
  const double hx = b[2] / 2.0, hy = b[3] / 2.0;
  const double c = std::cos((double)b[4]), s = std::sin((double)b[4]);
  const double rel[4][2] = {
      {-hx, -hy}, {-hx, hy}, {hx, hy}, {hx, -hy}};
  // clockwise-for-positive-angle convention (reference rotation_2d,
  // row-vector p @ [[c,-s],[s,c]])
  for (int i = 0; i < 4; ++i) {
    out[i].x = rel[i][0] * c + rel[i][1] * s + b[0];
    out[i].y = -rel[i][0] * s + rel[i][1] * c + b[1];
  }
}

inline double polygon_area(const P2d* poly, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    a += poly[i].x * poly[j].y - poly[j].x * poly[i].y;
  }
  return std::abs(a) * 0.5;
}

// Sutherland–Hodgman clip of convex quad `sub` by convex quad `clip`;
// both CCW. Returns intersection area.
double quad_intersection_area(P2d sub[4], P2d clp[4]) {
  // normalize both to CCW
  auto signed_area = [](const P2d* p, int n) {
    double a = 0;
    for (int i = 0; i < n; ++i) {
      const int j = (i + 1) % n;
      a += p[i].x * p[j].y - p[j].x * p[i].y;
    }
    return a * 0.5;
  };
  if (signed_area(sub, 4) < 0) std::swap(sub[0], sub[3]), std::swap(sub[1], sub[2]);
  if (signed_area(clp, 4) < 0) std::swap(clp[0], clp[3]), std::swap(clp[1], clp[2]);

  P2d poly[16], next[16];
  int n = 4;
  for (int i = 0; i < 4; ++i) poly[i] = sub[i];
  for (int e = 0; e < 4 && n > 0; ++e) {
    const P2d a = clp[e];
    const P2d b = clp[(e + 1) % 4];
    int m = 0;
    for (int i = 0; i < n; ++i) {
      const P2d& p = poly[i];
      const P2d& q = poly[(i + 1) % n];
      const double ps = cross(a, b, p);
      const double qs = cross(a, b, q);
      if (ps >= 0) next[m++] = p;
      if ((ps >= 0) != (qs >= 0) && ps != qs) {
        const double t = ps / (ps - qs);
        next[m].x = p.x + t * (q.x - p.x);
        next[m].y = p.y + t * (q.y - p.y);
        ++m;
      }
    }
    n = m;
    for (int i = 0; i < n; ++i) poly[i] = next[i];
  }
  if (n < 3) return 0.0;
  return polygon_area(poly, n);
}

}  // namespace

// --------------------------------------------------------------- rbbox_iou
// boxes/qboxes: [N, 5] / [K, 5] (x, y, w, l, yaw) float32.
// out: [N, K] float32. criterion: -1 IoU, 0 inter/areaN, 1 inter/areaK,
// else raw intersection area. standup prefilter skips far pairs.
void rbbox_iou(
    const float* boxes, int64_t n, const float* qboxes, int64_t k,
    float standup_thresh, int criterion, float* out) {
  std::vector<P2d> ca(n * 4), cb(k * 4);
  std::vector<double> sa(n * 4), sb(k * 4);  // standup: minx,miny,maxx,maxy
  for (int64_t i = 0; i < n; ++i) {
    box_corners(boxes + i * 5, &ca[i * 4]);
    double mnx = 1e30, mny = 1e30, mxx = -1e30, mxy = -1e30;
    for (int c = 0; c < 4; ++c) {
      mnx = std::min(mnx, ca[i * 4 + c].x);
      mny = std::min(mny, ca[i * 4 + c].y);
      mxx = std::max(mxx, ca[i * 4 + c].x);
      mxy = std::max(mxy, ca[i * 4 + c].y);
    }
    sa[i * 4] = mnx; sa[i * 4 + 1] = mny; sa[i * 4 + 2] = mxx; sa[i * 4 + 3] = mxy;
  }
  for (int64_t j = 0; j < k; ++j) {
    box_corners(qboxes + j * 5, &cb[j * 4]);
    double mnx = 1e30, mny = 1e30, mxx = -1e30, mxy = -1e30;
    for (int c = 0; c < 4; ++c) {
      mnx = std::min(mnx, cb[j * 4 + c].x);
      mny = std::min(mny, cb[j * 4 + c].y);
      mxx = std::max(mxx, cb[j * 4 + c].x);
      mxy = std::max(mxy, cb[j * 4 + c].y);
    }
    sb[j * 4] = mnx; sb[j * 4 + 1] = mny; sb[j * 4 + 2] = mxx; sb[j * 4 + 3] = mxy;
  }
  for (int64_t i = 0; i < n; ++i) {
    const double area_i = (double)boxes[i * 5 + 2] * boxes[i * 5 + 3];
    for (int64_t j = 0; j < k; ++j) {
      out[i * k + j] = 0.f;
      // standup IoU prefilter
      const double iw = std::min(sa[i * 4 + 2], sb[j * 4 + 2]) -
                        std::max(sa[i * 4], sb[j * 4]);
      if (iw <= 0) continue;
      const double ih = std::min(sa[i * 4 + 3], sb[j * 4 + 3]) -
                        std::max(sa[i * 4 + 1], sb[j * 4 + 1]);
      if (ih <= 0) continue;
      const double a1 = (sa[i * 4 + 2] - sa[i * 4]) * (sa[i * 4 + 3] - sa[i * 4 + 1]);
      const double a2 = (sb[j * 4 + 2] - sb[j * 4]) * (sb[j * 4 + 3] - sb[j * 4 + 1]);
      const double standup_iou = iw * ih / (a1 + a2 - iw * ih);
      if (standup_iou <= standup_thresh) continue;

      P2d sub[4], clp[4];
      std::memcpy(sub, &ca[i * 4], sizeof(sub));
      std::memcpy(clp, &cb[j * 4], sizeof(clp));
      const double inter = quad_intersection_area(sub, clp);
      const double area_j = (double)qboxes[j * 5 + 2] * qboxes[j * 5 + 3];
      double denom;
      if (criterion == -1) denom = area_i + area_j - inter;
      else if (criterion == 0) denom = area_i;
      else if (criterion == 1) denom = area_j;
      else denom = 1.0;
      if (denom > 0) out[i * k + j] = (float)(inter / denom);
    }
  }
}

// ------------------------------------------------------------------- iou2d
// Axis-aligned IoU matrix (reference numba iou_jit, box_np_ops.py:653-682).
// boxes: [N, 4], qboxes: [K, 4] (x1,y1,x2,y2). out: [N, K] float32,
// caller need not pre-zero. eps matches the numpy twin's +eps semantics.
void iou2d(const float* boxes, int64_t n, const float* qboxes, int64_t k,
           float eps, float* out) {
  std::vector<double> qarea(k);
  for (int64_t j = 0; j < k; ++j) {
    qarea[j] = ((double)qboxes[j * 4 + 2] - qboxes[j * 4] + eps) *
               ((double)qboxes[j * 4 + 3] - qboxes[j * 4 + 1] + eps);
  }
  for (int64_t i = 0; i < n; ++i) {
    const double bx1 = boxes[i * 4], by1 = boxes[i * 4 + 1];
    const double bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
    const double barea = (bx2 - bx1 + eps) * (by2 - by1 + eps);
    float* row = out + i * k;
    for (int64_t j = 0; j < k; ++j) {
      const double iw =
          std::min(bx2, (double)qboxes[j * 4 + 2]) -
          std::max(bx1, (double)qboxes[j * 4]) + eps;
      if (iw > 0) {
        const double ih =
            std::min(by2, (double)qboxes[j * 4 + 3]) -
            std::max(by1, (double)qboxes[j * 4 + 1]) + eps;
        if (ih > 0) {
          const double inter = iw * ih;
          row[j] = (float)(inter / (barea + qarea[j] - inter));
          continue;
        }
      }
      row[j] = 0.f;
    }
  }
}

// ----------------------------------------------------------------- nms_cpu
// Greedy standup NMS. boxes: [K, 4] (x1,y1,x2,y2) score-sorted desc.
// keep: [K] uint8 out. Returns number kept.
int nms_cpu(const float* boxes, int64_t k, float iou_threshold,
            uint8_t* keep) {
  for (int64_t i = 0; i < k; ++i) keep[i] = 1;
  int n_kept = 0;
  for (int64_t i = 0; i < k; ++i) {
    if (!keep[i]) continue;
    ++n_kept;
    const float* bi = boxes + i * 4;
    const double ai = (double)(bi[2] - bi[0]) * (bi[3] - bi[1]);
    for (int64_t j = i + 1; j < k; ++j) {
      if (!keep[j]) continue;
      const float* bj = boxes + j * 4;
      const double iw = std::min(bi[2], bj[2]) - std::max(bi[0], bj[0]);
      if (iw <= 0) continue;
      const double ih = std::min(bi[3], bj[3]) - std::max(bi[1], bj[1]);
      if (ih <= 0) continue;
      const double aj = (double)(bj[2] - bj[0]) * (bj[3] - bj[1]);
      const double iou = iw * ih / (ai + aj - iw * ih);
      if (iou > iou_threshold) keep[j] = 0;
    }
  }
  return n_kept;
}

// --------------------------------------------------------- d3_box_overlap
// Camera-frame 3D overlap (KITTI eval metric=2; reference
// libs/tools/eval.py:131-162): exact rotated BEV intersection area
// (criterion=2 rbbox_iou over (x, z, l, w, ry)) fused with the y-axis
// height overlap. boxes/qboxes: [N, 7] / [K, 7] (x, y, z, l, h, w, ry)
// float32, y the box BOTTOM (camera frame). out: [N, K] float32.
void d3_box_overlap(const float* boxes, int64_t n, const float* qboxes,
                    int64_t k, int criterion, float* out) {
  std::vector<float> bev_b(n * 5), bev_q(k * 5);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + i * 7;
    float* o = bev_b.data() + i * 5;
    o[0] = b[0]; o[1] = b[2]; o[2] = b[3]; o[3] = b[5]; o[4] = b[6];
  }
  for (int64_t j = 0; j < k; ++j) {
    const float* b = qboxes + j * 7;
    float* o = bev_q.data() + j * 5;
    o[0] = b[0]; o[1] = b[2]; o[2] = b[3]; o[3] = b[5]; o[4] = b[6];
  }
  // out temporarily holds the raw BEV intersection areas
  rbbox_iou(bev_b.data(), n, bev_q.data(), k, 0.0f, 2, out);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + i * 7;
    const double area_i = (double)b[3] * b[4] * b[5];
    for (int64_t j = 0; j < k; ++j) {
      float& cell = out[i * k + j];
      if (cell <= 0.f) { cell = 0.f; continue; }
      const float* q = qboxes + j * 7;
      const double iw = std::min(b[1], q[1]) -
                        std::max(b[1] - b[4], q[1] - q[4]);
      if (iw <= 0) { cell = 0.f; continue; }
      const double inc = iw * (double)cell;
      double ua;
      if (criterion == -1) {
        ua = area_i + (double)q[3] * q[4] * q[5] - inc;
      } else if (criterion == 0) {
        ua = area_i;
      } else if (criterion == 1) {
        ua = (double)q[3] * q[4] * q[5];
      } else {
        ua = 1.0;
      }
      cell = ua > 0 ? (float)(inc / ua) : 0.f;
    }
  }
}

// Greedy exact rotated NMS. rbboxes: [K, 5] score-sorted desc.
int rotate_nms_cpu(const float* rbboxes, int64_t k, float iou_threshold,
                   uint8_t* keep) {
  std::vector<float> iou(k * k);
  rbbox_iou(rbboxes, k, rbboxes, k, 0.0f, -1, iou.data());
  for (int64_t i = 0; i < k; ++i) keep[i] = 1;
  int n_kept = 0;
  for (int64_t i = 0; i < k; ++i) {
    if (!keep[i]) continue;
    ++n_kept;
    for (int64_t j = i + 1; j < k; ++j) {
      if (keep[j] && iou[i * k + j] > iou_threshold) keep[j] = 0;
    }
  }
  return n_kept;
}

// -------------------------------------------------- points-in-polygon (3d)
// points: [P, 3]; surfaces: [N, 6, 4, 3] (inward normals winding).
// out: [P, N] uint8.
void points_in_polygon3d(
    const float* points, int64_t p,
    const float* surfaces, int64_t n, uint8_t* out) {
  std::vector<double> normals(n * 6 * 3), d(n * 6);
  for (int64_t b = 0; b < n; ++b) {
    for (int s = 0; s < 6; ++s) {
      const float* sv = surfaces + ((b * 6 + s) * 4) * 3;
      const double v0[3] = {sv[0] - sv[3], sv[1] - sv[4], sv[2] - sv[5]};
      const double v1[3] = {sv[3] - sv[6], sv[4] - sv[7], sv[5] - sv[8]};
      double* nrm = &normals[(b * 6 + s) * 3];
      nrm[0] = v0[1] * v1[2] - v0[2] * v1[1];
      nrm[1] = v0[2] * v1[0] - v0[0] * v1[2];
      nrm[2] = v0[0] * v1[1] - v0[1] * v1[0];
      d[b * 6 + s] =
          -(nrm[0] * sv[0] + nrm[1] * sv[1] + nrm[2] * sv[2]);
    }
  }
  for (int64_t i = 0; i < p; ++i) {
    const float* pt = points + i * 3;
    for (int64_t b = 0; b < n; ++b) {
      uint8_t inside = 1;
      for (int s = 0; s < 6; ++s) {
        const double* nrm = &normals[(b * 6 + s) * 3];
        const double sign = pt[0] * nrm[0] + pt[1] * nrm[1] +
                            pt[2] * nrm[2] + d[b * 6 + s];
        if (sign >= 0) { inside = 0; break; }
      }
      out[i * n + b] = inside;
    }
  }
}

// -------------------------------------------------------- collision test
namespace {

inline void quad_standup(const float* c, double* s) {
  s[0] = s[1] = 1e30; s[2] = s[3] = -1e30;
  for (int i = 0; i < 4; ++i) {
    s[0] = std::min(s[0], (double)c[i * 2]);
    s[1] = std::min(s[1], (double)c[i * 2 + 1]);
    s[2] = std::max(s[2], (double)c[i * 2]);
    s[3] = std::max(s[3], (double)c[i * 2 + 1]);
  }
}

inline bool quad_ccw3(const float* p, const float* q, const float* r) {
  return (double)(r[1] - p[1]) * (q[0] - p[0]) >
         (double)(q[1] - p[1]) * (r[0] - p[0]);
}

inline bool quad_seg_int(const float* A, const float* B, const float* C,
                         const float* D) {
  return quad_ccw3(A, C, D) != quad_ccw3(B, C, D) &&
         quad_ccw3(A, B, C) != quad_ccw3(A, B, D);
}

// true if quad (any winding, checked clockwise per reference) strictly
// contains all 4 pts
inline bool quad_contains_all(const float* quad, const float* pts) {
  for (int l = 0; l < 4; ++l) {
    for (int c = 0; c < 4; ++c) {
      const int c2 = (c + 1) % 4;
      double vx = -(quad[c * 2] - quad[c2 * 2]);
      double vy = -(quad[c * 2 + 1] - quad[c2 * 2 + 1]);
      const double crossv = vy * (quad[c * 2] - pts[l * 2]) -
                            vx * (quad[c * 2 + 1] - pts[l * 2 + 1]);
      if (crossv >= 0) return false;
    }
  }
  return true;
}

// full pair test: standup prefilter, 16 edge pairs, mutual containment
inline bool quad_pair_collide(const float* bi, const double* sbi,
                              const float* qj, const double* sqj) {
  const double iw = std::min(sbi[2], sqj[2]) - std::max(sbi[0], sqj[0]);
  if (iw <= 0) return false;
  const double ih = std::min(sbi[3], sqj[3]) - std::max(sbi[1], sqj[1]);
  if (ih <= 0) return false;
  for (int a = 0; a < 4; ++a)
    for (int b = 0; b < 4; ++b)
      if (quad_seg_int(bi + a * 2, bi + ((a + 1) % 4) * 2,
                       qj + b * 2, qj + ((b + 1) % 4) * 2))
        return true;
  return quad_contains_all(bi, qj) || quad_contains_all(qj, bi);
}

}  // namespace

// boxes/qboxes: corner boxes [N, 4, 2] / [K, 4, 2] float32 (BEV).
// out: [N, K] uint8 — edge intersection OR full containment.
void box_collision_test(
    const float* boxes, int64_t n, const float* qboxes, int64_t k,
    uint8_t* out) {
  std::vector<double> sb(n * 4), sq(k * 4);
  for (int64_t i = 0; i < n; ++i) quad_standup(boxes + i * 8, &sb[i * 4]);
  for (int64_t j = 0; j < k; ++j) quad_standup(qboxes + j * 8, &sq[j * 4]);
  for (int64_t i = 0; i < n; ++i) {
    const float* bi = boxes + i * 8;
    for (int64_t j = 0; j < k; ++j) {
      out[i * k + j] = quad_pair_collide(bi, &sb[i * 4], qboxes + j * 8,
                                         &sq[j * 4])
                           ? 1
                           : 0;
    }
  }
}

// ------------------------------------------------- per-object noise trials
// Sequential trial acceptance of noise_per_object_ (reference numba
// noise_per_box / noise_per_box_group, libs/preprocess.py:252-457): for
// each group (singleton groups = per-box mode) in index order, try the
// trials in order and accept the FIRST whose members' candidate corners
// collide with NO current box outside the group; accepted members'
// corners update in place so later groups test against moved footprints.
// cands: [N, T, 4, 2]; corners: [N, 4, 2] (modified in place);
// group_starts/group_sizes: [G] (members are contiguous index ranges);
// valid: [N] uint8 (group gated by its first member, as the reference);
// selected: [N] int64 out, -1 = no trial accepted.
void noise_select(const float* cands, int64_t n, int64_t t,
                  float* corners, const int64_t* group_starts,
                  const int64_t* group_sizes, int64_t g,
                  const uint8_t* valid, int64_t* selected) {
  std::vector<double> stand(n * 4);
  for (int64_t i = 0; i < n; ++i)
    quad_standup(corners + i * 8, &stand[i * 4]);
  for (int64_t i = 0; i < n; ++i) selected[i] = -1;
  for (int64_t gi = 0; gi < g; ++gi) {
    const int64_t m0 = group_starts[gi], ms = group_sizes[gi];
    if (!valid[m0]) continue;
    for (int64_t trial = 0; trial < t; ++trial) {
      bool ok = true;
      for (int64_t m = m0; m < m0 + ms && ok; ++m) {
        const float* cq = cands + (m * t + trial) * 8;
        double sq[4];
        quad_standup(cq, sq);
        for (int64_t j = 0; j < n && ok; ++j) {
          if (j >= m0 && j < m0 + ms) continue;  // skip group members
          if (quad_pair_collide(cq, sq, corners + j * 8, &stand[j * 4]))
            ok = false;
        }
      }
      if (ok) {
        for (int64_t m = m0; m < m0 + ms; ++m) {
          selected[m] = trial;
          std::memcpy(corners + m * 8, cands + (m * t + trial) * 8,
                      8 * sizeof(float));
          quad_standup(corners + m * 8, &stand[m * 4]);
        }
        break;
      }
    }
  }
}

// ------------------------------------------------------- kd-tree builder
// Balanced kd-tree (median split on the max-spread axis) for KDNet /
// KDUNet inputs — native twin of papc_tpu.data.kd.build_kd_tree
// (the reference leans on scipy's C cKDTree; SURVEY §2.1 kd loader).
//
// points: [n, 3] float32, n a power of two. order: [n] int32 out —
// leaf-ordered original indices. splits_flat: level-major concatenation
// (level l has n>>l entries, l = 0..log2(n)-1), int32 out.
namespace {

void kd_rec(
    const float* points, int32_t* idx, int64_t s, int64_t pos,
    int32_t* splits_flat, const int64_t* level_offsets, int depth_total) {
  if (s == 1) return;
  // max-spread axis over this subtree (first max wins, numpy argmax)
  float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < s; ++i) {
    const float* p = points + (int64_t)idx[i] * 3;
    for (int a = 0; a < 3; ++a) {
      mn[a] = std::min(mn[a], p[a]);
      mx[a] = std::max(mx[a], p[a]);
    }
  }
  int axis = 0;
  float best = mx[0] - mn[0];
  for (int a = 1; a < 3; ++a) {
    const float spread = mx[a] - mn[a];
    if (spread > best) { best = spread; axis = a; }
  }
  // stable sort by coordinate (ties keep current order — matches
  // numpy argsort(kind='stable'))
  std::stable_sort(idx, idx + s, [&](int32_t a, int32_t b) {
    return points[(int64_t)a * 3 + axis] < points[(int64_t)b * 3 + axis];
  });
  // model level merging this node's children: log2(s) - 1
  int lvl = 0;
  while ((int64_t(1) << (lvl + 1)) < s) ++lvl;  // lvl = log2(s) - 1
  splits_flat[level_offsets[lvl] + 2 * pos] = axis;
  splits_flat[level_offsets[lvl] + 2 * pos + 1] = axis;
  const int64_t half = s / 2;
  kd_rec(points, idx, half, pos * 2, splits_flat, level_offsets,
         depth_total);
  kd_rec(points, idx + half, half, pos * 2 + 1, splits_flat,
         level_offsets, depth_total);
}

}  // namespace

void kd_build(
    const float* points, int64_t n, int32_t* order,
    int32_t* splits_flat) {
  int depth = 0;
  while ((int64_t(1) << depth) < n) ++depth;
  std::vector<int64_t> offsets(depth);
  int64_t off = 0;
  for (int l = 0; l < depth; ++l) {
    offsets[l] = off;
    off += n >> l;
  }
  for (int64_t i = 0; i < n; ++i) order[i] = (int32_t)i;
  kd_rec(points, order, n, 0, splits_flat, offsets.data(), depth);
}

// ------------------------------------------------- KITTI eval statistics
// One frame's TP/FP/FN/similarity accumulation over T score thresholds —
// the hot inner kernel of the official mAP evaluator (reference
// libs/tools/eval.py::compute_statistics_jit + fused_compute_statistics).
//
// overlaps: [dt, gt] row-major; gt_datas: [gt, 5] (bbox, alpha);
// dt_datas: [dt, 6] (bbox, alpha, score); ignored_gt/dt: int32;
// dc_bboxes: [ndc, 4]; thresholds: [T]; pr: [T, 4] accumulated in place.
void kitti_eval_fused_statistics(
    const double* overlaps, int64_t num_dt, int64_t num_gt,
    const double* gt_datas, const double* dt_datas,
    const int32_t* ignored_gt, const int32_t* ignored_det,
    const double* dc_bboxes, int64_t num_dc,
    int metric, double min_overlap,
    const double* thresholds, int64_t num_t,
    int compute_aos, double* pr) {
  constexpr double NO_DETECTION = -10000000.0;
  std::vector<char> assigned(num_dt), ignored_threshold(num_dt);
  for (int64_t t = 0; t < num_t; ++t) {
    const double thresh = thresholds[t];
    std::fill(assigned.begin(), assigned.end(), 0);
    for (int64_t j = 0; j < num_dt; ++j)
      ignored_threshold[j] = dt_datas[j * 6 + 5] < thresh;
    int64_t tp = 0, fp = 0, fn = 0;
    double similarity = 0.0;
    int64_t n_delta = 0;
    std::vector<double> delta(num_gt);
    for (int64_t i = 0; i < num_gt; ++i) {
      if (ignored_gt[i] == -1) continue;
      int64_t det_idx = -1;
      double valid_detection = NO_DETECTION;
      double max_overlap = 0.0;
      bool assigned_ignored_det = false;
      for (int64_t j = 0; j < num_dt; ++j) {
        if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
          continue;
        const double overlap = overlaps[j * num_gt + i];
        if (overlap > min_overlap &&
            (overlap > max_overlap || assigned_ignored_det) &&
            ignored_det[j] == 0) {
          max_overlap = overlap;
          det_idx = j;
          valid_detection = 1;
          assigned_ignored_det = false;
        } else if (overlap > min_overlap &&
                   valid_detection == NO_DETECTION &&
                   ignored_det[j] == 1) {
          det_idx = j;
          valid_detection = 1;
          assigned_ignored_det = true;
        }
      }
      if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
        ++fn;
      } else if (valid_detection != NO_DETECTION &&
                 (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
        assigned[det_idx] = 1;
      } else if (valid_detection != NO_DETECTION) {
        ++tp;
        if (compute_aos)
          delta[n_delta++] =
              gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4];
        assigned[det_idx] = 1;
      }
    }
    for (int64_t j = 0; j < num_dt; ++j) {
      if (!(assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
            ignored_threshold[j]))
        ++fp;
    }
    // DontCare absorption (metric 0 only)
    int64_t nstuff = 0;
    if (metric == 0 && num_dc > 0) {
      for (int64_t d = 0; d < num_dc; ++d) {
        const double* dc = dc_bboxes + d * 4;
        for (int64_t j = 0; j < num_dt; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ignored_threshold[j])
            continue;
          const double* bb = dt_datas + j * 6;
          const double iw = std::min(bb[2], dc[2]) - std::max(bb[0], dc[0]);
          if (iw <= 0) continue;
          const double ih = std::min(bb[3], dc[3]) - std::max(bb[1], dc[1]);
          if (ih <= 0) continue;
          const double area = (bb[2] - bb[0]) * (bb[3] - bb[1]);
          if (area <= 0) continue;
          if (iw * ih / area > min_overlap) {
            assigned[j] = 1;
            ++nstuff;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      double sim = 0.0;
      for (int64_t k = 0; k < n_delta; ++k)
        sim += (1.0 + std::cos(delta[k])) / 2.0;
      similarity = (tp > 0 || fp > 0) ? sim : -1.0;
    }
    pr[t * 4 + 0] += (double)tp;
    pr[t * 4 + 1] += (double)fp;
    pr[t * 4 + 2] += (double)fn;
    if (compute_aos && similarity != -1.0) pr[t * 4 + 3] += similarity;
  }
}

// -------------------------------------- KITTI eval batched driver loops
// One native call per eval instead of one per frame (ctypes dispatch was
// ~30% of official-eval wall at val-split scale). Frames are passed as
// flat concatenations + per-frame counts; the PR accumulation threads
// over frame ranges with per-thread [T, 4] partials (order-independent
// sums, so the merge is exact).
void kitti_eval_fused_statistics_batch(
    const double* overlaps_flat, const int64_t* dt_counts,
    const int64_t* gt_counts, int64_t n_frames,
    const double* gt_datas_flat, const double* dt_datas_flat,
    const int32_t* ignored_gt_flat, const int32_t* ignored_det_flat,
    const double* dc_flat, const int64_t* dc_counts,
    int metric, double min_overlap,
    const double* thresholds, int64_t num_t,
    int compute_aos, int64_t num_threads, double* pr) {
  std::vector<int64_t> ov_off(n_frames + 1, 0), gt_off(n_frames + 1, 0),
      dt_off(n_frames + 1, 0), dc_off(n_frames + 1, 0);
  for (int64_t f = 0; f < n_frames; ++f) {
    ov_off[f + 1] = ov_off[f] + dt_counts[f] * gt_counts[f];
    gt_off[f + 1] = gt_off[f] + gt_counts[f];
    dt_off[f + 1] = dt_off[f] + dt_counts[f];
    dc_off[f + 1] = dc_off[f] + dc_counts[f];
  }
  int64_t nt = num_threads > 0
                   ? num_threads
                   : (int64_t)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > n_frames) nt = n_frames;
  if (n_frames < 64) nt = 1;
  std::vector<std::vector<double>> partials(
      (size_t)nt, std::vector<double>(num_t * 4, 0.0));
  auto work = [&](int64_t t0, int64_t t1, std::vector<double>& acc) {
    for (int64_t f = t0; f < t1; ++f) {
      kitti_eval_fused_statistics(
          overlaps_flat + ov_off[f], dt_counts[f], gt_counts[f],
          gt_datas_flat + gt_off[f] * 5, dt_datas_flat + dt_off[f] * 6,
          ignored_gt_flat + gt_off[f], ignored_det_flat + dt_off[f],
          dc_flat + dc_off[f] * 4, dc_counts[f], metric, min_overlap,
          thresholds, num_t, compute_aos, acc.data());
    }
  };
  if (nt == 1) {
    work(0, n_frames, partials[0]);
  } else {
    std::vector<std::thread> ts;
    const int64_t per = (n_frames + nt - 1) / nt;
    for (int64_t t = 0; t < nt; ++t) {
      const int64_t a = t * per;
      const int64_t b = std::min(n_frames, a + per);
      if (a >= b) break;
      ts.emplace_back(work, a, b, std::ref(partials[(size_t)t]));
    }
    for (auto& th : ts) th.join();
  }
  for (const auto& acc : partials)
    for (int64_t i = 0; i < num_t * 4; ++i) pr[i] += acc[i];
}

int64_t kitti_eval_collect_thresholds(
    const double* overlaps, int64_t num_dt, int64_t num_gt,
    const double* dt_scores, const int32_t* ignored_gt,
    const int32_t* ignored_det, double min_overlap, double* out_scores);

// Batched threshold collection: out_scores must hold sum(gt_counts).
int64_t kitti_eval_collect_thresholds_batch(
    const double* overlaps_flat, const int64_t* dt_counts,
    const int64_t* gt_counts, int64_t n_frames,
    const double* dt_scores_flat, const int32_t* ignored_gt_flat,
    const int32_t* ignored_det_flat, double min_overlap,
    double* out_scores) {
  int64_t ov_off = 0, gt_off = 0, dt_off = 0, n_out = 0;
  for (int64_t f = 0; f < n_frames; ++f) {
    n_out += kitti_eval_collect_thresholds(
        overlaps_flat + ov_off, dt_counts[f], gt_counts[f],
        dt_scores_flat + dt_off, ignored_gt_flat + gt_off,
        ignored_det_flat + dt_off, min_overlap, out_scores + n_out);
    ov_off += dt_counts[f] * gt_counts[f];
    gt_off += gt_counts[f];
    dt_off += dt_counts[f];
  }
  return n_out;
}

// ---------------------------------------- KITTI eval threshold collection
// The matching pass at thresh=0 / compute_fp=false: every evaluated gt
// takes the max-SCORE unassigned detection above min_overlap; matched
// tp scores are the candidate thresholds fed to get_thresholds
// (reference compute_statistics_jit's thresholds list). out_scores must
// hold num_gt doubles; returns the number written.
int64_t kitti_eval_collect_thresholds(
    const double* overlaps, int64_t num_dt, int64_t num_gt,
    const double* dt_scores,
    const int32_t* ignored_gt, const int32_t* ignored_det,
    double min_overlap, double* out_scores) {
  constexpr double NO_DETECTION = -10000000.0;
  std::vector<char> assigned(num_dt, 0);
  int64_t n_out = 0;
  for (int64_t i = 0; i < num_gt; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DETECTION;
    for (int64_t j = 0; j < num_dt; ++j) {
      if (ignored_det[j] == -1 || assigned[j]) continue;
      if (overlaps[j * num_gt + i] > min_overlap &&
          dt_scores[j] > valid_detection) {
        det_idx = j;
        valid_detection = dt_scores[j];
      }
    }
    if (valid_detection == NO_DETECTION) continue;
    if (ignored_gt[i] == 1 || ignored_det[det_idx] == 1) {
      assigned[det_idx] = 1;
    } else {
      out_scores[n_out++] = dt_scores[det_idx];
      assigned[det_idx] = 1;
    }
  }
  return n_out;
}

// ------------------------------------------------------- anchors-area SAT
// Dense per-BEV-cell voxel counts -> 2-d summed-area table -> 4-corner
// gather per anchor, fused in one call (the numpy chain costs two full
// [ny,nx] cumsum allocations plus a [4,N] fancy gather per sample).
// coors is the [v, c] int32 voxel-coordinate array using columns 1 (y)
// and 2 (x); indices is the [4, n] flat corner-index table precomputed
// per anchor grid (box_np.precompute_anchor_area_indices).
void anchors_area_sat(const int32_t* coors, int64_t v, int64_t c,
                      int64_t ny, int64_t nx, const int64_t* indices,
                      int64_t n, float* sat, float* out) {
  std::fill(sat, sat + ny * nx, 0.f);
  for (int64_t i = 0; i < v; ++i) {
    const int64_t y = coors[i * c + 1], x = coors[i * c + 2];
    // the caller contract is the valid [:num_voxels] slice, but a
    // padded row (-1) or mismatched grid must not write out of bounds
    // (the numpy twin raises; silent heap corruption is worse)
    if (y < 0 || y >= ny || x < 0 || x >= nx) continue;
    sat[y * nx + x] += 1.f;
  }
  for (int64_t y = 0; y < ny; ++y) {
    float run = 0.f;
    float* row = sat + y * nx;
    const float* prev = row - nx;
    if (y == 0) {
      for (int64_t x = 0; x < nx; ++x) {
        run += row[x];
        row[x] = run;
      }
    } else {
      for (int64_t x = 0; x < nx; ++x) {
        run += row[x];
        row[x] = run + prev[x];
      }
    }
  }
  const int64_t* iD = indices;
  const int64_t* iB = indices + n;
  const int64_t* iC = indices + 2 * n;
  const int64_t* iA = indices + 3 * n;
  for (int64_t i = 0; i < n; ++i)
    out[i] = sat[iD[i]] - sat[iB[i]] - sat[iC[i]] + sat[iA[i]];
}

// ----------------------------------------------------- fused target assign
// The nearest-IoU target-assignment core: per-anchor best-GT (max +
// argmax), per-GT best overlap, and the force-match tie set — all in ONE
// streaming pass over the [n, k] pair space, never materializing the
// IoU matrix for python (whose per-row reduction overheads dominate the
// prep profile at ~100k anchors x ~20 GT). The force-match tie set
// compares RECORDED pass-1 values against the merged column max (see
// the comment above pass1) — no IoU is ever recomputed, so the tie test
// cannot be broken by FP-contraction differences between loops. Ties
// keep the first index, matching numpy argmax; an anchor tying several
// GTs is emitted once (the label write it feeds is idempotent — it uses
// the anchor's own row argmax).
static inline float iou2d_one(const float* b, const float* q, double qarea,
                              double barea, float eps) {
  const double iw = std::min((double)b[2], (double)q[2]) -
                    std::max((double)b[0], (double)q[0]) + eps;
  if (iw <= 0) return 0.f;
  const double ih = std::min((double)b[3], (double)q[3]) -
                    std::max((double)b[1], (double)q[1]) + eps;
  if (ih <= 0) return 0.f;
  const double inter = iw * ih;
  return (float)(inter / (barea + qarea - inter));
}

int64_t iou2d_assign(const float* boxes, int64_t n, const float* qboxes,
                     int64_t k, float eps, int32_t* row_argmax,
                     float* row_max, float* col_max,
                     int32_t* force_anchors, int64_t num_threads) {
  std::vector<double> qarea(k);
  for (int64_t j = 0; j < k; ++j) {
    qarea[j] = ((double)qboxes[j * 4 + 2] - qboxes[j * 4] + eps) *
               ((double)qboxes[j * 4 + 3] - qboxes[j * 4 + 1] + eps);
    col_max[j] = 0.f;
  }
  // threads over anchor ranges; per-thread col max merged with fmax
  // (exact — max is order-independent), per-thread force lists
  // concatenated in range order (preserves the anchor-major emission
  // order of the single-thread loop)
  int64_t nt = num_threads > 0
                   ? num_threads
                   : (int64_t)std::thread::hardware_concurrency();
  nt = std::max<int64_t>(1, std::min<int64_t>(nt, 8));
  if (num_threads <= 0 && n * k < 200000) nt = 1;

  // Force-match ties are found WITHOUT recomputing IoUs: pass 1 records,
  // per GT, every (anchor, v) whose v matched the running column max (a
  // ~log(n)-sized candidate list); the final filter compares those
  // RECORDED values against the merged col_max. Robust by construction —
  // a recompute-and-float-compare second pass would silently drop
  // anchors if the two loops compiled to different FP contractions.
  using Cand = std::vector<std::vector<std::pair<int32_t, float>>>;
  auto pass1 = [&](int64_t i0, int64_t i1, float* cm, Cand* cand) {
    for (int64_t i = i0; i < i1; ++i) {
      const float* b = boxes + i * 4;
      const double barea =
          ((double)b[2] - b[0] + eps) * ((double)b[3] - b[1] + eps);
      float bm = -1.f;
      int32_t barg = 0;
      for (int64_t j = 0; j < k; ++j) {
        const float v =
            iou2d_one(b, qboxes + j * 4, qarea[j], barea, eps);
        if (v > bm) {
          bm = v;
          barg = (int32_t)j;
        }
        if (v > 0.f && v >= cm[j]) {
          cm[j] = v;
          (*cand)[j].emplace_back((int32_t)i, v);
        }
      }
      row_max[i] = bm;
      row_argmax[i] = barg;
    }
  };

  const int64_t chunk = nt == 1 ? n : (n + nt - 1) / nt;
  std::vector<std::vector<float>> cms(nt, std::vector<float>(k, 0.f));
  std::vector<Cand> cands(nt, Cand(k));
  if (nt == 1) {
    pass1(0, n, cms[0].data(), &cands[0]);
  } else {
    std::vector<std::thread> ts;
    for (int64_t t = 0; t < nt; ++t)
      ts.emplace_back(pass1, t * chunk, std::min(n, (t + 1) * chunk),
                      cms[t].data(), &cands[t]);
    for (auto& t : ts) t.join();
  }
  for (int64_t t = 0; t < nt; ++t)
    for (int64_t j = 0; j < k; ++j)
      if (cms[t][j] > col_max[j]) col_max[j] = cms[t][j];
  // mark every anchor whose recorded v equals the global column max,
  // then emit ascending — identical to the old anchor-major emission
  std::vector<uint8_t> forced(n, 0);
  for (int64_t t = 0; t < nt; ++t)
    for (int64_t j = 0; j < k; ++j)
      for (const auto& iv : cands[t][j])
        if (iv.second == col_max[j]) forced[iv.first] = 1;
  int64_t cnt = 0;
  for (int64_t i = 0; i < n; ++i)
    if (forced[i]) force_anchors[cnt++] = (int32_t)i;
  return cnt;
}

}  // extern "C"
