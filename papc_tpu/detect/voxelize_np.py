"""Host-side (numpy) voxelization / pillarization.

Reference parity: ``libs/ops/point_cloud/point_cloud_ops.py`` (numba
``_points_to_voxel_reverse_kernel`` + wrapper, :7-166) and
``bev_ops.points_to_bev`` (:61-103). The reference's single-threaded numba
loop is replaced by vectorized numpy with IDENTICAL first-come semantics:

  * voxels appear in order of first point occurrence;
  * at most ``max_points`` points per voxel — the FIRST ones by input
    order (reference truncation, ``point_cloud_ops.py:49-52``);
  * at most ``max_voxels`` voxels — later-appearing voxels are dropped
    whole, while earlier voxels still collect their later points.
"""

from __future__ import annotations

import numpy as np


def compute_grid_size(voxel_size, point_cloud_range) -> np.ndarray:
    """[nx, ny, nz] = round((range_max - range_min) / voxel_size)
    (reference ``core/voxel_generator.py:14-16``)."""
    voxel_size = np.asarray(voxel_size, np.float64)
    pc_range = np.asarray(point_cloud_range, np.float64)
    return np.round(
        (pc_range[3:] - pc_range[:3]) / voxel_size
    ).astype(np.int64)


def points_to_voxel(
    points: np.ndarray,
    voxel_size,
    point_cloud_range,
    max_points: int = 35,
    max_voxels: int = 20000,
    reverse_index: bool = True,
    pad_output: bool = False,
):
    """Hash points into voxels.

    Args:
      points: ``[N, D]`` with xyz in the first 3 columns.
      reverse_index: coords returned as (z, y, x) when True (reference
        default — the scatter step expects zyx).
      pad_output: return fixed-size ``[max_voxels, ...]`` arrays (for
        static-shape device feeds) instead of trimming to K.

    Returns:
      voxels ``[K, max_points, D]``, coords ``[K, 3]`` int32,
      num_points_per_voxel ``[K]`` int32.
    """
    points = np.asarray(points)
    # native fast path (papc_cc, ~12x): identical first-come semantics
    if points.dtype == np.float32:
        try:
            from papc_tpu import cc

            if cc.available():
                if pad_output:
                    # kernel writes straight into fresh caller-owned
                    # padded arrays — no trim-then-pad recopy
                    pv, pc, pn, K = cc.points_to_voxel_padded(
                        points, voxel_size, point_cloud_range,
                        max_points, max_voxels,
                    )
                    if not reverse_index:
                        pc[:K] = pc[:K, ::-1]
                    return pv, pc, pn
                # cc returns views into reused buffers — copy here so
                # the public contract stays "caller owns the result"
                voxels, coords, nppv = cc.points_to_voxel(
                    points, voxel_size, point_cloud_range,
                    max_points, max_voxels,
                )
                if not reverse_index:
                    coords = coords[:, ::-1]
                return voxels.copy(), coords.copy(), nppv.copy()
        except Exception:
            pass
    return _points_to_voxel_np(
        points, voxel_size, point_cloud_range, max_points, max_voxels,
        reverse_index, pad_output,
    )


def _points_to_voxel_np(
    points,
    voxel_size,
    point_cloud_range,
    max_points=35,
    max_voxels=20000,
    reverse_index=True,
    pad_output=False,
):
    """Pure-numpy fallback (also the cc parity oracle)."""
    voxel_size = np.asarray(voxel_size, points.dtype)
    pc_range = np.asarray(point_cloud_range, points.dtype)
    grid = compute_grid_size(voxel_size, pc_range)  # [nx, ny, nz]

    coords = np.floor(
        (points[:, :3] - pc_range[:3]) / voxel_size
    ).astype(np.int64)  # (x, y, z) cell indices
    in_bounds = ((coords >= 0) & (coords < grid[None, :])).all(axis=1)
    pts = points[in_bounds]
    coords = coords[in_bounds]

    linear = (
        coords[:, 2] * grid[1] * grid[0]
        + coords[:, 1] * grid[0]
        + coords[:, 0]
    )
    # voxel ids in first-occurrence order
    uniq, first_pos, inv = np.unique(
        linear, return_index=True, return_inverse=True
    )
    occ_order = np.argsort(first_pos, kind="stable")
    # voxel_rank[u] = first-occurrence rank of unique id u
    voxel_rank = np.empty(len(uniq), np.int64)
    voxel_rank[occ_order] = np.arange(len(uniq))
    point_voxel = voxel_rank[inv]  # per point, first-come voxel index

    # within-voxel rank (points stay in input order)
    order = np.argsort(point_voxel, kind="stable")
    pv_sorted = point_voxel[order]
    seg_start = np.r_[0, np.flatnonzero(np.diff(pv_sorted)) + 1]
    starts = np.repeat(seg_start, np.diff(np.r_[seg_start, len(pv_sorted)]))
    within = np.arange(len(pv_sorted)) - starts

    keep = (pv_sorted < max_voxels) & (within < max_points)
    sel = order[keep]
    vr = pv_sorted[keep]
    wr = within[keep]

    K = min(len(uniq), max_voxels)
    out_n = max_voxels if pad_output else K
    D = points.shape[1]
    voxels = np.zeros((out_n, max_points, D), dtype=points.dtype)
    voxels[vr, wr] = pts[sel]
    out_coords = np.zeros((out_n, 3), dtype=np.int32)
    uniq_first_come = uniq[occ_order[:K]]
    cz = uniq_first_come // (grid[1] * grid[0])
    rem = uniq_first_come % (grid[1] * grid[0])
    cy = rem // grid[0]
    cx = rem % grid[0]
    if reverse_index:
        out_coords[:K] = np.stack([cz, cy, cx], axis=1)
    else:
        out_coords[:K] = np.stack([cx, cy, cz], axis=1)
    num_points = np.zeros((out_n,), dtype=np.int32)
    np.add.at(num_points, vr, 1)
    return voxels, out_coords, num_points if pad_output else num_points[:K]


class VoxelGenerator:
    """Config-bound facade (reference ``core/voxel_generator.py:5-43``)."""

    def __init__(
        self,
        voxel_size,
        point_cloud_range,
        max_num_points: int,
        max_voxels: int = 20000,
    ):
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.max_num_points = max_num_points
        self.max_voxels = max_voxels
        self.grid_size = compute_grid_size(voxel_size, point_cloud_range)

    def generate(self, points: np.ndarray, max_voxels: int | None = None):
        return points_to_voxel(
            points,
            self.voxel_size,
            self.point_cloud_range,
            self.max_num_points,
            max_voxels or self.max_voxels,
        )


def points_to_bev(
    points: np.ndarray,
    voxel_size,
    point_cloud_range,
    with_reflectivity: bool = False,
):
    """Bird's-eye-view maps: per-height-slice max height + density channel
    (+ max reflectivity) — reference ``bev_ops.py:6-103``.

    Returns ``[nz+1(+1), ny, nx]`` float32.
    """
    voxel_size = np.asarray(voxel_size, np.float64)
    pc_range = np.asarray(point_cloud_range, np.float64)
    grid = compute_grid_size(voxel_size, pc_range)  # [nx, ny, nz]
    nx, ny, nz = int(grid[0]), int(grid[1]), int(grid[2])
    n_channels = nz + 1 + (1 if with_reflectivity else 0)
    bev = np.zeros((n_channels, ny, nx), dtype=np.float32)

    coords = np.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(
        np.int64
    )
    ok = ((coords >= 0) & (coords < grid[None, :])).all(axis=1)
    pts = points[ok]
    cx, cy, cz = coords[ok, 0], coords[ok, 1], coords[ok, 2]
    # height maps: max z per (slice, y, x)
    np.maximum.at(bev, (cz, cy, cx), pts[:, 2].astype(np.float32))
    # density channel (log-normalized like the reference wrapper)
    count = np.zeros((ny, nx), dtype=np.float32)
    np.add.at(count, (cy, cx), 1.0)
    bev[nz] = np.minimum(1.0, np.log(count + 1) / np.log(64))
    if with_reflectivity and points.shape[1] > 3:
        np.maximum.at(
            bev, (np.full_like(cz, nz + 1), cy, cx),
            pts[:, 3].astype(np.float32),
        )
    return bev
