"""papc_cc — native host kernels (ctypes bindings over the C++ core).

Replaces the reference's native tier (numba JIT kernels, boost::geometry
pybind11 modules, import-time g++/nvcc JIT — SURVEY §2.4) with one
ahead-of-time-built shared library. ``build()`` compiles it once with
g++ -O3; :func:`available` gates callers so every kernel also has a pure
numpy twin in ``papc_tpu.detect`` (used when the library is absent).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "papc_cc.cpp")
_LIB = os.path.join(_DIR, "libpapc_cc.so")

_lib = None


_build_lock = threading.Lock()


def build(force: bool = False) -> str:
    """Compile the shared library (idempotent). Writes to a temp file
    and os.replace()s it in: processes still executing the OLD mapped
    library keep their inode (no SIGBUS from in-place truncation), and
    a concurrent loader can never dlopen a half-written ELF."""
    with _build_lock:
        if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            tmp = _LIB + f".build-{os.getpid()}"
            subprocess.check_call(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-pthread", "-std=c++17", _SRC, "-o", tmp,
                ]
            )
            os.replace(tmp, _LIB)
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB):
        build()
    lib = ctypes.CDLL(_LIB)
    try:
        _bind(lib)
    except AttributeError:
        # stale .so missing newly added symbols (e.g. an mtime-preserving
        # copy defeated build()'s freshness check): rebuild, then load
        # through a uniquely-named copy — dlopen caches by path/inode, so
        # reloading the original path could hand back the old object
        build(force=True)
        import shutil
        import tempfile

        fd, tmp = tempfile.mkstemp(suffix=".so")
        os.close(fd)
        shutil.copy2(_LIB, tmp)
        lib = ctypes.CDLL(tmp)
        # the dlopen mapping keeps the inode alive on Linux — unlink now
        # so the fallback never leaks a temp .so per process
        os.unlink(tmp)
        _bind(lib)
    _lib = lib
    return lib


def _bind(lib):
    i64, i32, f32, u8 = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    )
    p64 = ctypes.POINTER(ctypes.c_int64)
    lib.points_to_voxel.restype = ctypes.c_int
    lib.points_to_voxel.argtypes = [
        f32, i64, i64, f32, f32, p64, i32, f32, i32, i32, i64, i64,
    ]
    lib.points_to_voxel_epoch.restype = ctypes.c_int
    lib.points_to_voxel_epoch.argtypes = [
        f32, i64, i64, f32, f32, p64, i32, i32, ctypes.c_int32,
        p64, f32, i32, i32, i64, i64,
        ctypes.c_int32,
    ]
    lib.points_to_voxel_flat_epoch.restype = ctypes.c_int
    lib.points_to_voxel_flat_epoch.argtypes = [
        f32, i64, i64, f32, f32, p64, i32, i32, ctypes.c_int32,
        p64, f32, i32, i32, i32, i64, i64, i64, i32,
    ]
    lib.rbbox_iou.restype = None
    lib.rbbox_iou.argtypes = [
        f32, i64, f32, i64, ctypes.c_float, ctypes.c_int, f32,
    ]
    lib.d3_box_overlap.restype = None
    lib.d3_box_overlap.argtypes = [
        f32, i64, f32, i64, ctypes.c_int, f32,
    ]
    lib.iou2d.restype = None
    lib.iou2d.argtypes = [f32, i64, f32, i64, ctypes.c_float, f32]
    lib.iou2d_assign.restype = i64
    lib.iou2d_assign.argtypes = [
        f32, i64, f32, i64, ctypes.c_float, i32, f32, f32, i32, i64,
    ]
    lib.anchors_area_sat.restype = None
    lib.anchors_area_sat.argtypes = [
        i32, i64, i64, i64, i64, p64, i64, f32, f32,
    ]
    lib.nms_cpu.restype = ctypes.c_int
    lib.nms_cpu.argtypes = [f32, i64, ctypes.c_float, u8]
    lib.rotate_nms_cpu.restype = ctypes.c_int
    lib.rotate_nms_cpu.argtypes = [f32, i64, ctypes.c_float, u8]
    lib.points_in_polygon3d.restype = None
    lib.points_in_polygon3d.argtypes = [f32, i64, f32, i64, u8]
    lib.box_collision_test.restype = None
    lib.box_collision_test.argtypes = [f32, i64, f32, i64, u8]
    lib.noise_select.restype = None
    lib.noise_select.argtypes = [
        f32, i64, i64, f32, p64, p64, i64, u8, p64,
    ]
    lib.kd_build.restype = None
    lib.kd_build.argtypes = [f32, i64, i32, i32]
    f64 = ctypes.POINTER(ctypes.c_double)
    lib.kitti_eval_fused_statistics.restype = None
    lib.kitti_eval_fused_statistics.argtypes = [
        f64, i64, i64, f64, f64, i32, i32, f64, i64,
        ctypes.c_int, ctypes.c_double, f64, i64, ctypes.c_int, f64,
    ]
    lib.kitti_eval_collect_thresholds.restype = i64
    lib.kitti_eval_collect_thresholds.argtypes = [
        f64, i64, i64, f64, i32, i32, ctypes.c_double, f64,
    ]
    lib.kitti_eval_fused_statistics_batch.restype = None
    lib.kitti_eval_fused_statistics_batch.argtypes = [
        f64, p64, p64, i64, f64, f64, i32, i32, f64, p64,
        ctypes.c_int, ctypes.c_double, f64, i64, ctypes.c_int, i64, f64,
    ]
    lib.kitti_eval_collect_thresholds_batch.restype = i64
    lib.kitti_eval_collect_thresholds_batch.argtypes = [
        f64, p64, p64, i64, f64, i32, i32, ctypes.c_double, f64,
    ]


def available() -> bool:
    """Probe whether the native tier is usable. Broad catch by design:
    this is the fall-back-to-numpy decision point, and ANY load/bind
    failure (missing toolchain, stale .so whose rebuild also failed)
    must mean "use the fallback", not a crash in host prep."""
    try:
        _load()
        return True
    except Exception:  # noqa: BLE001
        return False


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# Persistent per-workload voxelizer state: buffers survive across calls so
# per-frame cost is proportional to the points processed, not to the
# [max_voxels, max_points, D] output capacity (the reference re-JITs and
# re-allocates per call; a fresh 19 MB np.zeros alone costs ~1.3 ms at
# KITTI pillar scale). The lock serializes access to the shared epoch
# tables: the train prefetch thread and the main-thread eval prep hit the
# same grid's scratch concurrently (STEPS_PER_EVAL with NUM_WORKERS=0),
# and an interleaved epoch bump would corrupt the first-come table.
_vox_cache: dict = {}
_vox_lock = threading.Lock()


def _grid_of(point_cloud_range, voxel_size) -> np.ndarray:
    """THE grid-size truth source: numpy float64 half-to-even round,
    exactly as the oracle and every scratch-table allocation compute it.
    The C++ kernels take these dims as an argument rather than
    recomputing them (a C float round once disagreed on .5 extents and
    indexed past the scratch tables)."""
    return np.round(
        (np.asarray(point_cloud_range[3:]) - np.asarray(point_cloud_range[:3]))
        / np.asarray(voxel_size)
    ).astype(np.int64)


def _get_scratch(key, grid, N):
    """Shared scratch tables under _vox_lock: create/grow, bump epoch
    (overflow-safe). Returns the state dict; caller holds the lock."""
    st = _vox_cache.get(key)
    if st is None:
        st = {
            "scratch_epoch": np.zeros(int(grid.prod()), np.int32),
            "scratch_idx": np.empty(int(grid.prod()), np.int32),
            "lin": np.empty((N,), np.int64),
            "epoch": 0,
        }
        _vox_cache[key] = st
    if len(st["lin"]) < N:
        st["lin"] = np.empty((N,), np.int64)
    st["epoch"] += 1
    if st["epoch"] >= np.iinfo(np.int32).max:
        st["scratch_epoch"].fill(0)
        st["epoch"] = 1
    return st


def points_to_voxel(
    points: np.ndarray,
    voxel_size,
    point_cloud_range,
    max_points: int = 35,
    max_voxels: int = 20000,
):
    """First-come voxelization, exact reference semantics. Returns
    (voxels [K, max_points, D], coords [K, 3] zyx, num_points [K]).

    The returned arrays are views into per-workload, PER-THREAD buffers
    that are REUSED by the same thread's next call with the same (grid,
    max_points, max_voxels, D) — copy them if they must outlive that
    call. Every in-repo consumer (prep_pointcloud → collate, the
    pad_output path, tests) copies immediately.
    """
    lib = _load()
    points = _f32(points)
    vsz = _f32(voxel_size)
    rng = _f32(point_cloud_range)
    grid = _grid_of(point_cloud_range, voxel_size)
    N, D = points.shape
    key = (grid.tobytes(), int(max_points), int(max_voxels), int(D))
    with _vox_lock:
        st = _get_scratch(key, grid, N)
        # output buffers are PER-THREAD: the returned arrays are views,
        # and another thread's next call must not overwrite them while
        # this caller is still copying (the scratch tables stay shared —
        # the epoch bump under the lock resets them per call anyway).
        # Entries of dead threads are evicted so thread churn cannot
        # grow the cache without bound.
        live = {t.ident for t in threading.enumerate()}
        for ok_ in [k_ for k_ in _vox_cache
                    if isinstance(k_, tuple) and len(k_) == 2
                    and isinstance(k_[1], int) and k_[1] not in live]:
            del _vox_cache[ok_]
        out_key = (key, threading.get_ident())
        out = _vox_cache.get(out_key)
        if out is None:
            out = {
                "voxels": np.zeros((max_voxels, max_points, D), np.float32),
                "coords": np.zeros((max_voxels, 3), np.int32),
                "nppv": np.zeros((max_voxels,), np.int32),
                "prev_k": 0,
            }
            _vox_cache[out_key] = out
        k = lib.points_to_voxel_epoch(
            _ptr(points, ctypes.c_float), N, D,
            _ptr(vsz, ctypes.c_float), _ptr(rng, ctypes.c_float),
            _ptr(grid, ctypes.c_int64),
            _ptr(st["scratch_epoch"], ctypes.c_int32),
            _ptr(st["scratch_idx"], ctypes.c_int32),
            st["epoch"],
            _ptr(st["lin"], ctypes.c_int64),
            _ptr(out["voxels"], ctypes.c_float),
            _ptr(out["coords"], ctypes.c_int32),
            _ptr(out["nppv"], ctypes.c_int32),
            max_points, max_voxels, out["prev_k"],
        )
        out["prev_k"] = k
        return out["voxels"][:k], out["coords"][:k], out["nppv"][:k]


def points_to_voxel_padded(
    points: np.ndarray,
    voxel_size,
    point_cloud_range,
    max_points: int = 35,
    max_voxels: int = 20000,
):
    """Like :func:`points_to_voxel` but returns fresh CALLER-OWNED
    fixed-size arrays (``[max_voxels, ...]``) — the static-shape feed the
    training pipeline wants. The kernel writes straight into the padded
    arrays (no trim-then-pad recopy); only the epoch-tagged scratch
    tables are reused across calls."""
    lib = _load()
    points = _f32(points)
    vsz = _f32(voxel_size)
    rng = _f32(point_cloud_range)
    grid = _grid_of(point_cloud_range, voxel_size)
    N, D = points.shape
    key = ("scratch", grid.tobytes())
    voxels = np.zeros((max_voxels, max_points, D), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    nppv = np.zeros((max_voxels,), np.int32)
    with _vox_lock:
        st = _get_scratch(key, grid, N)
        k = lib.points_to_voxel_epoch(
            _ptr(points, ctypes.c_float), N, D,
            _ptr(vsz, ctypes.c_float), _ptr(rng, ctypes.c_float),
            _ptr(grid, ctypes.c_int64),
            _ptr(st["scratch_epoch"], ctypes.c_int32),
            _ptr(st["scratch_idx"], ctypes.c_int32),
            st["epoch"],
            _ptr(st["lin"], ctypes.c_int64),
            _ptr(voxels, ctypes.c_float),
            _ptr(coords, ctypes.c_int32),
            _ptr(nppv, ctypes.c_int32),
            max_points, max_voxels, 0,
        )
    return voxels, coords, nppv, k


def points_to_voxel_flat(
    points: np.ndarray,
    voxel_size,
    point_cloud_range,
    max_points: int = 35,
    max_voxels: int = 20000,
    n_cap: int = 25600,
):
    """Flat-mode voxelization for the flat-points PFN: same first-come
    pillar assignment and per-pillar truncation as
    :func:`points_to_voxel`, but streams the accepted points into a
    fresh caller-owned flat ``[n_cap, D]`` array with per-point pillar
    rows (``-1`` padding) instead of filling the ~98%-zeros
    ``[max_voxels, max_points, D]`` grid. Returns
    ``(flat_points [n_cap, D], flat_owner [n_cap], coords
    [max_voxels, 3] zyx, num_points [max_voxels], K)``. Points past
    ``n_cap`` are dropped entirely (counts stay consistent with the
    flat view)."""
    lib = _load()
    points = _f32(points)
    vsz = _f32(voxel_size)
    rng = _f32(point_cloud_range)
    grid = _grid_of(point_cloud_range, voxel_size)
    N, D = points.shape
    key = ("scratch", grid.tobytes())
    flat = np.zeros((n_cap, D), np.float32)
    owner = np.full((n_cap,), -1, np.int32)
    coords = np.zeros((max_voxels, 3), np.int32)
    nppv = np.zeros((max_voxels,), np.int32)
    out_n = np.zeros((1,), np.int32)
    with _vox_lock:
        st = _get_scratch(key, grid, N)
        k = lib.points_to_voxel_flat_epoch(
            _ptr(points, ctypes.c_float), N, D,
            _ptr(vsz, ctypes.c_float), _ptr(rng, ctypes.c_float),
            _ptr(grid, ctypes.c_int64),
            _ptr(st["scratch_epoch"], ctypes.c_int32),
            _ptr(st["scratch_idx"], ctypes.c_int32),
            st["epoch"],
            _ptr(st["lin"], ctypes.c_int64),
            _ptr(flat, ctypes.c_float),
            _ptr(owner, ctypes.c_int32),
            _ptr(coords, ctypes.c_int32),
            _ptr(nppv, ctypes.c_int32),
            max_points, max_voxels, n_cap,
            _ptr(out_n, ctypes.c_int32),
        )
    owner[int(out_n[0]):] = -1
    return flat, owner, coords, nppv, k


def rbbox_iou(
    boxes: np.ndarray, qboxes: np.ndarray,
    standup_thresh: float = 0.0, criterion: int = -1,
) -> np.ndarray:
    lib = _load()
    boxes = _f32(boxes)
    qboxes = _f32(qboxes)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), np.float32)
    if n and k:
        lib.rbbox_iou(
            _ptr(boxes, ctypes.c_float), n,
            _ptr(qboxes, ctypes.c_float), k,
            standup_thresh, criterion, _ptr(out, ctypes.c_float),
        )
    return out


def d3_box_overlap(
    boxes: np.ndarray, qboxes: np.ndarray, criterion: int = -1
) -> np.ndarray:
    """Camera-frame 3D overlap [N,7]x[K,7] (x,y,z,l,h,w,ry) — the KITTI
    eval 3D metric's kernel (BEV rotated intersection x height overlap)."""
    lib = _load()
    boxes = _f32(boxes)
    qboxes = _f32(qboxes)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), np.float32)
    if n and k:
        lib.d3_box_overlap(
            _ptr(boxes, ctypes.c_float), n,
            _ptr(qboxes, ctypes.c_float), k,
            criterion, _ptr(out, ctypes.c_float),
        )
    return out


def iou2d(
    boxes: np.ndarray, qboxes: np.ndarray, eps: float = 0.0
) -> np.ndarray:
    """Axis-aligned [N,4] x [K,4] IoU matrix (reference numba iou_jit)."""
    lib = _load()
    boxes = _f32(boxes)
    qboxes = _f32(qboxes)
    n, k = len(boxes), len(qboxes)
    out = np.empty((n, k), np.float32)
    if n and k:
        lib.iou2d(
            _ptr(boxes, ctypes.c_float), n,
            _ptr(qboxes, ctypes.c_float), k,
            eps, _ptr(out, ctypes.c_float),
        )
    return out


def iou2d_assign(
    boxes: np.ndarray, qboxes: np.ndarray, eps: float = 0.0,
    num_threads: int = 0,
):
    """Fused nearest-IoU target-assignment core over [N,4] anchor and
    [K,4] GT standup boxes. Returns ``(row_argmax, row_max, col_max,
    force_anchors)`` — per-anchor best-GT index and overlap, per-GT best
    overlap, and the (unique) anchor indices tying some GT's best
    overlap (force matches, zero-overlap GTs excluded). Streams the pair
    space in C++ instead of materializing the IoU matrix for numpy
    reductions; equivalent to the ``create_target_np`` overlap block.
    ``num_threads``: 0 = auto (hardware concurrency, capped at 8,
    single-thread below 200k pairs); >0 forces that thread count.
    """
    lib = _load()
    boxes = _f32(boxes)
    qboxes = _f32(qboxes)
    n, k = len(boxes), len(qboxes)
    row_argmax = np.zeros((n,), np.int32)
    row_max = np.zeros((n,), np.float32)
    col_max = np.zeros((k,), np.float32)
    force = np.empty((n,), np.int32)
    cnt = 0
    if n and k:
        cnt = lib.iou2d_assign(
            _ptr(boxes, ctypes.c_float), n,
            _ptr(qboxes, ctypes.c_float), k,
            eps,
            _ptr(row_argmax, ctypes.c_int32),
            _ptr(row_max, ctypes.c_float),
            _ptr(col_max, ctypes.c_float),
            _ptr(force, ctypes.c_int32),
            int(num_threads),
        )
    return row_argmax, row_max, col_max, force[:cnt]


def noise_select(
    cands: np.ndarray,
    corners: np.ndarray,
    group_starts: np.ndarray,
    group_sizes: np.ndarray,
    valid: np.ndarray,
) -> np.ndarray:
    """Sequential noise-trial acceptance (reference noise_per_box /
    noise_per_box_group): first collision-free trial per group, corners
    updated IN PLACE so later groups test against moved footprints.
    ``cands [N, T, 4, 2]``, ``corners [N, 4, 2]`` float32 (mutated);
    returns ``selected [N]`` int64 (-1 = none accepted)."""
    lib = _load()
    cands = np.ascontiguousarray(cands, np.float32)
    if corners.dtype != np.float32 or not corners.flags.c_contiguous:
        raise ValueError("corners must be contiguous float32 (mutated)")
    n, t = cands.shape[0], cands.shape[1]
    gs = np.ascontiguousarray(group_starts, np.int64)
    gz = np.ascontiguousarray(group_sizes, np.int64)
    v = np.ascontiguousarray(valid, np.uint8)
    sel = np.empty((n,), np.int64)
    if n:
        lib.noise_select(
            _ptr(cands, ctypes.c_float), n, t,
            _ptr(corners, ctypes.c_float),
            _ptr(gs, ctypes.c_int64), _ptr(gz, ctypes.c_int64), len(gs),
            _ptr(v, ctypes.c_uint8), _ptr(sel, ctypes.c_int64),
        )
    return sel


def anchors_area(
    coors: np.ndarray, ny: int, nx: int, indices: np.ndarray
) -> np.ndarray:
    """Voxel counts → summed-area table → per-anchor area, fused
    (numpy twin: ``box_np.sparse_sum_for_anchors_mask`` + two cumsums +
    ``fused_get_anchors_area``). ``coors`` is the valid ``[V, 3]`` int32
    (z, y, x) slice; ``indices`` the static ``[4, N]`` corner table."""
    lib = _load()
    coors = np.ascontiguousarray(coors, np.int32)
    indices = np.ascontiguousarray(indices, np.int64)
    n = indices.shape[1]
    out = np.empty((n,), np.float32)
    sat = np.empty((int(ny) * int(nx),), np.float32)
    lib.anchors_area_sat(
        _ptr(coors, ctypes.c_int32), len(coors),
        coors.shape[1] if coors.ndim == 2 else 3,
        int(ny), int(nx),
        _ptr(indices, ctypes.c_int64), n,
        _ptr(sat, ctypes.c_float), _ptr(out, ctypes.c_float),
    )
    return out


def nms(boxes: np.ndarray, iou_threshold: float = 0.5) -> np.ndarray:
    """Greedy standup NMS on score-sorted [K, 4] boxes → bool keep."""
    lib = _load()
    boxes = _f32(boxes)
    keep = np.zeros(len(boxes), np.uint8)
    if len(boxes):
        lib.nms_cpu(
            _ptr(boxes, ctypes.c_float), len(boxes), iou_threshold,
            _ptr(keep, ctypes.c_uint8),
        )
    return keep.astype(bool)


def rotate_nms(rbboxes: np.ndarray, iou_threshold: float = 0.5) -> np.ndarray:
    """Greedy exact rotated NMS on score-sorted [K, 5] boxes → keep."""
    lib = _load()
    rbboxes = _f32(rbboxes)
    keep = np.zeros(len(rbboxes), np.uint8)
    if len(rbboxes):
        lib.rotate_nms_cpu(
            _ptr(rbboxes, ctypes.c_float), len(rbboxes), iou_threshold,
            _ptr(keep, ctypes.c_uint8),
        )
    return keep.astype(bool)


def points_in_polygon3d(
    points: np.ndarray, surfaces: np.ndarray
) -> np.ndarray:
    """[P, 3] x [N, 6, 4, 3] → [P, N] bool."""
    lib = _load()
    points = _f32(points[:, :3])
    surfaces = _f32(surfaces)
    p, n = len(points), len(surfaces)
    out = np.zeros((p, n), np.uint8)
    if p and n:
        lib.points_in_polygon3d(
            _ptr(points, ctypes.c_float), p,
            _ptr(surfaces, ctypes.c_float), n,
            _ptr(out, ctypes.c_uint8),
        )
    return out.astype(bool)


def kd_build(points: np.ndarray):
    """Balanced kd-tree over ``[N, 3]`` points (N a power of two).

    Returns ``(order [N] int32 — leaf-ordered original indices,
    splits: list of [N >> l] int32 per level)``."""
    lib = _load()
    points = _f32(points[:, :3])
    n = len(points)
    depth = int(np.log2(n))
    assert (1 << depth) == n, "kd_build needs power-of-two N"
    order = np.zeros(n, np.int32)
    total = sum(n >> l for l in range(depth))
    splits_flat = np.zeros(total, np.int32)
    lib.kd_build(
        _ptr(points, ctypes.c_float), n,
        _ptr(order, ctypes.c_int32), _ptr(splits_flat, ctypes.c_int32),
    )
    splits, off = [], 0
    for l in range(depth):
        splits.append(splits_flat[off : off + (n >> l)])
        off += n >> l
    return order, splits


def kitti_eval_fused_statistics(
    overlaps: np.ndarray,  # [dt, gt] float64
    gt_datas: np.ndarray,  # [gt, 5]
    dt_datas: np.ndarray,  # [dt, 6]
    ignored_gt: np.ndarray,
    ignored_det: np.ndarray,
    dc_bboxes: np.ndarray,  # [ndc, 4]
    metric: int,
    min_overlap: float,
    thresholds: np.ndarray,  # [T]
    compute_aos: bool,
    pr: np.ndarray,  # [T, 4] float64 — accumulated IN PLACE
):
    """One frame's TP/FP/FN/similarity over T thresholds (native)."""
    lib = _load()

    def f64(a):
        return np.ascontiguousarray(a, dtype=np.float64)

    def i32a(a):
        return np.ascontiguousarray(a, dtype=np.int32)

    overlaps = f64(overlaps)
    gt_datas = f64(gt_datas)
    dt_datas = f64(dt_datas)
    ig = i32a(ignored_gt)
    idt = i32a(ignored_det)
    dc = f64(dc_bboxes).reshape(-1, 4)
    th = f64(thresholds)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    lib.kitti_eval_fused_statistics(
        _ptr(overlaps, ctypes.c_double),
        len(dt_datas), len(gt_datas),
        _ptr(gt_datas, ctypes.c_double),
        _ptr(dt_datas, ctypes.c_double),
        _ptr(ig, ctypes.c_int32), _ptr(idt, ctypes.c_int32),
        _ptr(dc, ctypes.c_double), len(dc),
        metric, min_overlap,
        _ptr(th, ctypes.c_double), len(th),
        1 if compute_aos else 0,
        _ptr(pr, ctypes.c_double),
    )


def kitti_eval_collect_thresholds(
    overlaps: np.ndarray,  # [dt, gt] float64
    dt_scores: np.ndarray,  # [dt]
    ignored_gt: np.ndarray,
    ignored_det: np.ndarray,
    min_overlap: float,
) -> np.ndarray:
    """Matched tp scores of the thresh=0 matching pass (native twin of
    ``compute_statistics(compute_fp=False)``'s thresholds list)."""
    lib = _load()
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    scores = np.ascontiguousarray(dt_scores, np.float64)
    ig = np.ascontiguousarray(ignored_gt, np.int32)
    idt = np.ascontiguousarray(ignored_det, np.int32)
    num_dt, num_gt = len(scores), len(ig)
    out = np.empty(max(num_gt, 1), np.float64)
    n = lib.kitti_eval_collect_thresholds(
        _ptr(overlaps, ctypes.c_double), num_dt, num_gt,
        _ptr(scores, ctypes.c_double),
        _ptr(ig, ctypes.c_int32), _ptr(idt, ctypes.c_int32),
        min_overlap, _ptr(out, ctypes.c_double),
    )
    return out[:n]


def _eval_flatten(per_frame, width: int, dtype):
    """Concat per-frame ``[n_i, width]`` arrays → (flat, counts[int64])."""
    counts = np.array(
        [len(np.asarray(a).reshape(-1, width)) for a in per_frame],
        np.int64,
    )
    if counts.sum() == 0:
        return np.zeros((0, width), dtype), counts
    flat = np.concatenate(
        [np.ascontiguousarray(np.asarray(a).reshape(-1, width), dtype)
         for a in per_frame],
        axis=0,
    )
    return np.ascontiguousarray(flat, dtype), counts


def kitti_eval_fused_statistics_batch(
    overlaps,  # list of [dt_i, gt_i] float64
    gt_datas_list,  # list of [gt_i, 5]
    dt_datas_list,  # list of [dt_i, 6]
    ignored_gts,
    ignored_dets,
    dontcares,  # list of [ndc_i, 4]
    metric: int,
    min_overlap: float,
    thresholds: np.ndarray,  # [T]
    compute_aos: bool,
    pr: np.ndarray,  # [T, 4] float64 — accumulated IN PLACE
    num_threads: int = 0,
):
    """All frames' TP/FP/FN/similarity over T thresholds in ONE native
    call (threaded over frame ranges with exact per-thread partials) —
    per-frame ctypes dispatch was ~30% of official-eval wall time at
    val-split scale."""
    lib = _load()
    n_frames = len(overlaps)
    dt_datas_flat, dt_counts = _eval_flatten(dt_datas_list, 6, np.float64)
    gt_datas_flat, gt_counts = _eval_flatten(gt_datas_list, 5, np.float64)
    dc_flat, dc_counts = _eval_flatten(dontcares, 4, np.float64)
    ov_flat = (
        np.concatenate(
            [np.asarray(o, np.float64).ravel() for o in overlaps]
        )
        if n_frames and sum(o.size for o in overlaps)
        else np.zeros(0, np.float64)
    )
    ov_flat = np.ascontiguousarray(ov_flat, np.float64)
    ig_flat, _ = _eval_flatten(ignored_gts, 1, np.int32)
    idt_flat, _ = _eval_flatten(ignored_dets, 1, np.int32)
    th = np.ascontiguousarray(thresholds, np.float64)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    lib.kitti_eval_fused_statistics_batch(
        _ptr(ov_flat, ctypes.c_double),
        _ptr(dt_counts, ctypes.c_int64), _ptr(gt_counts, ctypes.c_int64),
        n_frames,
        _ptr(gt_datas_flat, ctypes.c_double),
        _ptr(dt_datas_flat, ctypes.c_double),
        _ptr(ig_flat, ctypes.c_int32), _ptr(idt_flat, ctypes.c_int32),
        _ptr(dc_flat, ctypes.c_double), _ptr(dc_counts, ctypes.c_int64),
        metric, min_overlap,
        _ptr(th, ctypes.c_double), len(th),
        1 if compute_aos else 0, num_threads,
        _ptr(pr, ctypes.c_double),
    )


def kitti_eval_collect_thresholds_batch(
    overlaps,  # list of [dt_i, gt_i] float64
    dt_scores_list,  # list of [dt_i]
    ignored_gts,
    ignored_dets,
    min_overlap: float,
) -> np.ndarray:
    """All frames' matched tp scores (thresh=0 pass) in ONE native call."""
    lib = _load()
    n_frames = len(overlaps)
    sc_flat, dt_counts = _eval_flatten(dt_scores_list, 1, np.float64)
    ig_flat, gt_counts = _eval_flatten(ignored_gts, 1, np.int32)
    idt_flat, _ = _eval_flatten(ignored_dets, 1, np.int32)
    ov_flat = (
        np.concatenate(
            [np.asarray(o, np.float64).ravel() for o in overlaps]
        )
        if n_frames and sum(o.size for o in overlaps)
        else np.zeros(0, np.float64)
    )
    ov_flat = np.ascontiguousarray(ov_flat, np.float64)
    out = np.empty(max(int(gt_counts.sum()), 1), np.float64)
    n = lib.kitti_eval_collect_thresholds_batch(
        _ptr(ov_flat, ctypes.c_double),
        _ptr(dt_counts, ctypes.c_int64), _ptr(gt_counts, ctypes.c_int64),
        n_frames,
        _ptr(sc_flat, ctypes.c_double),
        _ptr(ig_flat, ctypes.c_int32), _ptr(idt_flat, ctypes.c_int32),
        min_overlap, _ptr(out, ctypes.c_double),
    )
    return out[:n]


def box_collision_test(
    boxes: np.ndarray, qboxes: np.ndarray
) -> np.ndarray:
    """Corner boxes [N, 4, 2] x [K, 4, 2] → [N, K] bool."""
    lib = _load()
    boxes = _f32(boxes)
    qboxes = _f32(qboxes)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), np.uint8)
    if n and k:
        lib.box_collision_test(
            _ptr(boxes, ctypes.c_float), n,
            _ptr(qboxes, ctypes.c_float), k,
            _ptr(out, ctypes.c_uint8),
        )
    return out.astype(bool)
