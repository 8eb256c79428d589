"""Device-side (jnp, jittable) voxelization and BEV scatter.

TPU-native replacements for the reference's host-only numba voxelizer
(``point_cloud_ops.py:7-166``) and its numpy-round-trip scatter
(``models/bones/pillars.py:121-142`` via ``libs/functional.py:21-38``).
Everything is static-shape: ``max_voxels`` / ``max_points`` bound the
output, validity is carried in masks, and duplicate-cell resolution uses
sort + segment arithmetic instead of a dynamic hash table.

Semantics vs the reference: points keep input order within a voxel and
are first-come truncated at ``max_points`` (exact match); voxels are
emitted in cell-id order rather than first-occurrence order (irrelevant
downstream — the scatter addresses voxels by coordinates; only under
``max_voxels`` overflow does the kept SET differ).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelizedPoints(NamedTuple):
    voxels: jax.Array  # [V, P, D] point features, zero padded
    coords: jax.Array  # [V, 3] int32 (z, y, x); -1 rows are invalid
    num_points: jax.Array  # [V] int32
    num_voxels: jax.Array  # [] int32
    point_mask: jax.Array  # [V, P] bool — valid point slots


def voxelize(
    points: jax.Array,
    points_mask: jax.Array | None,
    voxel_size,
    point_cloud_range,
    grid_size,  # (nx, ny, nz) — static python ints
    max_points: int,
    max_voxels: int,
) -> VoxelizedPoints:
    """Jittable single-cloud voxelizer. ``points``: [N, D] (xyz first).

    ``points_mask`` marks real points (padding rows False). vmap over a
    leading batch axis for batched use.
    """
    nx, ny, nz = (int(g) for g in grid_size)
    N, D = points.shape
    vsz = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(point_cloud_range[:3], points.dtype)
    grid = jnp.asarray([nx, ny, nz])

    cell = jnp.floor((points[:, :3] - lo) / vsz).astype(jnp.int32)
    ok = jnp.all((cell >= 0) & (cell < grid[None, :]), axis=1)
    if points_mask is not None:
        ok = ok & points_mask
    n_cells = nx * ny * nz
    linear = jnp.where(
        ok,
        cell[:, 2] * (ny * nx) + cell[:, 1] * nx + cell[:, 0],
        n_cells,  # sentinel: sorts after every real cell
    )

    order = jnp.argsort(linear, stable=True)
    lin_sorted = linear[order]
    valid_sorted = lin_sorted < n_cells

    new_seg = jnp.concatenate(
        [
            jnp.asarray([True]),
            lin_sorted[1:] != lin_sorted[:-1],
        ]
    ) & valid_sorted
    voxel_rank = jnp.cumsum(new_seg) - 1  # [N] — voxel index per point
    # within-voxel rank: position − segment start
    pos = jnp.arange(N)
    seg_start = jnp.where(new_seg, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    within = pos - seg_start

    keep = valid_sorted & (voxel_rank < max_voxels) & (within < max_points)
    vr = jnp.where(keep, voxel_rank, max_voxels)  # dump slot
    wr = jnp.where(keep, within, 0)

    voxels = jnp.zeros((max_voxels + 1, max_points, D), points.dtype)
    voxels = voxels.at[vr, wr].set(points[order])
    point_mask = jnp.zeros((max_voxels + 1, max_points), bool)
    point_mask = point_mask.at[vr, wr].set(keep)

    coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    cell_zyx = cell[order][:, ::-1]
    first = new_seg & keep
    coords = coords.at[jnp.where(first, vr, max_voxels)].set(cell_zyx)

    num_points = jnp.sum(point_mask[:max_voxels], axis=1).astype(jnp.int32)
    num_voxels = jnp.minimum(
        jnp.sum(new_seg).astype(jnp.int32), max_voxels
    )
    return VoxelizedPoints(
        voxels=voxels[:max_voxels],
        coords=coords[:max_voxels],
        num_points=num_points,
        num_voxels=num_voxels,
        point_mask=point_mask[:max_voxels],
    )


def scatter_to_bev(
    features: jax.Array,  # [V, C] per-voxel features
    coords: jax.Array,  # [V, 3] (z, y, x); invalid rows < 0
    ny: int,
    nx: int,
) -> jax.Array:
    """Scatter voxel columns onto a dense BEV canvas → ``[ny, nx, C]``.

    One ``.at[].set`` with a dump row replaces the reference's per-item
    numpy ``select_change`` round-trip (``pillars.py:121-142``).
    """
    V, C = features.shape
    valid = coords[:, 0] >= 0
    linear = jnp.where(valid, coords[:, 1] * nx + coords[:, 2], ny * nx)
    canvas = jnp.zeros((ny * nx + 1, C), features.dtype)
    # rows are unique by construction (one voxel per cell); dump-row
    # duplicates all write 0.0 so any pick is exact — the promise lets
    # XLA skip the duplicate-write serialization (2.9x, ab_scat5)
    canvas = canvas.at[linear].set(
        jnp.where(valid[:, None], features, 0.0),
        mode="drop",
        unique_indices=True,
    )
    return canvas[: ny * nx].reshape(ny, nx, C)


def scatter_to_bev_batched(
    features: jax.Array,  # [B, V, C] per-voxel features
    coords: jax.Array,  # [B, V, 3] (z, y, x); invalid rows < 0
    ny: int,
    nx: int,
) -> jax.Array:
    """Batched BEV scatter → ``[B, ny, nx, C]``.

    NOT ``vmap(scatter_to_bev)``: vmapping the indexed-set makes XLA
    emit a batched scatter whose transpose is a batched gather — the
    exact form that hits minute-scale TPU compiles and a ~5× slower
    kernel (see CLAUDE.md). Instead the batch is folded into the row
    index (``b·ny·nx + y·nx + x``) so both the forward scatter and its
    transpose gather are FLAT 1-D row operations on a ``[B·ny·nx+1, C]``
    canvas — the sanctioned ``arr.reshape(B*N, C)[rows]`` form.

    Voxel coords are unique per sample by construction, so the
    set-scatter has no duplicate rows except the shared dump row, whose
    cotangent is identically zero (it is sliced off before the reshape).
    """
    B, V, C = features.shape
    valid = coords[:, :, 0] >= 0
    cells = ny * nx
    base = jnp.arange(B, dtype=jnp.int32)[:, None] * cells
    rows = jnp.where(
        valid, base + coords[:, :, 1] * nx + coords[:, :, 2], B * cells
    ).reshape(B * V)
    canvas = jnp.zeros((B * cells + 1, C), features.dtype)
    # unique rows + all-0.0 dump writes (see scatter_to_bev) — exact,
    # and 2.9x faster than the unpromised scatter (ab_scat5)
    canvas = canvas.at[rows].set(
        jnp.where(valid[..., None], features, 0.0).reshape(B * V, C),
        mode="drop",
        unique_indices=True,
    )
    return canvas[: B * cells].reshape(B, ny, nx, C)


def scatter_to_bev_s2d(
    features: jax.Array,  # [B, V, C] per-voxel features
    coords: jax.Array,  # [B, V, 3] (z, y, x); invalid rows < 0
    ny: int,
    nx: int,
) -> jax.Array:
    """Batched BEV scatter directly into the space-to-depth canvas →
    ``[B, ny//2+1, nx//2+1, 4C]`` (ny, nx even).

    Identical to ``space_to_depth_bev(scatter_to_bev_batched(...))``
    (asserted in tests) but without ever materializing the classic
    canvas: cell (y, x) lands in patch ((y+1)//2, (x+1)//2) at the
    2x2-phase channel block ((y+1)%2, (x+1)%2), and the phase is folded
    into the flat row index alongside the batch — still ONE flat
    indexed-set (see :func:`scatter_to_bev_batched` for why not vmap).
    The downstream stride-2 3x3 conv then runs as a stride-1 2x2 VALID
    conv (``ops.s2d``), dodging the strided-backward pathology."""
    B, V, C = features.shape
    if ny % 2 or nx % 2:
        raise ValueError(f"ny, nx must be even, got {(ny, nx)}")
    py, px = ny // 2 + 1, nx // 2 + 1
    valid = coords[:, :, 0] >= 0
    yp = coords[:, :, 1] + 1
    xp = coords[:, :, 2] + 1
    phase = (yp % 2) * 2 + (xp % 2)
    cells = py * px * 4
    base = jnp.arange(B, dtype=jnp.int32)[:, None] * cells
    rows = jnp.where(
        valid,
        base + ((yp // 2) * px + xp // 2) * 4 + phase,
        B * cells,
    ).reshape(B * V)
    return _scatter_rows_canvas(
        features, valid, rows, B * cells, py, px, 4 * C
    )


# How the flat indexed-set canvas write lowers (A/B'd on the composed
# PointPillars step, experiments/ab_scat5*.log):
#   "set"  — plain ``.at[rows].set`` (XLA scatter)
#   "uniq" — same + ``mode="drop", unique_indices=True``: rows ARE
#            unique per sample by construction (one pillar per cell);
#            dump-row duplicates all write 0.0, so any pick is exact
#   "invg" — scatter only 24k i32 pillar ids (C× less scatter data),
#            then build the canvas as ONE flat row gather — turns the
#            hot write into the sanctioned flat-gather form and its
#            backward into a flat gather of the cotangent
# Measured (ab_scat5: isolated fwd+bwd set 4.10 / uniq 1.40 / invg
# 5.56 ms; ab_scat5c: composed PointPillars scanned step set 15.56 /
# uniq 13.42 ms bf16, 19.75 / 17.54 f32, loss bit-exact) — without
# the uniqueness promise XLA serializes the scatter against possible
# duplicate writes.
S2D_SCATTER_MODE = "uniq"


def _scatter_rows_canvas(features, valid, rows, n_cells, py, px, co):
    B, V, C = features.shape
    feats = jnp.where(valid[..., None], features, 0.0).reshape(
        B * V, C
    )
    if S2D_SCATTER_MODE == "invg":
        inv = jnp.full((n_cells + 1,), B * V, jnp.int32)
        inv = inv.at[rows].set(
            jnp.arange(B * V, dtype=jnp.int32),
            mode="drop",
            unique_indices=True,
        )
        flat = jnp.concatenate(
            [feats, jnp.zeros((1, C), features.dtype)], 0
        )
        return flat[inv[:n_cells]].reshape(B, py, px, co)
    canvas = jnp.zeros((n_cells + 1, C), features.dtype)
    if S2D_SCATTER_MODE == "uniq":
        canvas = canvas.at[rows].set(
            feats, mode="drop", unique_indices=True
        )
    else:
        canvas = canvas.at[rows].set(feats)
    return canvas[:n_cells].reshape(B, py, px, co)
