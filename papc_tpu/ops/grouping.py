"""Neighborhood grouping: ball query, kNN, sample-and-group.

Reference parity: ``pointnet2_basic_layers.py:98-176``. The reference builds
the full ``[B, S, N]`` index matrix, masks it through TWO numpy round-trips
and runs a full sort. Here the "first ``nsample`` indices inside the radius"
semantics are realized with a masked ``lax.top_k`` over negated indices — no
sort, no host sync, identical results.

Backend selection (fetch-forced on v5e, 2026-08-17,
``papc_tpu.utils.timing`` K-chain slope — the round-2 "XLA wins below
N=4096" crossover was an artifact of the broken ``block_until_ready``
timer): the streaming Pallas kernel wins at every measured size, e.g.
18× at the SSG SA1 production shape (B=32, N=1024, S=512, K=32:
3.57 ms → 0.195 ms) and >10× at N=65536. ``backend=None`` selects the
Pallas kernel whenever the default backend is TPU; the XLA
matrix+top_k path remains as the CPU / oracle path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from papc_tpu.ops.geometry import index_points, square_distance
from papc_tpu.ops.sampling import farthest_point_sample


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    backend: str | None = None,
) -> jax.Array:
    """For each query, the first ``nsample`` point indices within ``radius``.

    Args:
      radius: ball radius.
      nsample: neighbors per ball (static).
      xyz: ``[B, N, 3]`` all points.
      new_xyz: ``[B, S, 3]`` query centers.
      backend: ``"xla"`` | ``"pallas"`` | None (auto: the VMEM-resident
        streaming Pallas kernel — ``papc_tpu.ops.pallas.ball_query`` —
        at every size on TPU; see the module docstring measurements).

    Returns:
      ``[B, S, nsample]`` int32 indices. Slots beyond the in-radius count are
      filled with the first in-radius index (reference semantics,
      ``pointnet2_basic_layers.py:119-126``).
    """
    N = xyz.shape[1]
    if backend is None:
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = backend == "pallas"
    if use_pallas:
        from papc_tpu.ops.pallas.ball_query import query_ball_point_pallas

        return query_ball_point_pallas(radius, nsample, xyz, new_xyz)
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    idx = jnp.arange(N, dtype=jnp.int32)
    # Out-of-radius points get sentinel N; reference masks with `> radius**2`.
    cand = jnp.where(sqrdists > radius**2, N, idx[None, None, :])
    # nsample smallest indices == nsample largest of the negation.
    neg_top, _ = lax.top_k(-cand, nsample)
    group_idx = -neg_top  # ascending indices, sentinel N at the tail
    group_first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, group_first, group_idx)
    # Degenerate all-empty ball (cannot happen when new_xyz ⊆ xyz): clamp.
    return jnp.minimum(group_idx, N - 1)


def query_ball_point_tiled(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    query_chunk: int = 256,
) -> jax.Array:
    """Memory-bounded ball query for LARGE clouds.

    Identical semantics to :func:`query_ball_point`, but the
    ``[B, S, N]`` distance matrix is streamed in query chunks via
    ``lax.map`` so peak memory is ``O(B * query_chunk * N)`` — the
    blockwise treatment of the reference's O(S*N) memory pain point
    (SURVEY §5.7; reference ``pointnet2_basic_layers.py:110-117``).

    When the Pallas kernel would be auto-selected (any size on TPU) it
    is used directly over the full query set: it streams point tiles
    through VMEM and never materializes the distance matrix, so the
    outer chunking would only add ``lax.map`` overhead.
    """
    if jax.default_backend() == "tpu":
        return query_ball_point(radius, nsample, xyz, new_xyz)
    B, S, C = new_xyz.shape
    pad = (-S) % query_chunk
    q = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (S + pad) // query_chunk
    q = q.reshape(B, n_chunks, query_chunk, C).transpose(1, 0, 2, 3)

    def chunk_fn(qc):  # [B, query_chunk, 3]
        return query_ball_point(radius, nsample, xyz, qc)

    out = lax.map(chunk_fn, q)  # [n_chunks, B, query_chunk, nsample]
    out = out.transpose(1, 0, 2, 3).reshape(B, S + pad, nsample)
    return out[:, :S]


def knn(k: int, xyz: jax.Array, new_xyz: jax.Array):
    """k nearest neighbors of each query.

    Returns ``(dists, idx)``: ``[B, S, k]`` squared distances (ascending) and
    int32 indices. Used by feature propagation (3-NN interpolation,
    reference ``pointnet2_basic_layers.py:305-309``).

    No Pallas variant by design: in every FP call the CANDIDATE set is
    the coarse level (128–512 points), so the ``[B, S, N_cand]`` matrix
    stays small even when the query side is the full cloud — the HBM
    blowup that justifies the ball-query kernel (N candidates) never
    occurs here.
    """
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    neg_d, idx = lax.top_k(-sqrdists, k)
    return -neg_d, idx.astype(jnp.int32)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: jax.Array | None,
    *,
    key: jax.Array | None = None,
    return_fps: bool = False,
):
    """FPS + ball query + gather + center-normalize.

    Args:
      xyz: ``[B, N, 3]`` positions; points: ``[B, N, D]`` features or None.

    Returns:
      ``new_xyz [B, npoint, 3]``, ``new_points [B, npoint, nsample, 3+D]``
      (relative xyz concatenated before features — reference
      ``pointnet2_basic_layers.py:129-158``).
    """
    B, N, C = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, key=key)
    new_xyz = index_points(xyz, fps_idx)  # [B, npoint, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    if points is not None:
        # ONE row gather of the pre-concatenated (xyz, features): two
        # separate gathers each lane-pad their output (3 → 128 for the
        # xyz one) and each pay their own scatter-add backward; the
        # combined form halves the gather traffic both ways. The center
        # subtraction lands on the xyz lanes post-gather (XLA fuses it
        # into the gather consumer) — values identical.
        combined = jnp.concatenate([xyz, points], axis=-1)
        grouped = index_points(combined, idx)  # [B, S, K, 3+D]
        grouped_xyz = grouped[..., :3]
        new_points = grouped.at[..., :3].add(
            -new_xyz[:, :, None, :]
        )
    else:
        grouped_xyz = index_points(xyz, idx)  # [B, S, K, 3]
        new_points = grouped_xyz - new_xyz[:, :, None, :]
    if return_fps:
        return new_xyz, new_points, grouped_xyz, fps_idx
    return new_xyz, new_points


def sample_and_group_t(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    points: jax.Array | None,
    *,
    key: jax.Array | None = None,
    interpret: bool = False,
):
    """Channel-sublane :func:`sample_and_group`: grouped output
    ``[B, 3+D, npoint·nsample]`` instead of ``[B, npoint, nsample, 3+D]``.

    Same FPS/ball-query/center semantics and identical values (up to the
    gather kernel's ~2^-25 split-accumulation — see
    ``ops.pallas.gather_t``); the layout difference is the point: the
    row layout lane-pads C → 128 (42× HBM for SA1's C=3 grouped xyz and
    a 42×-padded MXU scatter in its backward — measured 4.88 vs 1.42
    ms/iter fwd+bwd at the SA1 shape, ``experiments/ab_gather_t.log``),
    while this layout pads C → 8 sublanes and feeds
    ``fused_mlp.fused_mlp_max_t`` / ``scatter_cols_add_pallas``
    directly.
    """
    B, N, _ = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, key=key)
    new_xyz = index_points(xyz, fps_idx)  # [B, npoint, 3] (tiny)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    from papc_tpu.ops.pallas.gather_t import gather_cols

    if points is not None:
        combined = jnp.concatenate([xyz, points], axis=-1)
    else:
        combined = xyz
    # the [B, N, C] → [B, C, N] transpose is small (the SOURCE, not the
    # grouped result: ≤ ~17 MB at SA2 scale) and XLA-fused
    combined_t = combined.transpose(0, 2, 1)
    grouped_t = gather_cols(combined_t, idx, interpret=interpret)
    # center the xyz channels: lane-repeat each center K times so the
    # subtraction stays in the [B, C, M] layout (a [B,3,S,K]-shaped
    # broadcast would lane-pad K → 128)
    centers = jnp.repeat(
        new_xyz.transpose(0, 2, 1), nsample, axis=2
    )  # [B, 3, npoint*nsample]
    if points is not None:
        grouped_t = grouped_t.at[:, :3, :].add(-centers)
    else:
        grouped_t = grouped_t - centers
    return new_xyz, grouped_t


def sample_and_group_all(xyz: jax.Array, points: jax.Array | None):
    """Single group containing every point (global abstraction stage).

    Reference ``pointnet2_basic_layers.py:160-176``: new_xyz is the origin,
    grouped xyz is NOT normalized.
    """
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]  # [B, 1, N, C]
    if points is not None:
        new_points = jnp.concatenate(
            [grouped_xyz, points[:, None, :, :]], axis=-1
        )
    else:
        new_points = grouped_xyz
    return new_xyz, new_points
