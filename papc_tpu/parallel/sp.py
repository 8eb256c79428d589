"""Point-axis sharding (the sequence/context-parallel analog).

The reference caps clouds at ``max_point`` and truncates (SURVEY §5.7).
Here very large clouds can instead shard their N-points axis across
devices: each device holds a slab of points, queries are replicated, and
the pairwise-distance workloads (ball query, kNN, FPS) run as
``shard_map`` programs whose combine steps are XLA collectives over ICI
— the ring-attention-style decomposition for distance matrices.

Exactness: results match the single-device kernels bit-for-bit —
ball query still returns the first ``nsample`` in-radius indices in
GLOBAL index order; FPS runs the same min-distance/argmax recursion with
a cross-device argmax each round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from papc_tpu.ops.geometry import square_distance


def sharded_ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,  # [B, N, 3] — N sharded over `axis`
    new_xyz: jax.Array,  # [B, S, 3] — replicated
    mesh: Mesh,
    axis: str = "data",
    batch_axis: str | None = None,
) -> jax.Array:
    """Ball query with the point axis sharded.

    Each device finds its slab's first-``nsample`` in-radius candidates
    (as global indices), then an all_gather + top-k merges slabs. Output
    ``[B, S, nsample]`` replicated over ``axis``, identical to
    :func:`papc_tpu.ops.query_ball_point` on the gathered cloud.

    ``batch_axis`` optionally shards the batch dim over a second mesh
    axis (dp×sp composition: batch over ``data``, points over
    ``model``); collectives stay confined to ``axis``.
    """
    B, N, _ = xyz.shape
    n_dev = mesh.shape[axis]
    assert N % n_dev == 0, "N must divide over the mesh axis"
    n_local = N // n_dev

    def local_candidates(xyz_local, queries):
        # xyz_local: [B, n_local, 3]; queries: [B, S, 3]
        shard = lax.axis_index(axis)
        offset = shard * n_local
        d = square_distance(queries, xyz_local)  # [B, S, n_local]
        gids = offset + jnp.arange(n_local, dtype=jnp.int32)
        cand = jnp.where(d > radius**2, N, gids[None, None, :])
        k = min(nsample, n_local)
        neg_top, _ = lax.top_k(-cand, k)  # k smallest global ids
        local_best = -neg_top  # [B, S, k]
        # merge across shards: [n_dev, B, S, k] → smallest nsample
        all_best = lax.all_gather(local_best, axis)  # [n_dev, Bl, S, k]
        merged = jnp.moveaxis(all_best, 0, 2).reshape(
            queries.shape[0], queries.shape[1], n_dev * k
        )
        neg_top, _ = lax.top_k(-merged, nsample)
        group_idx = -neg_top
        first = group_idx[..., :1]
        group_idx = jnp.where(group_idx == N, first, group_idx)
        return jnp.minimum(group_idx, N - 1)

    fn = shard_map(
        local_candidates,
        mesh=mesh,
        in_specs=(
            P(batch_axis, axis, None),
            P(batch_axis, None, None),
        ),
        out_specs=P(batch_axis, None, None),
        check_vma=False,
    )
    return fn(xyz, new_xyz)


def sharded_fps(
    xyz: jax.Array,  # [B, N, 3] — N sharded over `axis`
    npoint: int,
    mesh: Mesh,
    axis: str = "data",
    start_idx: int = 0,
    batch_axis: str | None = None,
) -> jax.Array:
    """Farthest point sampling with the point axis sharded.

    Each round every device updates its slab's min-distance vector and
    proposes (local max, global idx); one ``pmax``-style reduction picks
    the global winner; the winner's coordinates are broadcast with a
    masked ``psum``. Matches the single-device recursion exactly.
    ``batch_axis`` optionally shards the batch dim over a second mesh
    axis (dp×sp composition); collectives stay confined to ``axis``.
    """
    B, N, _ = xyz.shape
    n_dev = mesh.shape[axis]
    assert N % n_dev == 0
    n_local = N // n_dev

    def run(xyz_local):
        # xyz_local: [Bl, n_local, 3] (Bl = B / dp when batch_axis set)
        Bl = xyz_local.shape[0]
        shard = lax.axis_index(axis)
        offset = (shard * n_local).astype(jnp.int32)
        gids = offset + jnp.arange(n_local, dtype=jnp.int32)  # [n_local]

        def centroid_coords(farthest):
            # gather the chosen point's xyz across shards: mask + psum
            local = farthest[:, None] - offset  # [B, 1]
            in_shard = (local >= 0) & (local < n_local)
            safe = jnp.clip(local[:, 0], 0, n_local - 1)
            c = jnp.take_along_axis(
                xyz_local, safe[:, None, None].repeat(3, -1), axis=1
            )[:, 0, :]
            c = jnp.where(in_shard, c, 0.0)
            return lax.psum(c, axis)  # [B, 3]

        def body(i, state):
            distance, farthest, out = state
            out = lax.dynamic_update_index_in_dim(
                out, farthest, i, axis=1
            )
            c = centroid_coords(farthest)  # [B, 3]
            d = jnp.sum((xyz_local - c[:, None, :]) ** 2, axis=-1)
            distance = jnp.minimum(distance, d)  # [B, n_local]
            # global argmax: maximize (distance, -gid) lexicographically
            local_max = jnp.max(distance, axis=1)
            local_arg = jnp.argmax(distance, axis=1)
            local_gid = gids[local_arg]  # [B]
            all_max = lax.all_gather(local_max, axis)  # [n_dev, B]
            all_gid = lax.all_gather(local_gid, axis)
            win = jnp.argmax(all_max, axis=0)  # [B] — first max wins
            farthest = jnp.take_along_axis(
                all_gid, win[None, :], axis=0
            )[0].astype(jnp.int32)
            return distance, farthest, out

        distance0 = jnp.full((Bl, n_local), jnp.inf, jnp.float32)
        farthest0 = jnp.full((Bl,), start_idx, jnp.int32)
        out0 = jnp.zeros((Bl, npoint), jnp.int32)
        _, _, out = lax.fori_loop(
            0, npoint, body, (distance0, farthest0, out0)
        )
        return out

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(batch_axis, axis, None),),
        out_specs=P(batch_axis, None),
        check_vma=False,
    )
    return fn(xyz)
