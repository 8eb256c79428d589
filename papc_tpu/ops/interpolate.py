"""Inverse-distance feature interpolation (PointNet++ feature propagation).

Reference parity: ``pointnet2_basic_layers.py:284-335`` (3-NN inverse
distance weighting). The reference sorts the FULL [B,N,S] distance matrix;
here a top-k picks the 3 nearest directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from papc_tpu.ops.geometry import index_points
from papc_tpu.ops.grouping import knn


def three_nn_interpolate(
    xyz1: jax.Array,
    xyz2: jax.Array,
    points2: jax.Array,
    *,
    eps: float = 1e-8,
    k: int = 3,
) -> jax.Array:
    """Interpolate features from a sparse set onto a dense set.

    Args:
      xyz1: ``[B, N, 3]`` dense target positions.
      xyz2: ``[B, S, 3]`` sparse source positions.
      points2: ``[B, S, D]`` sparse source features.

    Returns:
      ``[B, N, D]`` interpolated features (inverse-distance weighted k-NN).
    """
    dists, idx = knn(k, xyz2, xyz1)  # [B, N, k]
    dist_recip = 1.0 / (dists + eps)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm  # [B, N, k]
    neighbors = index_points(points2, idx)  # [B, N, k, D]
    return jnp.sum(neighbors * weight[..., None], axis=2)
