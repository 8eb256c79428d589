"""Farthest point sampling (FPS) — fully on-device.

The reference implements FPS as a Python loop that syncs the whole cloud to
numpy on EVERY iteration (``pointnet2_basic_layers.py:65-95`` — npoint
serialized host round-trips). Here the loop is a ``lax.fori_loop`` compiled
into the XLA program: the running min-distance vector stays on chip, each
iteration is one gather + one fused elementwise pass + one argmax over
``[B, N]``.

Backend selection (fetch-forced on v5e, 2026-08-17 — the earlier
"XLA wins below N=4096" crossover was an artifact of the broken
``block_until_ready`` timer): the batch-vectorized Pallas kernel
(``papc_tpu.ops.pallas.fps``) keeps coordinates + the min-distance
matrix VMEM-resident for the whole loop and wins at EVERY measured
size — 2.2× at B=32/N=512, 7.5× at B=32/N=1024 (5.21 ms → 0.69 ms,
the SSG production shape), 12.1× at N=16384. ``backend=None``
auto-selects Pallas whenever the default backend is TPU; the XLA loop
remains as the CPU / oracle path.

On TPU the two backends can diverge at ulp-level argmax ties (~1 pick
in 16k: XLA's fused-multiply-add rounding can separate two distances
that are bit-equal under the kernel's — and host numpy's — rounding).
CPU/interpret semantics match bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    *,
    key: jax.Array | None = None,
    start_idx: jax.Array | int | None = None,
    backend: str | None = None,
) -> jax.Array:
    """Iteratively pick the point farthest from the already-picked set.

    Args:
      xyz: ``[B, N, 3]`` point positions.
      npoint: number of samples (static).
      key: optional PRNG key for the random initial point (the reference uses
        ``paddle.randint`` per batch item, ``pointnet2_basic_layers.py:76``).
      start_idx: optional fixed initial index (scalar or ``[B]``); wins over
        ``key``. Defaults to 0 when neither is given (deterministic).
      backend: ``"xla"`` | ``"pallas"`` | None (auto: Pallas on TPU at
        every size — see module docstring for measurements).

    Returns:
      ``[B, npoint]`` int32 indices into ``N``.
    """
    B, N, _ = xyz.shape
    if backend is None:
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = backend == "pallas"
    if use_pallas:
        from papc_tpu.ops.pallas.fps import farthest_point_sample_pallas

        # same start-index semantics as the XLA path below: explicit
        # start_idx wins, then a random per-item start from `key`,
        # else deterministic 0
        if start_idx is None and key is not None:
            start_idx = jax.random.randint(
                key, (B,), 0, N, dtype=jnp.int32
            )
        return farthest_point_sample_pallas(
            xyz, npoint, start_idx=0 if start_idx is None else start_idx
        )
    if start_idx is not None:
        farthest0 = jnp.broadcast_to(
            jnp.asarray(start_idx, dtype=jnp.int32), (B,)
        )
    elif key is not None:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)

    xyz = xyz.astype(jnp.float32)

    def body(i, state):
        distance, farthest, centroids = state
        centroids = lax.dynamic_update_index_in_dim(
            centroids, farthest, i, axis=1
        )
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1
        )  # [B, 1, 3]
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return distance, farthest, centroids

    distance0 = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    _, _, centroids = lax.fori_loop(
        0, npoint, body, (distance0, farthest0, centroids0)
    )
    return centroids
