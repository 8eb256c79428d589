"""Pallas TPU kernel: farthest point sampling.

The jnp version (``papc_tpu.ops.sampling``) compiles to an XLA while-loop
whose body is a handful of tiny [B, N] ops — correct, but each of the
npoint iterations pays op-dispatch overhead inside the loop. This kernel
runs the WHOLE selection loop inside one Pallas program per batch item:
coordinates and the running min-distance vector live in VMEM for the
entire loop, each iteration is one fused VPU pass + argmax.

Reference analog: ``pointnet2_basic_layers.py:65-95`` — which does the
same loop with FOUR host↔device syncs per iteration.

Measured on TPU v5e (2026-08-16, median-of-repeats through the relay):

| B×N (npoint)      | XLA loop | this kernel | speedup |
|-------------------|----------|-------------|---------|
| 32×1024 (512)     | 29 µs    | 35 µs       | 0.8×    |
| 8×4096 (1024)     | 13.2 ms  | 7.2 ms      | 1.8×    |
| 4×16384 (2048)    | 42.0 ms  | 10.7 ms     | 3.9×    |
| 1×65536 (4096)    | 89.3 ms  | 13.7 ms     | 6.5×    |

At reference sizes the fused XLA loop wins slightly; from N≈4096 up the
VMEM-resident loop pulls away (XLA re-reads the cloud from HBM each of
the npoint iterations). ``papc_tpu.ops.farthest_point_sample`` auto-
selects this kernel on TPU for N >= 4096.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, start_ref, out_ref, dist_ref, *, npoint: int):
    # xyz_ref: [1, 3, N] f32 (coordinate-major so each row is lane-tiled)
    # start_ref: [1, 1, 1] i32 SMEM — initial index
    # out_ref: [1, 1, npoint] i32; dist_ref: [1, N] f32 scratch
    N = xyz_ref.shape[2]
    dist_ref[:] = jnp.full((1, N), jnp.inf, jnp.float32)
    x = xyz_ref[0, 0, :]
    y = xyz_ref[0, 1, :]
    z = xyz_ref[0, 2, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, N), 1)[0]

    def body(i, farthest):
        out_ref[0, 0, i] = farthest
        # centroid coords via masked reduction (dynamic scalar loads from
        # VMEM at arbitrary lane offsets don't lower on TPU)
        sel = lane == farthest
        cx = jnp.sum(jnp.where(sel, x, 0.0))
        cy = jnp.sum(jnp.where(sel, y, 0.0))
        cz = jnp.sum(jnp.where(sel, z, 0.0))
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        nd = jnp.minimum(dist_ref[0, :], d)
        dist_ref[0, :] = nd
        return jnp.argmax(nd).astype(jnp.int32)

    lax.fori_loop(0, npoint, body, start_ref[0, 0, 0])


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    xyz: jax.Array,
    npoint: int,
    start_idx: jax.Array | int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Pallas FPS: ``xyz [B, N, 3]`` → int32 indices ``[B, npoint]``.

    Matches :func:`papc_tpu.ops.farthest_point_sample` exactly (same
    min-distance/argmax recursion, deterministic given ``start_idx``).
    """
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    start = jnp.broadcast_to(
        jnp.asarray(start_idx, jnp.int32).reshape(-1, 1, 1), (B, 1, 1)
    )

    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t, start)
    return out[:, 0, :]
