"""Pallas TPU kernel: batch-vectorized farthest point sampling.

The jnp version (``papc_tpu.ops.sampling``) compiles to an XLA
while-loop whose body is a handful of tiny ``[B, N]`` HBM-bound ops —
correct, but each of the npoint iterations pays op dispatch + HBM
round-trips, and the loop is inherently sequential. Fetch-forced
measurement (round 3) put the SSG train step at ~32 ms against a
0.89 ms FLOP floor, almost all of it this loop.

This kernel runs the WHOLE selection loop inside one Pallas program
per batch block: coordinates and the running min-distance matrix stay
VMEM-resident for the entire loop, and — the key change from the
round-2 kernel — each loop iteration advances ALL ``BB`` batch rows at
once with ``[BB, N]`` VPU ops, instead of one row per sequential grid
step. At B=32/N=1024 that is 32× fewer sequential iterations for the
same lane occupancy.

Reference analog: ``pointnet2_basic_layers.py:65-95`` — the same loop
with FOUR host↔device syncs per iteration.

Fetch-forced on v5e (2026-08-17, ``papc_tpu.utils.timing``
K-chain slope, forward FPS alone, chained through donated input):

| B×N (npoint)      | XLA loop | this kernel | speedup |
|-------------------|----------|-------------|---------|
| 32×512 (128)      |  0.71 ms | 0.33 ms     | 2.2×    |
| 32×1024 (512)     |  5.21 ms | 0.69 ms     | 7.5×    |
| 8×4096 (1024)     | 10.10 ms | 1.34 ms     | 7.5×    |
| 4×16384 (2048)    | 37.70 ms | 3.10 ms     | 12.1×   |
| 1×65536 (4096)    | 88.62 ms | 12.21 ms    | 7.3×    |

``papc_tpu.ops.farthest_point_sample`` auto-selects this kernel on TPU
at every size (the XLA loop remains as the CPU / oracle path).

On-chip caveat: picks can diverge from the XLA path at ulp-level
argmax ties (~1 in 16k picks — XLA's FMA rounding can separate two
distances that are bit-equal under this kernel's and host numpy's
rounding; where they differ, this kernel agrees with the numpy
oracle). Interpret mode matches the XLA path bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, start_ref, out_ref, dist_ref, *,
                npoint: int):
    # x/y/z_ref: [BB, N] f32 — one coordinate plane per ref so every op
    # in the loop is a plain lane-tiled 2D op (no mid-dim slicing)
    # start_ref: [BB, 1] i32 initial indices; out_ref: [BB, npoint] i32
    # dist_ref: [BB, N] f32 running min-distance scratch
    BB, N = x_ref.shape
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    ocol = lax.broadcasted_iota(jnp.int32, (BB, npoint), 1)
    dist_ref[:] = jnp.full((BB, N), jnp.inf, jnp.float32)

    def body(i, far):
        # far: [BB, 1] — the pick made at the end of the previous
        # iteration (start indices for i=0); record it in column i
        out_ref[:] = jnp.where(ocol == i, far, out_ref[:])
        # centroid coords via one-hot masked reductions (dynamic scalar
        # VMEM loads at arbitrary lane offsets don't lower on TPU);
        # exact: the mask selects exactly one lane per row
        sel = lane == far
        cx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        nd = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = nd
        # row-wise argmax with first-occurrence ties, as 2D keepdims ops
        # (matches jnp.argmax in the XLA path bit-for-bit)
        m = jnp.max(nd, axis=1, keepdims=True)
        return jnp.min(
            jnp.where(nd == m, lane, N), axis=1, keepdims=True
        ).astype(jnp.int32)

    lax.fori_loop(0, npoint, body, start_ref[:])


def _batch_block(B: int, N: int) -> int:
    """Rows per program: keep 3 coordinate planes (double-buffered) +
    the distance scratch within ~4 MB of VMEM, floor 1."""
    return min(B, max(1, (2**21) // (16 * N)))


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
    xyz = xyz.astype(jnp.float32)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    start = jnp.broadcast_to(
        jnp.asarray(start_idx, jnp.int32).reshape(-1, 1), (B, 1)
    )
    BB = _batch_block(B, N)
    grid = -(-B // BB)
    Bp = grid * BB
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        x, y, z = jnp.pad(x, pad), jnp.pad(y, pad), jnp.pad(z, pad)
        start = jnp.pad(start, pad)

    plane = pl.BlockSpec((BB, N), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=(grid,),
        in_specs=[
            plane,
            plane,
            plane,
            pl.BlockSpec((BB, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, npoint), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BB, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z, start)
    return out[:B]
