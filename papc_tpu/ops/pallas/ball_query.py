"""Pallas TPU kernel: ball query (first-``nsample``-in-radius grouping).

The jnp path (``papc_tpu.ops.grouping.query_ball_point``) materializes the
full ``[B, S, N]`` distance matrix in HBM and runs ``lax.top_k`` over the
N axis — at large N that is hundreds of MB of HBM traffic per layer and a
sort-flavored selection. This kernel keeps everything VMEM-resident: per
(batch item, query tile) program it streams the cloud in ``TN``-point
tiles, computes the ``[TQ, TN]`` distance block on the VPU, and appends
in-radius indices into a ``[TQ, nsample]`` result buffer held in VMEM.

Selection uses min-extraction, not a per-slot sweep: each round pulls the
smallest remaining in-radius index per row (one cross-lane min), writes
it at each row's fill position (a ``[TQ, nsample]`` compare-select), and
masks it out. Rounds per tile = the max number of NEW hits any row takes
from that tile — near zero for sparse balls — so the kernel is distance-
bound, not selection-bound. Two early exits bound the scan: the inner
extraction loop stops when no row has an active candidate, and the outer
tile loop stops once every row holds ``nsample`` indices (ball query
wants the FIRST nsample by index, so a full result set is final).

Semantics match the jnp path (``grouping.py``): inclusive
``d <= radius²`` membership, ascending first-``nsample`` indices, empty
slots filled with the row's first hit, all-empty rows clamped to
``N - 1`` (reference ``pointnet2_basic_layers.py:98-126``). One caveat:
this kernel computes distances directly as ``(q-p)²`` while the XLA
path uses the ``-2ab+a²+b²`` matmul expansion, so membership EXACTLY at
the radius boundary can differ by an ulp between backends; away from
the boundary (and in every oracle test) indices match exactly.

Measured numbers + the auto-selection crossover live in
``papc_tpu.ops.grouping`` (backend table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ball_query_kernel(
    xyz_ref,  # [1, 3, Npad] f32 VMEM — coordinate-major cloud
    q_ref,  # [1, 3, TQ] f32 VMEM — query tile, coordinate-major
    out_ref,  # [1, TQ, nsample] i32 VMEM
    res_ref,  # [TQ, nsample] i32 VMEM scratch
    cnt_ref,  # [TQ, 1] i32 VMEM scratch
    *,
    radius2: float,
    nsample: int,
    n_valid: int,  # true N before lane padding
    tn: int,
):
    Npad = xyz_ref.shape[2]
    TQ = q_ref.shape[2]
    n_tiles = Npad // tn
    sentinel = jnp.int32(n_valid)

    # queries: lane vector -> sublane column, once per program
    qx = jnp.reshape(q_ref[0, 0, :], (TQ, 1))
    qy = jnp.reshape(q_ref[0, 1, :], (TQ, 1))
    qz = jnp.reshape(q_ref[0, 2, :], (TQ, 1))

    res_ref[:] = jnp.full((TQ, nsample), sentinel, jnp.int32)
    cnt_ref[:] = jnp.zeros((TQ, 1), jnp.int32)

    lane = lax.broadcasted_iota(jnp.int32, (1, tn), 1)  # [1, TN]
    slot = lax.broadcasted_iota(jnp.int32, (TQ, nsample), 1)

    def tile_body(carry):
        t, _ = carry
        base = t * tn
        px = jnp.reshape(xyz_ref[0, 0, pl.ds(base, tn)], (1, tn))
        py = jnp.reshape(xyz_ref[0, 1, pl.ds(base, tn)], (1, tn))
        pz = jnp.reshape(xyz_ref[0, 2, pl.ds(base, tn)], (1, tn))
        d = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2  # [TQ, TN]
        cidx = base + lane  # [1, TN] global point index
        # in-radius candidates hold their index; everything else sentinel
        packed0 = jnp.where(
            (d <= radius2) & (cidx < n_valid),
            jnp.broadcast_to(cidx, (TQ, tn)),
            sentinel,
        )

        def extract_cond(c):
            _, go = c
            return go

        def extract_body(c):
            packed, _ = c
            rowmin = jnp.min(packed, axis=1, keepdims=True)  # [TQ, 1]
            active = (rowmin < sentinel) & (cnt_ref[:] < nsample)
            # write rowmin at each active row's fill slot
            eq = (slot == cnt_ref[:]) & active
            res_ref[:] = jnp.where(eq, rowmin, res_ref[:])
            cnt_ref[:] = cnt_ref[:] + active.astype(jnp.int32)
            packed = jnp.where(packed == rowmin, sentinel, packed)
            go = jnp.any(
                (jnp.min(packed, axis=1, keepdims=True) < sentinel)
                & (cnt_ref[:] < nsample)
            )
            return packed, go

        go0 = jnp.any(
            (jnp.min(packed0, axis=1, keepdims=True) < sentinel)
            & (cnt_ref[:] < nsample)
        )
        lax.while_loop(extract_cond, extract_body, (packed0, go0))
        all_full = jnp.all(cnt_ref[:] >= nsample)
        return t + 1, all_full

    def tile_cond(carry):
        t, all_full = carry
        return (t < n_tiles) & jnp.logical_not(all_full)

    lax.while_loop(tile_cond, tile_body, (jnp.int32(0), jnp.bool_(False)))

    # epilogue: reference fill-with-first + degenerate clamp
    first = res_ref[:, 0:1]
    filled = jnp.where(res_ref[:] == sentinel, first, res_ref[:])
    out_ref[0] = jnp.minimum(filled, jnp.int32(n_valid - 1))


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "interpret")
)
def query_ball_point_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Pallas ball query: ``xyz [B, N, 3]``, ``new_xyz [B, S, 3]`` →
    ``[B, S, nsample]`` int32, matching
    :func:`papc_tpu.ops.grouping.query_ball_point` (up to membership
    exactly AT the radius boundary, which can differ by an ulp — see
    the module docstring)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    TN = min(512, ((N + 127) // 128) * 128)  # lane-aligned point tiles
    # query tile: don't pad small query sets (SA2 has S=128) up to 256
    TQ = min(256, ((S + 127) // 128) * 128)

    npad = (-N) % TN
    spad = (-S) % TQ
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    if npad:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, npad)))
    q_t = jnp.transpose(new_xyz.astype(jnp.float32), (0, 2, 1))
    if spad:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, spad)))

    kernel = functools.partial(
        _ball_query_kernel,
        radius2=float(radius) ** 2,
        nsample=nsample,
        n_valid=N,
        tn=TN,
    )
    out = pl.pallas_call(
        kernel,
        grid=((S + spad) // TQ, B),
        in_specs=[
            pl.BlockSpec(
                (1, 3, N + npad),
                lambda s, b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, TQ), lambda s, b: (b, 0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TQ, nsample),
            lambda s, b: (b, s, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S + spad, nsample), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TQ, nsample), jnp.int32),
            pltpu.VMEM((TQ, 1), jnp.int32),
        ],
        interpret=interpret,
    )(xyz_t, q_t)
    return out[:, :S]
