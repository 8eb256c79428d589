"""Pallas TPU kernels: channel-sublane (transposed) gather + scatter-add.

The SSG geometry path's dominant cost is NOT compute — it is the lane
padding of narrow channels (r5 on-chip attribution,
``experiments/profile_geom.log``): ``index_points`` on grouped xyz
(C=3) writes a ``[B·S·K, 3]`` result whose minor axis pads 3 → 128
lanes (42× HBM traffic, 1.32 ms for a 6 MB gather), and its backward
scatter contracts one-hots against a ``[T, 3→128pad]`` gradient on the
MXU (42× wasted passes, 2.64 ms). The r4 layout rule ("small channel
dims never ride the minor axis", CLAUDE.md) applied to gather/scatter:

keep grouped tensors in ``[B, C, M]`` — C on SUBLANES (pads 3 → 8,
2.7×, instead of 3 → 128), M = S·K on lanes. Both directions are then
one MXU contraction per (batch, M-tile) against the same one-hot:

  forward:  ``out[C, T] = src[C, N] @ onehot[N, T]``
  backward: ``dsrc[C, N] += g[C, T] @ onehotᵀ[T, N]``

Padded-FLOP cost collapses ~16× (the padded dim moves from 128 lanes
to 8 sublanes); what remains is the VPU one-hot build (Θ(B·M·N)
compares, shared by every channel) and tiny HBM traffic (the SA1
grouped tensor is 16.8 MB in this layout vs 268 MB lane-padded).

Exactness: products are against a {0,1} one-hot. f32 sources split
into three bf16 planes (hi/mid/lo, 24 mantissa bits) whose products
are exact and accumulate in f32 — results match the row-gather to
~2^-25 relative (same contract as ``ops.pallas.scatter``); bf16
sources are exact. The backward's summation order differs from XLA's
scatter at ulp level, like any reduction.

No reference analog: the reference gathers via numpy round-trips
(``pointnet2_basic_layers.py:43-62``) and scatters via CUDA atomics;
on TPU the MXU is both the gather and the scatter engine, and the
layout IS the optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _split3(x_f32):
    """f32 → three bf16 planes (hi/mid/lo) reconstructing to ~2^-25."""
    hi = x_f32.astype(_BF16)
    rem = x_f32 - hi.astype(_F32)
    mid = rem.astype(_BF16)
    lo = (rem - mid.astype(_F32)).astype(_BF16)
    return hi, mid, lo


def _dot_f32(a_bf16, b_bf16):
    return lax.dot_general(
        a_bf16, b_bf16, (((1,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _gather_t_kernel(idx_ref, src_ref, out_ref):
    # idx_ref: [1, 1, T] i32 (lane-major; pre-clipped to [0, N))
    # src_ref: [1, Cp, N] whole source plane, VMEM-resident
    # out_ref: [1, Cp, T]
    src = src_ref[0]
    N = src.shape[1]
    T = idx_ref.shape[2]
    ids = idx_ref[0]  # [1, T]
    row = lax.broadcasted_iota(jnp.int32, (N, T), 0)
    onehot = (row == ids).astype(_BF16)  # [N, T], exact in bf16
    if src.dtype == _BF16:
        out = _dot_f32(src, onehot)
    else:
        hi, mid, lo = _split3(src.astype(_F32))
        out = (
            _dot_f32(hi, onehot)
            + _dot_f32(mid, onehot)
            + _dot_f32(lo, onehot)
        )
    out_ref[0] = out.astype(out_ref.dtype)


def _scatter_t_kernel(idx_ref, g_ref, out_ref):
    # idx_ref: [1, 1, T] i32 (-1 = padding, contributes nothing)
    # g_ref:   [1, Cp, T] gradient tile
    # out_ref: [1, Cp, N] accumulator, revisited across the m grid dim
    m = pl.program_id(1)
    g = g_ref[0]
    N = out_ref.shape[2]
    T = idx_ref.shape[2]
    ids = idx_ref[0]  # [1, T]
    col = lax.broadcasted_iota(jnp.int32, (T, N), 1)
    onehot_t = (ids.reshape(T, 1) == col).astype(_BF16)  # [T, N]
    if g.dtype == _BF16:
        part = _dot_f32(g, onehot_t)
    else:
        hi, mid, lo = _split3(g.astype(_F32))
        part = (
            _dot_f32(hi, onehot_t)
            + _dot_f32(mid, onehot_t)
            + _dot_f32(lo, onehot_t)
        )

    @pl.when(m == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(m != 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def _pad_cn(x_t, cpad, npad):
    if cpad or npad:
        return jnp.pad(x_t, ((0, 0), (0, cpad), (0, npad)))
    return x_t


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def gather_cols_pallas(
    src_t: jax.Array,
    idx: jax.Array,
    t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``src_t [B, C, N]`` gathered by ``idx [B, M]`` → ``[B, C, M]``.

    The channel-sublane twin of ``ops.geometry.index_points`` (same
    clamping semantics: out-of-range indices clip to ``[0, N)``).
    Differentiable: the VJP is :func:`scatter_cols_add_pallas` over the
    same one-hot (see :func:`gather_cols` for the custom-vjp wrapper).
    """
    B, C, N = src_t.shape
    M = idx.shape[1]
    cpad = (-C) % 8
    npad = (-N) % 128
    T = min(t, ((M + 127) // 128) * 128)
    mpad = (-M) % T
    src_p = _pad_cn(src_t, cpad, npad)
    idx2 = jnp.clip(idx.astype(jnp.int32), 0, N - 1)
    idx2 = jnp.pad(idx2, ((0, 0), (0, mpad)))[:, None, :]
    grid = (B, (M + mpad) // T)
    out = pl.pallas_call(
        _gather_t_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + cpad, N + npad),
                         lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C + cpad, T), lambda b, m: (b, 0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, C + cpad, M + mpad), src_t.dtype
        ),
        interpret=interpret,
    )(idx2, src_p)
    return out[:, :C, :M]


@functools.partial(
    jax.jit, static_argnames=("n_cols", "t", "interpret")
)
def scatter_cols_add_pallas(
    g_t: jax.Array,
    idx: jax.Array,
    n_cols: int,
    t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``g_t [B, C, M]`` scatter-added by ``idx [B, M]`` → ``[B, C, n_cols]``.

    Column m of ``g_t`` accumulates into column ``idx[b, m]`` of the
    output (out-of-range / -1 indices contribute nothing). Output f32.
    """
    B, C, M = g_t.shape
    cpad = (-C) % 8
    npad = (-n_cols) % 128
    T = min(t, ((M + 127) // 128) * 128)
    mpad = (-M) % T
    g_p = _pad_cn(g_t, cpad, mpad)
    idx2 = jnp.pad(
        idx.astype(jnp.int32), ((0, 0), (0, mpad)), constant_values=-1
    )[:, None, :]
    grid = (B, (M + mpad) // T)
    out = pl.pallas_call(
        _scatter_t_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + cpad, T), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, C + cpad, n_cols + npad), lambda b, m: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, C + cpad, n_cols + npad), _F32
        ),
        interpret=interpret,
    )(idx2, g_p)
    return out[:, :C, :n_cols]


@functools.lru_cache(maxsize=None)
def _make_gather_cols(n_cols: int, interpret: bool):
    @jax.custom_vjp
    def gather(src_t, idx):
        return gather_cols_pallas(src_t, idx, interpret=interpret)

    def fwd(src_t, idx):
        return gather(src_t, idx), (
            idx, jnp.zeros((), src_t.dtype)
        )

    def bwd(res, g):
        idx, proto = res
        dsrc = scatter_cols_add_pallas(
            g, idx, n_cols, interpret=interpret
        ).astype(proto.dtype)
        import numpy as np

        return dsrc, np.zeros(idx.shape, jax.dtypes.float0)

    gather.defvjp(fwd, bwd)
    return gather


def gather_cols(src_t: jax.Array, idx: jax.Array,
                interpret: bool = False) -> jax.Array:
    """Differentiable channel-sublane gather (custom VJP).

    ``src_t [B, C, N]``, ``idx [B, ...]`` → ``[B, C, prod(...)]`` with
    the backward routed through :func:`scatter_cols_add_pallas` (the
    gradient never materializes in the lane-padded ``[*, C]`` layout).
    """
    B = src_t.shape[0]
    N = src_t.shape[2]
    idx2 = idx.reshape(B, -1)
    return _make_gather_cols(N, interpret)(src_t, idx2)
