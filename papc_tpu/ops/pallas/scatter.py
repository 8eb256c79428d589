"""Pallas TPU kernel: row scatter-add as a transposed one-hot matmul.

This is the backward of a batched row gather (``geometry.index_points``):
``dpoints[b, n] = Σ_{s: idx[b,s]==n} g[b, s]``. XLA lowers that
scatter-add to a serialized per-row update loop on TPU — fetch-forced
at the SSG SA2 production shape (B=32, N=512, S·K=8192, C=131) it costs
**15.8 ms**, the single largest block of the train step. Here the same
sum is one MXU contraction per (batch, row-block): build the transposed
one-hot ``[NB, T]`` for a tile of T indices in VMEM and accumulate
``onehotᵀ @ g_tile`` into the output block — 0.23 ms fetch-forced at
the same shape (70×).

Exactness: the one-hot is exact in any dtype; with
``precision=HIGHEST`` the f32 operand is split hi/lo into bf16 passes
whose products against {0,1} are exact and accumulate in f32, so each
output row is an exact f32 sum of its contributing gradient rows (only
the summation ORDER differs from XLA's scatter — ulp-level, like any
reduction).

No reference analog: CUDA scatter-add is a hardware atomic
(``pointnet2_basic_layers`` relies on torch/paddle autograd); on TPU
the MXU IS the scatter engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_f32(a_bf16, b_bf16):
    return lax.dot_general(
        a_bf16,
        b_bf16,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _scatter_kernel(idx_ref, g_ref, out_ref, *, nblk: int):
    # idx_ref: [1, 1, T] i32 (lane-major index tile; -1 = padding)
    # g_ref:   [1, T, C] gradient tile
    # out_ref: [1, NB, C] accumulated output block for row range
    #          [n*NB, (n+1)*NB) — revisited across the s grid dim
    n, s = pl.program_id(1), pl.program_id(2)
    T = idx_ref.shape[2]
    ids = idx_ref[0]  # [1, T]
    base = n * nblk
    row = base + lax.broadcasted_iota(jnp.int32, (nblk, T), 0)
    g = g_ref[0]
    # the one-hot is exact in bf16 (values 0/1), so single-pass bf16
    # dots suffice for it; the f32 gradient is split into three bf16
    # planes (hi/mid/lo, 24 mantissa bits = 3×8) so the contraction
    # runs at full bf16 MXU rate and reconstructs f32 to ~2^-25
    # relative — 6× fewer MXU passes than a precision=HIGHEST f32 dot
    onehot_t = (row == ids).astype(jnp.bfloat16)  # [NB, T]
    if g.dtype == jnp.bfloat16:
        part = _dot_f32(onehot_t, g)
    else:
        g = g.astype(jnp.float32)
        hi = g.astype(jnp.bfloat16)
        rem = g - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        part = (
            _dot_f32(onehot_t, hi)
            + _dot_f32(onehot_t, mid)
            + _dot_f32(onehot_t, lo)
        )

    @pl.when(s == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(s != 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "t", "nblk")
)
def scatter_rows_add_pallas(
    g: jax.Array,
    idx: jax.Array,
    n_rows: int,
    interpret: bool = False,
    t: int | None = None,
    nblk: int | None = None,
) -> jax.Array:
    """``g [B, S, C]`` scattered-added by ``idx [B, S]`` → ``[B, n_rows, C]``.

    Index values outside ``[0, n_rows)`` (use -1 for padding) contribute
    nothing. Output dtype is f32 (gradient accumulator), cast by the
    caller if needed. ``t`` (index-tile depth, the MXU contraction dim)
    and ``nblk`` (output row-block height) override the defaults — the
    defaults were tuned on chip at the SSG backward shapes
    (``experiments/ab_scatter_tile.py``).
    """
    B, S, C = g.shape
    # index-tile width (MXU contraction dim): deep tiles amortize the
    # per-program overhead and keep the MXU pipeline full. 2048 won the
    # r4 on-chip sweep at both SSG backward shapes (~10% over 512,
    # experiments/ab_scatter_tile.log); 4096 OOMs the 16 MB scoped VMEM.
    T = t if t is not None else min(2048, ((S + 127) // 128) * 128)
    T = min(T, ((S + 127) // 128) * 128)
    cpad = (-C) % 128
    spad = (-S) % T
    if nblk is None:
        nblk = min(512, ((n_rows + 127) // 128) * 128)
    nblk = min(nblk, ((n_rows + 127) // 128) * 128)
    npad = (-n_rows) % nblk
    if cpad or spad:
        g = jnp.pad(g, ((0, 0), (0, spad), (0, cpad)))
    idx2 = jnp.pad(
        idx.astype(jnp.int32), ((0, 0), (0, spad)), constant_values=-1
    )[:, None, :]
    grid = (B, (n_rows + npad) // nblk, (S + spad) // T)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, nblk=nblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, T), lambda b, n, s: (b, 0, s),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, C + cpad), lambda b, n, s: (b, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nblk, C + cpad), lambda b, n, s: (b, n, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_rows + npad, C + cpad), jnp.float32
        ),
        interpret=interpret,
    )(idx2, g)
    return out[:, :n_rows, :C]
