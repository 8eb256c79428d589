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


# Tile defaults, resolved at TRACE time by the plain-python wrapper
# below (never inside the jitted impl — a global read inside a jit
# cache would let a stale trace survive an override flip). ``t`` is the
# index-tile depth (MXU contraction dim): deep tiles amortize the ~6 µs
# per-grid-step overhead. 2048 won the r4 ISOLATED-kernel sweep (~10%
# over 512 at both SSG backward shapes,
# experiments/ab_scatter_tile.log) AND the r5 COMPOSED-step A/B
# (experiments/ab_scatter_composed.log: scanned SSG step 16.06 @t=2048
# vs 16.21 @t=512 vs 16.14 @t=1024 ms, interleaved best-of in one
# process) — which also exonerated this flip as the BENCH r3→r4
# 14.28→16.08 ms suspect: the r3-equivalent t=512 arm measures 16.2 in
# the same process, so that move was environment drift (now tracked by
# bench.py's calib_ms probe). 4096 OOMs the 16 MB scoped VMEM.
_TILE_DEFAULTS = {"t": 2048, "nblk": 512}


class override_tile:
    """``with override_tile(t=512):`` — flip the scatter tile default
    for composed-step A/Bs (per CLAUDE.md, default flips must re-measure
    the composed step, not just the isolated kernel). Trace-time only:
    programs traced under the override keep it; already-compiled
    programs are unaffected."""

    def __init__(self, t: int | None = None, nblk: int | None = None):
        self._new = {
            k: v
            for k, v in (("t", t), ("nblk", nblk))
            if v is not None
        }

    def __enter__(self):
        self._old = dict(_TILE_DEFAULTS)
        _TILE_DEFAULTS.update(self._new)
        return self

    def __exit__(self, *exc):
        _TILE_DEFAULTS.update(self._old)


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
    defaults were tuned on chip at the SSG backward shapes, isolated
    (``experiments/ab_scatter_tile.py``) and composed
    (``experiments/ab_scatter_composed.py``); see ``_TILE_DEFAULTS``.
    """
    S = g.shape[1]
    if t is None:
        t = min(_TILE_DEFAULTS["t"], ((S + 127) // 128) * 128)
    if nblk is None:
        nblk = min(
            _TILE_DEFAULTS["nblk"], ((n_rows + 127) // 128) * 128
        )
    return _scatter_rows_add_jit(
        g, idx, n_rows=n_rows, interpret=interpret, t=t, nblk=nblk
    )


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "t", "nblk")
)
def _scatter_rows_add_jit(
    g: jax.Array,
    idx: jax.Array,
    *,
    n_rows: int,
    interpret: bool,
    t: int,
    nblk: int,
) -> jax.Array:
    B, S, C = g.shape
    T = min(t, ((S + 127) // 128) * 128)
    cpad = (-C) % 128
    spad = (-S) % T
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
