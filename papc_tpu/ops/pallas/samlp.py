"""Pallas TPU kernels: fused set-abstraction MLP (Dense→BN→ReLU stack + max).

The PointNet++ hot loop applies a shared MLP over grouped neighborhoods
``[B, S, K, C]`` with BatchNorm between layers and a max over K at the
end (reference ``pointnet2_basic_layers.py:179-221``). Expressed as
separate XLA ops, every layer materializes its fp32 pre-activation to
HBM, reads it back for the BN statistics, writes the normalized copy,
and reads that again for the next matmul — ~15 GB of HBM traffic per
SSG train step against a 1.7e11-FLOP program (measured round 3: 16.8 ms
vs a 0.87 ms MXU floor; ``jax.jit`` cost analysis puts the step's HBM
floor at 18.3 ms — the op-by-op program IS its own roofline).

These kernels restructure the block into *linear passes* that keep each
tile's activation chain in VMEM/registers:

- forward (train): one ``linear+stats`` pass per layer — read the
  previous layer's **bf16 pre-activation**, apply the previous BN's
  affine + ReLU in-register, matmul, write the new bf16 pre-activation,
  and accumulate per-channel fp32 sum/sum² for this layer's batch
  stats. A final ``finalize`` pass applies the last BN+ReLU and the max
  over K (recording the argmax for the backward pass). The BN stats
  barrier between layers is exactly one kernel launch boundary.
- forward (eval): running stats make every BN a constant affine, so the
  whole stack + max fuses into ONE pass (read grouped input once, write
  the pooled output once).
- backward: one ``seed`` pass (scatter d(out) through the saved argmax,
  ReLU gate, accumulate the last BN's global gradient sums) + one pass
  per layer walking down the stack: apply the analytic BatchNorm
  backward (needs the global sums from the pass above — again exactly
  one launch boundary), accumulate ``dW``/``db`` on the MXU, propagate
  ``dy`` to the layer below, accumulate that layer's BN sums.

Inter-pass activations are stored bfloat16 (the MXU consumes bf16
anyway at DEFAULT matmul precision); all statistics, reductions and
accumulators are fp32. BatchNorm semantics replicate
``flax.linen.BatchNorm`` (biased fast variance E[x²]−E[x]², clipped at
0, fp32 reductions).

Wrapped with a custom VJP and numerics-mirroring jnp twin in
``papc_tpu.ops.fused_mlp``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


# Scoped-VMEM budget per pallas_call (chip limit 16 MB; leave room for
# double-buffered pipelining, which the estimate below folds in at 2x
# on the streamed blocks).
_VMEM_BUDGET = 12 * 1024 * 1024

def _tile_target_override() -> int:
    """On-chip tuning knob: override the pass_tile row target without
    code edits (grid-step overhead is ~6 µs/step, so fatter tiles win
    until the VMEM cap — A/B on the chip, then bake the winner in).
    Read at TRACE time, not import, so one process can interleave
    candidates (set the env var between building jitted programs —
    cross-process comparisons are meaningless through the relay)."""
    return int(os.environ.get("PAPC_SAMLP_TILE_TARGET", "0"))


def pass_tile(m: int, k: int, bytes_per_row: int, *, of_k: bool,
              target: int = 4096) -> int:
    """VMEM-aware rows-per-grid-step for one pass.

    ``bytes_per_row``: scoped-vmem bytes per tile row — double-buffered
    streamed blocks (2x element size each) plus live f32 temps. The
    models in the callers are calibrated against the compiler's scoped
    allocation reports on chip (linear_stats 1.47 KB/row, bwd_layer
    4.16 KB/row at SA2-L3 shapes). ``of_k``: tile must be a multiple
    of ``k`` (max-group passes). Measured on chip (v5e): 2048-row tiles
    run several times slower per row than 4096 (per-step overhead),
    while the largest tiles hit the 16 MB scoped-vmem wall — so: as
    close to ``target`` as the budget allows, never straddling a
    K-group when it matters.
    """
    cap = max(1, _VMEM_BUDGET // max(1, bytes_per_row))
    t = min(_tile_target_override() or target, cap)
    # of_k passes emit [tm//k, C] blocks: Mosaic wants the row dim
    # divisible by 8, so tiles advance in strides of 8 K-groups
    step = 8 * k if of_k else min(256, m)
    tm = max(step, (t // step) * step)
    while tm > step and m % tm:
        tm -= step
    if m % tm and not of_k:
        # no multiple of 256 divides m (e.g. m = 16000): fall back to
        # 8-row strides — the grid MUST cover every row exactly, or
        # tail rows stay uninitialized (streamed passes) / fall out of
        # the accumulated sums (stats passes). of_k passes get NO such
        # fallback: their tiles must stay multiples of 8*k (output
        # blocks and max groups are K-group aligned), so a non-dividing
        # 8*k stride falls through to the raise below.
        tm = max(8, (min(t, m) // 8) * 8)
        while tm > 8 and m % tm:
            tm -= 8
    if m % tm:
        raise ValueError(
            f"pass_tile: no valid tile for m={m} k={k} of_k={of_k} "
            "(callers must pass 8-row-aligned group counts)"
        )
    return tm


# --------------------------------------------------------------- forward

def _linear_stats_kernel(*refs, pre_affine: bool, transposed: bool,
                         sdtype):
    if pre_affine:
        x_ref, vec_ref, w_ref, b_ref, a_ref, s_ref = refs
    else:
        x_ref, w_ref, b_ref, a_ref, s_ref = refs
    x = x_ref[:].astype(_F32)
    if pre_affine:
        x = jnp.maximum(x * vec_ref[0, :] + vec_ref[1, :], 0.0)
    if transposed:
        # x block is [c0, tm] (channel-sublane block input — the
        # gather_t layout); contract the sublane dim of BOTH operands:
        # the MXU's native lhsT·rhs form, no relayout of the tile
        a = lax.dot_general(
            x.astype(_BF16), w_ref[:].astype(_BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=_F32,
        ) + b_ref[0, :]
    else:
        a = jnp.dot(
            x.astype(_BF16), w_ref[:].astype(_BF16),
            preferred_element_type=_F32,
        ) + b_ref[0, :]
    a_ref[:] = a.astype(sdtype)
    s = jnp.concatenate(
        [
            jnp.sum(a, axis=0, keepdims=True),
            jnp.sum(a * a, axis=0, keepdims=True),
        ],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = s

    @pl.when(pl.program_id(0) != 0)
    def _():
        s_ref[:] = s_ref[:] + s


def linear_stats(x, vec, w, b, *, tm: int = 0, sdtype=_BF16,
                 transposed: bool = False, interpret: bool = False):
    """One forward layer pass: ``a = relu(x·vec)·W + b`` plus stats.

    ``x``: ``[M, Cin]`` bf16 pre-activation of the previous layer (raw
    input when ``vec is None``); ``vec``: ``[2, Cin]`` f32 (scale,
    shift) of the previous BN or None; returns ``(a [M, Cout] bf16,
    sums [2, Cout] f32)`` where sums rows are (Σa, Σa²).

    ``transposed``: ``x`` is ``[Cin, M]`` channel-sublane (the
    ``gather_t`` layout — narrow C pads 8 sublanes instead of 128
    lanes; the first-layer dot contracts it in the MXU-native lhsT
    form). Only the raw block input supports this (``vec is None``).
    """
    if transposed:
        assert vec is None, "transposed input is the raw block input"
        cin, m = x.shape
    else:
        m, cin = x.shape
    cout = w.shape[1]
    if not tm:
        # scoped-vmem/row calibrated on chip: 2x-buffered streams
        esz = jnp.dtype(sdtype).itemsize
        tm = pass_tile(m, 1, 2 * esz * (cin + cout), of_k=False)
    grid = (m // tm,)
    pre_affine = vec is not None
    if transposed:
        in_specs = [pl.BlockSpec((cin, tm), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
    else:
        in_specs = [pl.BlockSpec((tm, cin), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    args = [x]
    if pre_affine:
        in_specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vec.astype(_F32))
    in_specs += [
        pl.BlockSpec((cin, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [w, b.reshape(1, cout).astype(_F32)]
    return pl.pallas_call(
        functools.partial(
            _linear_stats_kernel, pre_affine=pre_affine,
            transposed=transposed, sdtype=sdtype,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tm, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, cout), sdtype),
            jax.ShapeDtypeStruct((2, cout), _F32),
        ),
        interpret=interpret,
    )(*args)


def _finalize_kernel(a_ref, vec_ref, out_ref, amax_ref, *, k: int):
    tm, c = a_ref.shape
    h = jnp.maximum(
        a_ref[:].astype(_F32) * vec_ref[0, :] + vec_ref[1, :], 0.0
    ).reshape(tm // k, k, c)
    mx = jnp.max(h, axis=1)
    out_ref[:] = mx
    kio = lax.broadcasted_iota(jnp.int32, (tm // k, k, c), 1)
    amax_ref[:] = jnp.min(
        jnp.where(h == mx[:, None, :], kio, k), axis=1
    ).astype(jnp.int32)


def finalize_max(a, vec, *, k: int, tm: int = 0,
                 interpret: bool = False):
    """Last BN+ReLU + max over each K-group: ``[M, C]`` → ``[M//k, C]``
    f32 plus the first-occurrence argmax (int32) for the backward."""
    m, c = a.shape
    if not tm:
        tm = pass_tile(m, k, 12 * c, of_k=True)
    grid = (m // tm,)
    return pl.pallas_call(
        functools.partial(_finalize_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm // k, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // k, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m // k, c), _F32),
            jax.ShapeDtypeStruct((m // k, c), jnp.int32),
        ),
        interpret=interpret,
    )(a, vec.astype(_F32))


def _eval_kernel(*refs, n_layers: int, k: int, transposed: bool):
    x_ref = refs[0]
    out_ref = refs[1 + 3 * n_layers]
    x = x_ref[:].astype(_F32)
    for i in range(n_layers):
        vec_ref, w_ref, b_ref = refs[1 + 3 * i: 4 + 3 * i]
        if i == 0 and transposed:
            a = lax.dot_general(
                x.astype(_BF16), w_ref[:].astype(_BF16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_F32,
            ) + b_ref[0, :]
        else:
            a = jnp.dot(
                x.astype(_BF16), w_ref[:].astype(_BF16),
                preferred_element_type=_F32,
            ) + b_ref[0, :]
        x = jnp.maximum(a * vec_ref[0, :] + vec_ref[1, :], 0.0)
    tm = x.shape[0]
    out_ref[:] = jnp.max(x.reshape(tm // k, k, x.shape[1]), axis=1)


def eval_mlp_max(x, vecs, ws, bs, *, k: int, tm: int = 0,
                 transposed: bool = False, interpret: bool = False):
    """Whole eval-mode stack + max in ONE pass (running-stat BNs are
    constant affines): ``[M, C0]`` bf16 → ``[M//k, C_last]`` f32.
    ``transposed``: ``x`` is ``[C0, M]`` channel-sublane."""
    if transposed:
        c0, m = x.shape
    else:
        m, c0 = x.shape
    n = len(ws)
    if not tm:
        cmax = max(w.shape[1] for w in ws)
        tm = pass_tile(m, k, 4 * c0 + 12 * cmax, of_k=True)
    grid = (m // tm,)
    if transposed:
        in_specs = [pl.BlockSpec((c0, tm), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
    else:
        in_specs = [pl.BlockSpec((tm, c0), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    args = [x]
    for vec, w, b in zip(vecs, ws, bs):
        cin, cout = w.shape
        in_specs += [
            pl.BlockSpec((2, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [vec.astype(_F32), w, b.reshape(1, cout).astype(_F32)]
    c_last = ws[-1].shape[1]
    return pl.pallas_call(
        functools.partial(
            _eval_kernel, n_layers=n, k=k, transposed=transposed
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm // k, c_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m // k, c_last), _F32),
        interpret=interpret,
    )(*args)


# -------------------------------------------------------------- backward

def _bwd_seed_kernel(a_ref, vec_ref, dout_ref, amax_ref, dy_ref, s_ref,
                     *, k: int, sdtype):
    tm, c = a_ref.shape
    a = a_ref[:].astype(_F32)
    o = a * vec_ref[0, :] + vec_ref[1, :]
    kio = lax.broadcasted_iota(jnp.int32, (tm // k, k, c), 1)
    dh = jnp.where(
        kio == amax_ref[:][:, None, :], dout_ref[:][:, None, :], 0.0
    ).reshape(tm, c)
    dy = jnp.where(o > 0, dh, 0.0)
    dy_ref[:] = dy.astype(sdtype)
    xhat = (a - vec_ref[2, :]) * vec_ref[3, :]
    s = jnp.concatenate(
        [
            jnp.sum(dy, axis=0, keepdims=True),
            jnp.sum(dy * xhat, axis=0, keepdims=True),
        ],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = s

    @pl.when(pl.program_id(0) != 0)
    def _():
        s_ref[:] = s_ref[:] + s


def bwd_seed(a, vec, dout, amax, *, k: int, tm: int = 0, sdtype=_BF16,
             interpret: bool = False):
    """Scatter d(out) through the max argmax + last ReLU gate.

    Returns ``dy [M, C]`` bf16 (gradient at the last BN's output) and
    the last BN's global sums ``[2, C]`` f32: (Σdy, Σdy·x̂).
    ``vec``: ``[4, C]`` f32 rows (scale, shift, mean, inv_std).
    """
    m, c = a.shape
    if not tm:
        tm = pass_tile(m, k, 20 * c, of_k=True)
    grid = (m // tm,)
    return pl.pallas_call(
        functools.partial(_bwd_seed_kernel, k=k, sdtype=sdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // k, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm // k, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, c), sdtype),
            jax.ShapeDtypeStruct((2, c), _F32),
        ),
        interpret=interpret,
    )(a, vec.astype(_F32), dout.astype(_F32), amax)


def _bwd_layer_kernel(dy_ref, a_ref, ap_ref, w_ref, vec_ref, s_in_ref,
                      *rest, first_layer: bool, transposed: bool,
                      m_total: float, sdtype):
    if first_layer:
        dg_ref, dw_ref, db_ref = rest
    else:
        vecp_ref, dyp_ref, dw_ref, db_ref, s_out_ref = rest
    dy = dy_ref[:].astype(_F32)
    a = a_ref[:].astype(_F32)
    xhat = (a - vec_ref[2, :]) * vec_ref[3, :]
    mu1 = s_in_ref[0, :] / m_total
    mu2 = s_in_ref[1, :] / m_total
    da = vec_ref[0, :] * (dy - mu1 - xhat * mu2)
    dab = da.astype(_BF16)
    ap = ap_ref[:].astype(_F32)
    if first_layer:
        h_prev = ap
    else:
        h_prev = jnp.maximum(ap * vecp_ref[0, :] + vecp_ref[1, :], 0.0)
    # dW = h_prevᵀ · da  (contract rows), accumulated over grid steps
    if transposed:
        # h_prev block is [cin, tm] channel-sublane: contract its LANE
        # dim against da's rows — the standard a@b form, no relayout
        dw = lax.dot_general(
            h_prev.astype(_BF16), dab,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )
    else:
        dw = lax.dot_general(
            h_prev.astype(_BF16), dab,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )
    db = jnp.sum(da, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(pl.program_id(0) != 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw
        db_ref[:] = db_ref[:] + db

    if first_layer and transposed:
        # dg in channel-sublane layout: [cin, tm] = W · daᵀ (contract
        # the Cout lanes of both) — the block-input gradient then feeds
        # scatter_cols_add_pallas without ever living lane-padded
        dg_ref[:] = lax.dot_general(
            w_ref[:].astype(_BF16), dab,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
        )
        return

    # dh_prev = da · Wᵀ (contract the Cout axis of both)
    dhp = lax.dot_general(
        dab, w_ref[:].astype(_BF16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )
    if first_layer:
        dg_ref[:] = dhp
    else:
        op = ap * vecp_ref[0, :] + vecp_ref[1, :]
        dyp = jnp.where(op > 0, dhp, 0.0)
        dyp_ref[:] = dyp.astype(sdtype)
        xhatp = (ap - vecp_ref[2, :]) * vecp_ref[3, :]
        s = jnp.concatenate(
            [
                jnp.sum(dyp, axis=0, keepdims=True),
                jnp.sum(dyp * xhatp, axis=0, keepdims=True),
            ],
            axis=0,
        )

        @pl.when(pl.program_id(0) == 0)
        def _():
            s_out_ref[:] = s

        @pl.when(pl.program_id(0) != 0)
        def _():
            s_out_ref[:] = s_out_ref[:] + s


def bwd_layer(dy, a, a_prev, w, vec, s_in, vec_prev, *, tm: int = 0,
              sdtype=_BF16, transposed: bool = False,
              interpret: bool = False):
    """One backward layer pass.

    Applies the analytic BatchNorm backward for this layer (``da``),
    accumulates ``dW = h_prevᵀ·da`` and ``db``, and propagates to the
    layer below: ``dy_prev`` (bf16, through the previous ReLU gate) plus
    the previous BN's global sums. When ``vec_prev is None`` this is the
    first layer: ``a_prev`` is the raw block input and the pass emits
    ``dg`` (f32) with no sums.

    ``transposed`` (first layer only): ``a_prev`` is the channel-sublane
    ``[Cin, M]`` block input and ``dg`` comes back ``[Cin, M]`` — the
    gather_t layout, so narrow-C inputs never materialize lane-padded.

    Returns ``(dy_prev|dg, dw [Cin,Cout] f32, db [1,Cout] f32,
    s_prev [2,Cin] f32 | None)``.
    """
    m, cout = dy.shape
    if transposed:
        assert vec_prev is None, "transposed applies to the first layer"
        cin = a_prev.shape[0]
    else:
        cin = a_prev.shape[1]
    if not tm:
        # 16*cin covers the first-layer variant's f32 dg output block
        # (surrounding-program context can also eat scoped headroom —
        # observed 17.6M under a scanned train loop where the same
        # pass fit standalone)
        tm = pass_tile(m, 1, 12 * cout + 16 * cin, of_k=False)
    grid = (m // tm,)
    first = vec_prev is None
    ap_spec = (
        pl.BlockSpec((cin, tm), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
        if transposed
        else pl.BlockSpec((tm, cin), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((tm, cout), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, cout), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        ap_spec,
        pl.BlockSpec((cin, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [dy, a, a_prev, w, vec.astype(_F32), s_in]
    out_specs = []
    out_shape = []
    if not first:
        in_specs.append(pl.BlockSpec((4, cin), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vec_prev.astype(_F32))
        out_specs.append(pl.BlockSpec((tm, cin), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, cin), sdtype))
    elif transposed:
        out_specs.append(pl.BlockSpec((cin, tm), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((cin, m), _F32))
    else:
        out_specs.append(pl.BlockSpec((tm, cin), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m, cin), _F32))
    out_specs += [
        pl.BlockSpec((cin, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((cin, cout), _F32),
        jax.ShapeDtypeStruct((1, cout), _F32),
    ]
    if not first:
        out_specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2, cin), _F32))
    m_total = float(m)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_layer_kernel, first_layer=first, transposed=transposed,
            m_total=m_total, sdtype=sdtype,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    if first:
        dg, dw, db = outs
        return dg, dw, db, None
    dyp, dw, db, s_prev = outs
    return dyp, dw, db, s_prev


# ------------------------------------------------- v2: recompute passes
# The streaming passes above still move every layer's [M, C] activation
# through HBM (403 MB per backward pass at SA2 scale — measured as the
# train step's dominant traffic). These passes instead RE-COMPUTE the
# layer chain from the block input inside each tile: every pass reads
# only ``g2 [M, C0]`` (+ dout/amax for the backward), so HBM traffic
# collapses to O(passes x |g2|) — for SA1 (C0=3) that is ~3 MB per
# sweep against a 67-134 MB activation chain. The trade is O(L) extra
# MXU work per pass; at PointNet++ widths the MXU has ~50x headroom
# over HBM at these shapes. Chain arithmetic is f32 in-register
# (MORE accurate than the v1 bf16-stored chain); dots stay bf16-input.

def _chain_fwd(x, vecs, ws, bs, upto):
    """In-kernel: recompute a_1..a_upto from f32 x; returns the list of
    pre-activations ``a_i`` and hidden ``h_i = relu(a_i*vec_i)``
    (h list has upto-1 entries; vecs has >= upto-1 entries)."""
    a_list, h_list = [], []
    h = x
    for i in range(upto):
        a = jnp.dot(
            h.astype(_BF16), ws[i][:].astype(_BF16),
            preferred_element_type=_F32,
        ) + bs[i][0, :]
        a_list.append(a)
        if i < upto - 1:
            h = jnp.maximum(a * vecs[i][0, :] + vecs[i][1, :], 0.0)
            h_list.append(h)
    return a_list, h_list


def _rc_stats_kernel(*refs, upto: int):
    g_ref = refs[0]
    vec_refs = list(refs[1:upto])
    w_refs = list(refs[upto:2 * upto])
    b_refs = list(refs[2 * upto:3 * upto])
    s_ref = refs[-1]
    a_list, _ = _chain_fwd(
        g_ref[:].astype(_F32), vec_refs, w_refs, b_refs, upto
    )
    a = a_list[-1]
    s = jnp.concatenate(
        [
            jnp.sum(a, axis=0, keepdims=True),
            jnp.sum(a * a, axis=0, keepdims=True),
        ],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = s

    @pl.when(pl.program_id(0) != 0)
    def _():
        s_ref[:] = s_ref[:] + s


def _widths(ws):
    return [ws[0].shape[0]] + [w.shape[1] for w in ws]


def _rc_tile(m, k, ws, extra_cols, *, of_k):
    """Tile rows for a recompute pass: f32 chain + extras per row."""
    cols = sum(_widths(ws)) + extra_cols
    return pass_tile(m, k, 6 * cols, of_k=of_k, target=2048)


def recompute_stats(g2, vecs, ws, bs, *, upto: int, tm: int = 0,
                    interpret: bool = False):
    """Forward stats pass for layer ``upto`` (1-indexed): recompute the
    chain from ``g2`` with the ``upto-1`` known BN affines, return
    ``[2, c_upto]`` (Σa, Σa²)."""
    m, c0 = g2.shape
    if not tm:
        tm = _rc_tile(m, 1, ws[:upto], 0, of_k=False)
    grid = (m // tm,)
    in_specs = [pl.BlockSpec((tm, c0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [g2]
    for vec in vecs[:upto - 1]:
        c = vec.shape[1]
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vec[:2].astype(_F32))
    for w in ws[:upto]:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w)
    for w, b in zip(ws[:upto], bs[:upto]):
        c = w.shape[1]
        in_specs.append(pl.BlockSpec((1, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, c).astype(_F32))
    cout = ws[upto - 1].shape[1]
    return pl.pallas_call(
        functools.partial(_rc_stats_kernel, upto=upto),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, cout), _F32),
        interpret=interpret,
    )(*args)


def _rc_final_kernel(*refs, n_layers: int, k: int, with_amax: bool):
    g_ref = refs[0]
    vec_refs = list(refs[1:1 + n_layers])
    w_refs = list(refs[1 + n_layers:1 + 2 * n_layers])
    b_refs = list(refs[1 + 2 * n_layers:1 + 3 * n_layers])
    out_ref = refs[1 + 3 * n_layers]
    a_list, _ = _chain_fwd(
        g_ref[:].astype(_F32), vec_refs, w_refs, b_refs, n_layers
    )
    vecL = vec_refs[n_layers - 1]
    h = jnp.maximum(a_list[-1] * vecL[0, :] + vecL[1, :], 0.0)
    tm, c = h.shape
    h3 = h.reshape(tm // k, k, c)
    mx = jnp.max(h3, axis=1)
    out_ref[:] = mx
    if with_amax:
        amax_ref = refs[2 + 3 * n_layers]
        kio = lax.broadcasted_iota(jnp.int32, (tm // k, k, c), 1)
        amax_ref[:] = jnp.min(
            jnp.where(h3 == mx[:, None, :], kio, k), axis=1
        ).astype(jnp.int32)


def recompute_final_max(g2, vecs, ws, bs, *, k: int, tm: int = 0,
                        with_amax: bool = True,
                        interpret: bool = False):
    """Final forward pass: recompute the whole chain + last BN/ReLU +
    max over K. Returns ``(out2 [M//k, cL] f32, amax i32)`` (amax only
    when ``with_amax`` — eval mode skips it)."""
    m, c0 = g2.shape
    n = len(ws)
    if not tm:
        tm = _rc_tile(m, k, ws, 0, of_k=True)
    grid = (m // tm,)
    in_specs = [pl.BlockSpec((tm, c0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [g2]
    for vec in vecs:
        c = vec.shape[1]
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vec[:2].astype(_F32))
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w)
    for w, b in zip(ws, bs):
        cout = w.shape[1]
        in_specs.append(pl.BlockSpec((1, cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout).astype(_F32))
    c_last = ws[-1].shape[1]
    out_specs = [pl.BlockSpec((tm // k, c_last), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((m // k, c_last), _F32)]
    if with_amax:
        out_specs.append(pl.BlockSpec((tm // k, c_last),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((m // k, c_last), jnp.int32)
        )
    outs = pl.pallas_call(
        functools.partial(
            _rc_final_kernel, n_layers=n, k=k, with_amax=with_amax
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    return outs if with_amax else (outs[0], None)


def _chain_bwd(a_list, h_list, dout, amax, vec_refs, w_refs, mu_refs,
               *, k: int, level: int, n_layers: int):
    """In-kernel: from the recomputed chain, walk the cotangent down to
    ``level`` (1-indexed). ``mu_refs[j]`` is ``[2, c_j]`` (mu1, mu2) for
    layers level+1..L (None-padded list indexed 0..L-1). Returns
    ``(dy_level, da at each visited layer as dict)``."""
    vecL = vec_refs[n_layers - 1]
    aL = a_list[n_layers - 1]
    o = aL * vecL[0, :] + vecL[1, :]
    tm, c = aL.shape
    kio = lax.broadcasted_iota(jnp.int32, (tm // k, k, c), 1)
    dh = jnp.where(
        kio == amax[:][:, None, :], dout[:][:, None, :], 0.0
    ).reshape(tm, c)
    dy = jnp.where(o > 0, dh, 0.0)
    da_map = {}
    for j in range(n_layers, level, -1):
        vj = vec_refs[j - 1]
        aj = a_list[j - 1]
        xhat = (aj - vj[2, :]) * vj[3, :]
        mu = mu_refs[j - 1]
        da = vj[0, :] * (dy - mu[0, :] - xhat * mu[1, :])
        da_map[j] = da
        dhp = lax.dot_general(
            da.astype(_BF16), w_refs[j - 1][:].astype(_BF16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
        )
        if j - 1 >= 1:
            vprev = vec_refs[j - 2]
            op = a_list[j - 2] * vprev[0, :] + vprev[1, :]
            dy = jnp.where(op > 0, dhp, 0.0)
        else:
            dy = dhp  # gradient w.r.t. the raw block input
    return dy, da_map


def _rc_bwd_stats_kernel(*refs, n_layers: int, k: int, level: int):
    g_ref = refs[0]
    dout_ref = refs[1]
    amax_ref = refs[2]
    base = 3
    vec_refs = list(refs[base:base + n_layers])
    w_refs = list(refs[base + n_layers:base + 2 * n_layers])
    b_refs = list(refs[base + 2 * n_layers:base + 3 * n_layers])
    n_mu = n_layers - level
    mu_list = list(refs[base + 3 * n_layers:base + 3 * n_layers + n_mu])
    s_ref = refs[-1]
    mu_refs = [None] * n_layers
    for i, j in enumerate(range(level + 1, n_layers + 1)):
        mu_refs[j - 1] = mu_list[i]
    a_list, _ = _chain_fwd(
        g_ref[:].astype(_F32),
        [v for v in vec_refs], w_refs, b_refs, n_layers,
    )
    dy, _ = _chain_bwd(
        a_list, None, dout_ref, amax_ref, vec_refs, w_refs, mu_refs,
        k=k, level=level, n_layers=n_layers,
    )
    vl = vec_refs[level - 1]
    xhat = (a_list[level - 1] - vl[2, :]) * vl[3, :]
    s = jnp.concatenate(
        [
            jnp.sum(dy, axis=0, keepdims=True),
            jnp.sum(dy * xhat, axis=0, keepdims=True),
        ],
        axis=0,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[:] = s

    @pl.when(pl.program_id(0) != 0)
    def _():
        s_ref[:] = s_ref[:] + s


def _rc_common_specs(g2, dout, amax, vecs, ws, bs, tm, k):
    m, c0 = g2.shape
    c_last = ws[-1].shape[1]
    in_specs = [
        pl.BlockSpec((tm, c0), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm // k, c_last), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm // k, c_last), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g2, dout.astype(_F32), amax]
    for vec in vecs:
        c = vec.shape[1]
        in_specs.append(pl.BlockSpec((4, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(vec.astype(_F32))
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w)
    for w, b in zip(ws, bs):
        cout = w.shape[1]
        in_specs.append(pl.BlockSpec((1, cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout).astype(_F32))
    return in_specs, args


def recompute_bwd_stats(g2, dout, amax, vecs, ws, bs, mus, *,
                        level: int, k: int, tm: int = 0,
                        interpret: bool = False):
    """Backward stats pass for layer ``level``: recompute the chain,
    walk the cotangent down from the max to ``level`` using the known
    per-layer gradient means ``mus[j] = [2, c_j]`` for j > level, and
    return layer ``level``'s global sums ``[2, c_level]``
    (Σdy, Σdy·x̂) — its (dbeta, dgamma)."""
    m, c0 = g2.shape
    n = len(ws)
    if not tm:
        tm = _rc_tile(m, k, ws, ws[-1].shape[1], of_k=True)
    grid = (m // tm,)
    in_specs, args = _rc_common_specs(
        g2, dout, amax, vecs, ws, bs, tm, k
    )
    for j in range(level + 1, n + 1):
        c = ws[j - 1].shape[1]
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mus[j - 1].astype(_F32))
    c_level = ws[level - 1].shape[1]
    return pl.pallas_call(
        functools.partial(
            _rc_bwd_stats_kernel, n_layers=n, k=k, level=level
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, c_level), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c_level), _F32),
        interpret=interpret,
    )(*args)


def _rc_bwd_final_kernel(*refs, n_layers: int, k: int, out_dtype):
    g_ref = refs[0]
    dout_ref = refs[1]
    amax_ref = refs[2]
    base = 3
    vec_refs = list(refs[base:base + n_layers])
    w_refs = list(refs[base + n_layers:base + 2 * n_layers])
    b_refs = list(refs[base + 2 * n_layers:base + 3 * n_layers])
    mu_list = list(refs[base + 3 * n_layers:base + 4 * n_layers])
    n_in = base + 4 * n_layers
    dg_ref = refs[n_in]
    dw_refs = list(refs[n_in + 1:n_in + 1 + n_layers])
    db_refs = list(refs[n_in + 1 + n_layers:n_in + 1 + 2 * n_layers])
    g = g_ref[:].astype(_F32)
    a_list, h_list = _chain_fwd(g, vec_refs, w_refs, b_refs, n_layers)
    dy, da_map = _chain_bwd(
        a_list, h_list, dout_ref, amax_ref, vec_refs, w_refs, mu_list,
        k=k, level=0, n_layers=n_layers,
    )
    # dy is now the gradient w.r.t. the raw block input
    dg_ref[:] = dy.astype(out_dtype)
    h_prev = [g] + h_list  # h_prev[j-1] feeds layer j
    for j in range(1, n_layers + 1):
        da = da_map[j]
        dw = lax.dot_general(
            h_prev[j - 1].astype(_BF16), da.astype(_BF16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=_F32,
        )
        db = jnp.sum(da, axis=0, keepdims=True)

        @pl.when(pl.program_id(0) == 0)
        def _(dw_ref=dw_refs[j - 1], db_ref=db_refs[j - 1], dw=dw,
              db=db):
            dw_ref[:] = dw
            db_ref[:] = db

        @pl.when(pl.program_id(0) != 0)
        def _(dw_ref=dw_refs[j - 1], db_ref=db_refs[j - 1], dw=dw,
              db=db):
            dw_ref[:] = dw_ref[:] + dw
            db_ref[:] = db_ref[:] + db


def recompute_bwd_final(g2, dout, amax, vecs, ws, bs, mus, *, k: int,
                        tm: int = 0, interpret: bool = False):
    """Final backward pass: recompute chain + full cotangent walk,
    accumulate every layer's ``dW``/``db`` on the MXU and emit the
    block-input gradient ``dg2 [M, C0]`` f32. ``mus`` has all L
    layers' gradient means."""
    m, c0 = g2.shape
    n = len(ws)
    if not tm:
        tm = _rc_tile(m, k, ws, ws[-1].shape[1] + c0, of_k=True)
    grid = (m // tm,)
    in_specs, args = _rc_common_specs(
        g2, dout, amax, vecs, ws, bs, tm, k
    )
    for j in range(1, n + 1):
        c = ws[j - 1].shape[1]
        in_specs.append(pl.BlockSpec((2, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mus[j - 1].astype(_F32))
    out_specs = [pl.BlockSpec((tm, c0), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((m, c0), _F32)]
    for w in ws:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, _F32))
    for w in ws:
        out_specs.append(pl.BlockSpec((1, w.shape[1]),
                                      lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((1, w.shape[1]), _F32)
        )
    outs = pl.pallas_call(
        functools.partial(
            _rc_bwd_final_kernel, n_layers=n, k=k, out_dtype=_F32
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
    dg2 = outs[0]
    dws = outs[1:1 + n]
    dbs = outs[1 + n:1 + 2 * n]
    return dg2, dws, dbs
