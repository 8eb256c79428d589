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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def choose_tile(m: int, k: int, target: int = 2048) -> int:
    """Rows per grid step: a multiple of ``k`` (so max-groups never
    straddle tiles) that divides ``m``, as close to ``target`` as
    possible. ``k`` itself always qualifies (m = B*S*k)."""
    tm = max(k, (target // k) * k)
    while tm > k and m % tm:
        tm -= k
    return tm


# Scoped-VMEM budget per pallas_call (chip limit 16 MB; leave room for
# double-buffered pipelining, which the estimate below folds in at 2x
# on the streamed blocks).
_VMEM_BUDGET = 12 * 1024 * 1024


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
    t = min(target, cap)
    # of_k passes emit [tm//k, C] blocks: Mosaic wants the row dim
    # divisible by 8, so tiles advance in strides of 8 K-groups
    step = 8 * k if of_k else min(256, m)
    tm = max(step, (t // step) * step)
    while tm > step and m % tm:
        tm -= step
    return tm


# --------------------------------------------------------------- forward

def _linear_stats_kernel(*refs, pre_affine: bool, sdtype):
    if pre_affine:
        x_ref, vec_ref, w_ref, b_ref, a_ref, s_ref = refs
    else:
        x_ref, w_ref, b_ref, a_ref, s_ref = refs
    x = x_ref[:].astype(_F32)
    if pre_affine:
        x = jnp.maximum(x * vec_ref[0, :] + vec_ref[1, :], 0.0)
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
                 interpret: bool = False):
    """One forward layer pass: ``a = relu(x·vec)·W + b`` plus stats.

    ``x``: ``[M, Cin]`` bf16 pre-activation of the previous layer (raw
    input when ``vec is None``); ``vec``: ``[2, Cin]`` f32 (scale,
    shift) of the previous BN or None; returns ``(a [M, Cout] bf16,
    sums [2, Cout] f32)`` where sums rows are (Σa, Σa²).
    """
    m, cin = x.shape
    cout = w.shape[1]
    if not tm:
        # scoped-vmem/row calibrated on chip: 2x-buffered streams
        esz = jnp.dtype(sdtype).itemsize
        tm = pass_tile(m, 1, 2 * esz * (cin + cout), of_k=False)
    grid = (m // tm,)
    pre_affine = vec is not None
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
            _linear_stats_kernel, pre_affine=pre_affine, sdtype=sdtype
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


def _eval_kernel(*refs, n_layers: int, k: int):
    x_ref = refs[0]
    out_ref = refs[1 + 3 * n_layers]
    x = x_ref[:].astype(_F32)
    for i in range(n_layers):
        vec_ref, w_ref, b_ref = refs[1 + 3 * i: 4 + 3 * i]
        a = jnp.dot(
            x.astype(_BF16), w_ref[:].astype(_BF16),
            preferred_element_type=_F32,
        ) + b_ref[0, :]
        x = jnp.maximum(a * vec_ref[0, :] + vec_ref[1, :], 0.0)
    tm = x.shape[0]
    out_ref[:] = jnp.max(x.reshape(tm // k, k, x.shape[1]), axis=1)


def eval_mlp_max(x, vecs, ws, bs, *, k: int, tm: int = 0,
                 interpret: bool = False):
    """Whole eval-mode stack + max in ONE pass (running-stat BNs are
    constant affines): ``[M, C0]`` bf16 → ``[M//k, C_last]`` f32."""
    m, c0 = x.shape
    n = len(ws)
    if not tm:
        cmax = max(w.shape[1] for w in ws)
        tm = pass_tile(m, k, 4 * c0 + 12 * cmax, of_k=True)
    grid = (m // tm,)
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
        functools.partial(_eval_kernel, n_layers=n, k=k),
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
                      *rest, first_layer: bool, m_total: float, sdtype):
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
              sdtype=_BF16, interpret: bool = False):
    """One backward layer pass.

    Applies the analytic BatchNorm backward for this layer (``da``),
    accumulates ``dW = h_prevᵀ·da`` and ``db``, and propagates to the
    layer below: ``dy_prev`` (bf16, through the previous ReLU gate) plus
    the previous BN's global sums. When ``vec_prev is None`` this is the
    first layer: ``a_prev`` is the raw block input and the pass emits
    ``dg`` (f32) with no sums.

    Returns ``(dy_prev|dg, dw [Cin,Cout] f32, db [1,Cout] f32,
    s_prev [2,Cin] f32 | None)``.
    """
    m, cout = dy.shape
    cin = a_prev.shape[1]
    if not tm:
        tm = pass_tile(m, 1, 12 * cout + 8 * cin, of_k=False)
    grid = (m // tm,)
    first = vec_prev is None
    in_specs = [
        pl.BlockSpec((tm, cout), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, cout), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, cin), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
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
            _bwd_layer_kernel, first_layer=first, m_total=m_total,
            sdtype=sdtype,
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
