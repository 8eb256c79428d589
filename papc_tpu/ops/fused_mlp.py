"""Fused grouped MLP+BN+ReLU+max block — the PointNet++ SA hot path.

Orchestrates the Pallas linear-pass kernels in
:mod:`papc_tpu.ops.pallas.samlp` behind one differentiable function,
with a numerics-mirroring pure-jnp twin (``impl='jnp'``) used as the
test oracle. See the kernel module docstring for the design; the short
version: the op-by-op XLA program materializes every BN pre-activation,
stats pass, and normalized copy to HBM (~15 GB/step for PointNet++ SSG
at B=32/N=1024 — measured at its own 18 ms HBM roofline in round 3),
while these passes keep each tile's layer chain in VMEM and store only
bf16 pre-activations between launches.

Gradient semantics: the custom VJP implements the analytic BatchNorm
backward (batch statistics treated as functions of the input, exactly
like autodiff of ``flax.linen.BatchNorm``); the max-over-K backward
routes the cotangent to the FIRST argmax element (XLA's ``jnp.max`` VJP
splits evenly among exact ties — ties are measure-zero for real
activations except all-negative groups, where both conventions yield
zero through the ReLU gate). The batch mean/var outputs carry no
gradient (they only feed the stop-gradient running-stat update, as in
flax). Intermediate activations are stored bfloat16; statistics and
accumulators are fp32.

Reference parity: this computes the same function as
``PointNetSetAbstraction``'s Conv2D/BN/ReLU stack + max
(``pointnet2_basic_layers.py:194-221``) in channel-last layout.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax import lax

from papc_tpu.ops.pallas import samlp

_logger = logging.getLogger(__name__)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def supported(shape, features) -> bool:
    """Whether the fused kernels handle this workload: a 4-D grouped
    tensor ``[B, S, K, C]`` with enough rows to amortize the passes,
    a neighborhood K small enough that 8 K-groups fit one tile row
    block (Mosaic needs 8-row-aligned blocks), and a group count that
    8-aligns. ``group_all`` layers (K = N, S = 1, e.g. PointNet++'s
    SA3) fail the K bound and stay on the classic path — they are a
    plain matmul chain XLA already schedules well."""
    if len(shape) != 4 or len(features) < 1:
        return False
    b, s, k, _ = shape
    return b * s * k >= 4096 and k <= 128 and (b * s) % 8 == 0


# Test/experiment override: ``with override(enable=True, impl='jnp')``
# forces the fused path on any backend (layers.PointMLP consults
# :func:`enabled` / :func:`call_opts`). ``enable=None`` = default gate.
# ``transposed_group`` gates SetAbstraction's channel-sublane grouping
# (None = auto: on for TPU; False forces the row path for A/Bs).
_OVERRIDE = {"enable": None, "impl": "pallas", "interpret": False,
             "mode": "stream", "transposed_group": None}


class override:
    def __init__(self, enable=None, impl="pallas", interpret=False,
                 mode="stream", transposed_group=None):
        self._new = {"enable": enable, "impl": impl,
                     "interpret": interpret, "mode": mode,
                     "transposed_group": transposed_group}

    def __enter__(self):
        self._old = dict(_OVERRIDE)
        _OVERRIDE.update(self._new)
        return self

    def __exit__(self, *exc):
        _OVERRIDE.update(self._old)


def override_enabled() -> bool:
    """True only when an :class:`override` explicitly forces the fused
    path on. Call sites where fused was MEASURED slower (the PFN last
    layer: r4 interleaved A/B, fused 41.7 vs classic 32.5 ms/step fp32)
    gate on this so the default is classic but A/Bs stay one
    ``override(enable=True)`` away."""
    return bool(_OVERRIDE["enable"])


def enabled(shape, features) -> bool:
    """The PointMLP dispatch gate (honors :class:`override`).

    Default ON for the TPU backend: interleaved on-chip A/B (round 3,
    4 alternating rounds) measured the full SSG train step at
    14.0 ms fused vs 16.7 ms classic — inside the whole program the
    fused passes beat XLA's op-by-op schedule even where the isolated
    micro-bench is a wash (SA2) or behind (SA1).
    """
    if _OVERRIDE["enable"] is not None:
        return bool(_OVERRIDE["enable"]) and supported(shape, features)
    return supported(shape, features) and jax.default_backend() == "tpu"


def enabled_t(shape, k: int, features) -> bool:
    """Dispatch gate for the channel-sublane path (``[B, C0, M]``
    input, ``fused_mlp_max_t``) — same shape conditions as
    :func:`enabled` expressed on the transposed layout, same override
    semantics (plus the ``transposed_group`` kill switch)."""
    if _OVERRIDE["transposed_group"] is False:
        return False
    if len(shape) != 3 or len(features) < 1 or k < 1:
        return False
    b, c0, mm = shape
    if mm % k:
        return False
    ok = b * mm >= 4096 and k <= 128 and (b * mm // k) % 8 == 0
    if _OVERRIDE["enable"] is not None:
        return bool(_OVERRIDE["enable"]) and ok
    return ok and jax.default_backend() == "tpu"


def effective_mode(mode: str, m: int, k: int, c0: int,
                   widths) -> str:
    """The fused mode actually used for one layer stack.

    ``recompute1`` (single-launch passes) holds a whole 8*k-row chunk
    of the f32 chain in scoped VMEM — group_all-shaped stacks (k=128,
    wide channels, e.g. SSG SA3) need ~27 MB against the 16 MB limit
    and demote to ``stream`` per-layer. A/B harnesses should query this
    to report which stacks actually ran the labeled mode."""
    if mode == "recompute1":
        from papc_tpu.ops.pallas import samlp_single

        if not samlp_single.fits(m, k, c0, list(widths)):
            return "stream"
    return mode


def call_opts() -> dict:
    """impl/interpret kwargs for :func:`fused_mlp_max` (override-aware)."""
    return {"impl": _OVERRIDE["impl"],
            "interpret": _OVERRIDE["interpret"],
            "mode": _OVERRIDE["mode"]}


def _bn_vectors(sums, gamma, beta, m, eps):
    """Per-layer BN affine from accumulated (Σa, Σa²): returns
    ``vec [4, C] = (scale, shift, mean, inv_std)`` and (mean, var)
    with flax's biased fast variance, clipped at 0."""
    mean = sums[0] / m
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    inv_std = lax.rsqrt(var + eps)
    scale = gamma.astype(_F32) * inv_std
    shift = beta.astype(_F32) - mean * scale
    return jnp.stack([scale, shift, mean, inv_std]), (mean, var)


# ---------------------------------------------------------------- twins
# jnp functions mirroring each kernel's arithmetic exactly (bf16
# storage, f32 accumulation) — the oracle the Pallas passes are tested
# against, and the reference for what the kernels compute.

def _dot(x, w, sdtype=_BF16):
    """Twin of the kernels' matmul: bf16-input dots when the storage
    dtype is bf16 (mirrors the Pallas arithmetic and the MXU's DEFAULT
    precision); true-f32 dots when ``sdtype`` is f32 (used by tests to
    isolate backward-math correctness from matmul precision)."""
    d = _BF16 if sdtype == _BF16 else _F32
    return lax.dot_general(
        x.astype(d), w.astype(d),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _jnp_linear_stats(x, vec, w, b, *, sdtype=_BF16,
                      transposed=False):
    xf = x.astype(_F32)
    if transposed:
        xf = xf.T  # [Cin, M] channel-sublane input → row layout
    if vec is not None:
        xf = jnp.maximum(xf * vec[0] + vec[1], 0.0)
    a = _dot(xf, w, sdtype) + b.astype(_F32)
    sums = jnp.stack([jnp.sum(a, axis=0), jnp.sum(a * a, axis=0)])
    return a.astype(sdtype), sums


def _jnp_finalize_max(a, vec, *, k):
    m, c = a.shape
    h = jnp.maximum(a.astype(_F32) * vec[0] + vec[1], 0.0)
    h = h.reshape(m // k, k, c)
    mx = jnp.max(h, axis=1)
    kio = lax.broadcasted_iota(jnp.int32, (m // k, k, c), 1)
    amax = jnp.min(jnp.where(h == mx[:, None, :], kio, k), axis=1)
    return mx, amax.astype(jnp.int32)


def _jnp_eval_mlp_max(x, vecs, ws, bs, *, k):
    xf = x.astype(_F32)
    for vec, w, b in zip(vecs, ws, bs):
        a = _dot(xf, w, x.dtype) + b.astype(_F32)
        xf = jnp.maximum(a * vec[0] + vec[1], 0.0)
    m, c = xf.shape
    return jnp.max(xf.reshape(m // k, k, c), axis=1)


def _jnp_bwd_seed(a, vec, dout, amax, *, k, sdtype=_BF16):
    m, c = a.shape
    af = a.astype(_F32)
    o = af * vec[0] + vec[1]
    kio = lax.broadcasted_iota(jnp.int32, (m // k, k, c), 1)
    dh = jnp.where(
        kio == amax[:, None, :], dout.astype(_F32)[:, None, :], 0.0
    ).reshape(m, c)
    dy = jnp.where(o > 0, dh, 0.0)
    xhat = (af - vec[2]) * vec[3]
    s = jnp.stack([jnp.sum(dy, axis=0), jnp.sum(dy * xhat, axis=0)])
    return dy.astype(sdtype), s


def _jnp_bwd_layer(dy, a, a_prev, w, vec, s_in, vec_prev, *,
                   sdtype=_BF16, transposed=False):
    m = dy.shape[0]
    dyf = dy.astype(_F32)
    af = a.astype(_F32)
    xhat = (af - vec[2]) * vec[3]
    da = vec[0] * (dyf - s_in[0] / m - xhat * s_in[1] / m)
    apf = a_prev.astype(_F32)
    if transposed:
        apf = apf.T  # [Cin, M] block input → row layout
    if vec_prev is None:
        h_prev = apf
    else:
        h_prev = jnp.maximum(apf * vec_prev[0] + vec_prev[1], 0.0)
    d = _BF16 if sdtype == _BF16 else _F32
    dab = da.astype(d)
    dw = lax.dot_general(
        h_prev.astype(d), dab,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )
    db = jnp.sum(da, axis=0, keepdims=True)
    dhp = lax.dot_general(
        dab, w.astype(d),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )
    if vec_prev is None:
        return (dhp.T if transposed else dhp), dw, db, None
    op = apf * vec_prev[0] + vec_prev[1]
    dyp = jnp.where(op > 0, dhp, 0.0)
    xhatp = (apf - vec_prev[2]) * vec_prev[3]
    s = jnp.stack(
        [jnp.sum(dyp, axis=0), jnp.sum(dyp * xhatp, axis=0)]
    )
    return dyp.astype(sdtype), dw, db, s


# ---------------------------------------------------------- orchestration

def _fwd_passes(g2, params, *, k, eps, tm, impl, sdtype, interpret,
                transposed=False):
    """Training forward: linear+stats pass per layer, finalize+max.

    ``transposed``: ``g2`` is the channel-sublane ``[C0, M]`` block
    input (only the first pass touches it; later layers stay row
    layout). Returns ``(out2 [M//k, C_last] f32, batch (means, vars)
    per layer, residuals)``.
    """
    m = g2.shape[1] if transposed else g2.shape[0]
    a_list, vec_list, stats = [], [], []
    x = g2
    vec2 = None  # [2, C] (scale, shift) of the previous layer
    first = True
    for w, b, gamma, beta in params:
        xt = transposed and first
        if impl == "pallas":
            a, sums = samlp.linear_stats(
                x, vec2, w, b, tm=tm, sdtype=sdtype, transposed=xt,
                interpret=interpret,
            )
        else:
            a, sums = _jnp_linear_stats(
                x, vec2, w, b, sdtype=sdtype, transposed=xt
            )
        first = False
        vec4, (mean, var) = _bn_vectors(sums, gamma, beta, m, eps)
        a_list.append(a)
        vec_list.append(vec4)
        stats.append((mean, var))
        x = a
        vec2 = vec4[:2]
    if impl == "pallas":
        out2, amax = samlp.finalize_max(
            a_list[-1], vec_list[-1][:2], k=k, tm=tm, interpret=interpret
        )
    else:
        out2, amax = _jnp_finalize_max(a_list[-1], vec_list[-1][:2], k=k)
    ws = tuple(p[0] for p in params)
    res = (g2, tuple(a_list), tuple(vec_list), amax, ws)
    return out2, tuple(stats), res


def _bwd_passes(res, dout2, *, k, tm, impl, sdtype, interpret,
                transposed=False):
    """Training backward: seed pass + one pass per layer, walking down.

    Returns ``(dg2 [M, C0] f32 — [C0, M] when ``transposed`` — and
    per-layer (dW, db, dgamma, dbeta))``.
    """
    g2, a_list, vec_list, amax, ws = res
    n = len(a_list)
    if impl == "pallas":
        dy, s = samlp.bwd_seed(
            a_list[-1], vec_list[-1], dout2, amax, k=k, tm=tm,
            sdtype=sdtype, interpret=interpret,
        )
    else:
        dy, s = _jnp_bwd_seed(
            a_list[-1], vec_list[-1], dout2, amax, k=k, sdtype=sdtype
        )
    grads = [None] * n
    for i in range(n - 1, -1, -1):
        a_prev = a_list[i - 1] if i > 0 else g2
        vec_prev = vec_list[i - 1] if i > 0 else None
        xt = transposed and i == 0
        dgamma, dbeta = s[1], s[0]
        if impl == "pallas":
            dy_prev, dw, db, s_prev = samlp.bwd_layer(
                dy, a_list[i], a_prev, ws[i], vec_list[i], s,
                vec_prev, tm=tm, sdtype=sdtype, transposed=xt,
                interpret=interpret,
            )
        else:
            dy_prev, dw, db, s_prev = _jnp_bwd_layer(
                dy, a_list[i], a_prev, ws[i], vec_list[i], s, vec_prev,
                sdtype=sdtype, transposed=xt,
            )
        grads[i] = (dw, db.reshape(-1), dgamma, dbeta)
        dy, s = dy_prev, s_prev
    return dy, tuple(grads)


@functools.lru_cache(maxsize=None)
def _make_core(n_layers, k, tm, eps, impl, sdtype, interpret,
               mode="stream", transposed=False):
    """Build the custom-VJP training core for a static config.

    ``mode='stream'``: v1 linear passes over stored bf16 activations.
    ``mode='recompute'``: v2 passes that re-derive the chain from the
    block input each pass (flash-attention-style; far less HBM
    traffic, ~L x more MXU work). ``transposed``: the block input (and
    its gradient) is channel-sublane ``[C0, M]`` — stream mode only
    (``fused_mlp_max_t`` demotes recompute).
    """
    assert not (transposed and mode.startswith("recompute"))

    def fwd(g2, params):
        if mode.startswith("recompute"):
            return _fwd_recompute(
                g2, params, k=k, eps=eps, impl=impl, sdtype=sdtype,
                interpret=interpret, single=mode == "recompute1",
            )
        return _fwd_passes(
            g2, params, k=k, eps=eps, tm=tm, impl=impl, sdtype=sdtype,
            interpret=interpret, transposed=transposed,
        )

    def bwd(res, dout2):
        if mode.startswith("recompute"):
            return _bwd_recompute(
                res, dout2, k=k, impl=impl, sdtype=sdtype,
                interpret=interpret, single=mode == "recompute1",
            )
        return _bwd_passes(
            res, dout2, k=k, tm=tm, impl=impl, sdtype=sdtype,
            interpret=interpret, transposed=transposed,
        )

    @jax.custom_vjp
    def core(g2, params):
        out2, stats, _ = fwd(g2, params)
        return out2, stats

    def core_fwd(g2, params):
        out2, stats, res = fwd(g2, params)
        return (out2, stats), (res, tuple(jax.tree.map(jnp.shape, params)))

    def core_bwd(saved, cts):
        res, _ = saved
        dout2, _ = cts  # batch mean/var outputs are stop-grad (flax ra)
        dg2, layer_grads = bwd(res, dout2)
        ws = res[3] if mode.startswith("recompute") else res[4]
        dparams = tuple(
            (
                dw.astype(ws[i].dtype),
                db.astype(ws[i].dtype),
                dgamma.astype(ws[i].dtype),
                dbeta.astype(ws[i].dtype),
            )
            for i, (dw, db, dgamma, dbeta) in enumerate(layer_grads)
        )
        return dg2, dparams

    core.defvjp(core_fwd, core_bwd)
    return core


def fused_mlp_max(
    grouped: jax.Array,
    params,
    running,
    *,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-5,
    impl: str = "pallas",
    interpret: bool = False,
    sdtype=None,
    mode: str = "stream",
):
    """Fused Dense→BN→ReLU stack + max over the K axis.

    Args:
      grouped: ``[B, S, K, C0]`` neighborhoods.
      params: per-layer tuples ``(W [Cin,Cout], b, gamma, beta)``.
      running: per-layer ``(mean, var)`` running statistics (f32).
      train: batch-stats mode (returns updated running stats);
        eval mode normalizes with ``running`` in a single fused pass.

    Returns:
      ``(out [B, S, C_last], new_running)`` — ``new_running is running``
      in eval mode.
    """
    b, s, k, c0 = grouped.shape
    m = b * s * k
    # inter-pass activations always bf16 in production: the MXU
    # consumes bf16 at DEFAULT matmul precision regardless, stats
    # accumulate in f32 BEFORE the rounding, and f32 storage would
    # double HBM traffic. (Tests pass sdtype=f32 with impl='jnp' to
    # isolate backward math from matmul precision.)
    if sdtype is None:
        sdtype = _BF16
    g2 = grouped.reshape(m, c0).astype(sdtype)
    tm = 0  # per-pass VMEM-aware auto-tiling (samlp.pass_tile)
    if not train:
        vecs = []
        for (w, bb, gamma, beta), (mean, var) in zip(params, running):
            inv_std = lax.rsqrt(var.astype(_F32) + eps)
            scale = gamma.astype(_F32) * inv_std
            shift = beta.astype(_F32) - mean.astype(_F32) * scale
            vecs.append(jnp.stack([scale, shift]))
        ws = [p[0] for p in params]
        bs = [p[1] for p in params]
        if impl == "pallas":
            out2 = samlp.eval_mlp_max(
                g2, vecs, ws, bs, k=k, tm=tm, interpret=interpret
            )
        else:
            out2 = _jnp_eval_mlp_max(g2, vecs, ws, bs, k=k)
        out = out2.reshape(b, s, -1).astype(grouped.dtype)
        return out, running
    if mode == "recompute1":
        widths = [p[0].shape[1] for p in params]
        eff = effective_mode(mode, m, k, c0, widths)
        if eff != mode:
            _logger.warning(
                "fused_mlp: recompute1 demoted to stream for layer "
                "stack m=%d k=%d c0=%d widths=%s (fails samlp_single."
                "fits) — A/Bs labeled recompute1 run stream for this "
                "stack", m, k, c0, widths,
            )
        mode = eff
    core = _make_core(
        len(params), k, tm, float(eps), impl, sdtype, interpret, mode
    )
    out2, stats = core(g2, tuple(tuple(p) for p in params))
    new_running = tuple(
        (
            momentum * rm + (1.0 - momentum) * lax.stop_gradient(mean),
            momentum * rv + (1.0 - momentum) * lax.stop_gradient(var),
        )
        for (rm, rv), (mean, var) in zip(running, stats)
    )
    out = out2.reshape(b, s, -1).astype(grouped.dtype)
    return out, new_running


def fused_mlp_max_t(
    grouped_t: jax.Array,
    params,
    running,
    *,
    k: int,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-5,
    impl: str = "pallas",
    interpret: bool = False,
    sdtype=None,
    mode: str = "stream",
):
    """Channel-sublane twin of :func:`fused_mlp_max`.

    Args:
      grouped_t: ``[B, C0, S·K]`` neighborhoods in the gather_t layout
        (C on sublanes — narrow C pads 8 sublanes, not 128 lanes; the
        layout ``ops.pallas.gather_t.gather_cols`` produces and whose
        gradient ``scatter_cols_add_pallas`` consumes). Only the first
        MLP layer touches this layout (its dot contracts C in the
        MXU-native lhsT form); every later pass is identical to
        :func:`fused_mlp_max`, so outputs, BN statistics, and parameter
        gradients match the row path to matmul-rounding.
      k: neighborhood size (the max-pool group width).

    Returns ``(out [B, S, C_last], new_running)``.

    Recompute modes are row-layout only and demote to ``stream`` here
    (they exist as A/B alternatives; the transposed path IS the
    measured winner at the narrow-C stacks this targets).
    """
    b, c0, mm = grouped_t.shape
    m = b * mm
    if sdtype is None:
        sdtype = _BF16
    # [B, C0, M] → [C0, B·M]: the global row order matches the row
    # path's reshape(b*s*k, c0) — batch-major, then (s, k) — so sums,
    # max groups, and outputs align element-for-element
    g2t = (
        grouped_t.transpose(1, 0, 2).reshape(c0, m).astype(sdtype)
    )
    tm = 0
    if not train:
        vecs = []
        for (w, bb, gamma, beta), (mean, var) in zip(params, running):
            inv_std = lax.rsqrt(var.astype(_F32) + eps)
            scale = gamma.astype(_F32) * inv_std
            shift = beta.astype(_F32) - mean.astype(_F32) * scale
            vecs.append(jnp.stack([scale, shift]))
        ws = [p[0] for p in params]
        bs = [p[1] for p in params]
        if impl == "pallas":
            out2 = samlp.eval_mlp_max(
                g2t, vecs, ws, bs, k=k, tm=tm, transposed=True,
                interpret=interpret,
            )
        else:
            out2 = _jnp_eval_mlp_max(g2t.T, vecs, ws, bs, k=k)
        out = out2.reshape(b, mm // k, -1).astype(grouped_t.dtype)
        return out, running
    if mode.startswith("recompute"):
        mode = "stream"
    core = _make_core(
        len(params), k, tm, float(eps), impl, sdtype, interpret, mode,
        transposed=True,
    )
    out2, stats = core(g2t, tuple(tuple(p) for p in params))
    new_running = tuple(
        (
            momentum * rm + (1.0 - momentum) * lax.stop_gradient(mean),
            momentum * rv + (1.0 - momentum) * lax.stop_gradient(var),
        )
        for (rm, rv), (mean, var) in zip(running, stats)
    )
    out = out2.reshape(b, mm // k, -1).astype(grouped_t.dtype)
    return out, new_running


# ------------------------------------------- v2 twins (recompute mode)
# jnp mirrors of the samlp recompute passes: every pass re-derives the
# layer chain from g2 in f32 (bf16-input dots) instead of reading
# stored activations. See the kernel module for the traffic argument.

def _jnp_chain(g2, vecs2, ws, bs, upto, *, sdtype=_BF16):
    x = g2.astype(_F32)
    a_list, h_list = [], []
    h = x
    for i in range(upto):
        a = _dot(h, ws[i], sdtype) + bs[i].astype(_F32)
        a_list.append(a)
        if i < upto - 1:
            h = jnp.maximum(a * vecs2[i][0] + vecs2[i][1], 0.0)
            h_list.append(h)
    return a_list, h_list


def _jnp_rc_stats(g2, vecs2, ws, bs, *, upto, sdtype=_BF16):
    a_list, _ = _jnp_chain(g2, vecs2, ws, bs, upto, sdtype=sdtype)
    a = a_list[-1]
    return jnp.stack([jnp.sum(a, axis=0), jnp.sum(a * a, axis=0)])


def _jnp_rc_final(g2, vecs2, ws, bs, *, k, with_amax=True,
                  sdtype=_BF16):
    n = len(ws)
    a_list, _ = _jnp_chain(g2, vecs2, ws, bs, n, sdtype=sdtype)
    h = jnp.maximum(a_list[-1] * vecs2[-1][0] + vecs2[-1][1], 0.0)
    m, c = h.shape
    h3 = h.reshape(m // k, k, c)
    mx = jnp.max(h3, axis=1)
    if not with_amax:
        return mx, None
    kio = lax.broadcasted_iota(jnp.int32, (m // k, k, c), 1)
    amax = jnp.min(jnp.where(h3 == mx[:, None, :], kio, k), axis=1)
    return mx, amax.astype(jnp.int32)


def _jnp_chain_bwd(a_list, dout, amax, vecs4, ws, mus, *, k, level,
                   sdtype=_BF16):
    n = len(ws)
    vecL = vecs4[n - 1]
    aL = a_list[n - 1]
    o = aL * vecL[0] + vecL[1]
    m, c = aL.shape
    kio = lax.broadcasted_iota(jnp.int32, (m // k, k, c), 1)
    dh = jnp.where(
        kio == amax[:, None, :], dout.astype(_F32)[:, None, :], 0.0
    ).reshape(m, c)
    dy = jnp.where(o > 0, dh, 0.0)
    d = _BF16 if sdtype == _BF16 else _F32
    da_map = {}
    for j in range(n, level, -1):
        vj = vecs4[j - 1]
        xhat = (a_list[j - 1] - vj[2]) * vj[3]
        da = vj[0] * (dy - mus[j - 1][0] - xhat * mus[j - 1][1])
        da_map[j] = da
        dhp = lax.dot_general(
            da.astype(d), ws[j - 1].astype(d),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_F32,
        )
        if j - 1 >= 1:
            vp = vecs4[j - 2]
            op = a_list[j - 2] * vp[0] + vp[1]
            dy = jnp.where(op > 0, dhp, 0.0)
        else:
            dy = dhp
    return dy, da_map


def _jnp_rc_bwd_stats(g2, dout, amax, vecs4, ws, bs, mus, *, level, k,
                      sdtype=_BF16):
    n = len(ws)
    a_list, _ = _jnp_chain(
        g2, [v[:2] for v in vecs4], ws, bs, n, sdtype=sdtype
    )
    dy, _ = _jnp_chain_bwd(
        a_list, dout, amax, vecs4, ws, mus, k=k, level=level,
        sdtype=sdtype,
    )
    vl = vecs4[level - 1]
    xhat = (a_list[level - 1] - vl[2]) * vl[3]
    return jnp.stack(
        [jnp.sum(dy, axis=0), jnp.sum(dy * xhat, axis=0)]
    )


def _jnp_rc_bwd_final(g2, dout, amax, vecs4, ws, bs, mus, *, k,
                      sdtype=_BF16):
    n = len(ws)
    g = g2.astype(_F32)
    a_list, h_list = _jnp_chain(
        g2, [v[:2] for v in vecs4], ws, bs, n, sdtype=sdtype
    )
    dy, da_map = _jnp_chain_bwd(
        a_list, dout, amax, vecs4, ws, mus, k=k, level=0,
        sdtype=sdtype,
    )
    d = _BF16 if sdtype == _BF16 else _F32
    h_prev = [g] + h_list
    dws, dbs = [], []
    for j in range(1, n + 1):
        da = da_map[j]
        dws.append(
            lax.dot_general(
                h_prev[j - 1].astype(d), da.astype(d),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_F32,
            )
        )
        dbs.append(jnp.sum(da, axis=0, keepdims=True))
    return dy, tuple(dws), tuple(dbs)


# -------------------------------------- v2 orchestration (recompute)

def _rc_module(single):
    from papc_tpu.ops.pallas import samlp_single

    return samlp_single if single else samlp


def _fwd_recompute(g2, params, *, k, eps, impl, sdtype, interpret,
                   single=False):
    m = g2.shape[0]
    mod = _rc_module(single)
    ws = tuple(p[0] for p in params)
    bs = tuple(p[1] for p in params)
    vecs, stats = [], []
    for l in range(1, len(params) + 1):
        vecs2 = [v[:2] for v in vecs]
        if impl == "pallas":
            sums = mod.recompute_stats(
                g2, vecs2, ws, bs, upto=l, interpret=interpret
            )
        else:
            sums = _jnp_rc_stats(
                g2, vecs2, ws, bs, upto=l, sdtype=sdtype
            )
        gamma, beta = params[l - 1][2], params[l - 1][3]
        vec4, (mean, var) = _bn_vectors(sums, gamma, beta, m, eps)
        vecs.append(vec4)
        stats.append((mean, var))
    vecs2 = [v[:2] for v in vecs]
    if impl == "pallas":
        out2, amax = mod.recompute_final_max(
            g2, vecs2, ws, bs, k=k, interpret=interpret
        )
    else:
        out2, amax = _jnp_rc_final(
            g2, vecs2, ws, bs, k=k, sdtype=sdtype
        )
    res = (g2, tuple(vecs), amax, ws, bs)
    return out2, tuple(stats), res


def _bwd_recompute(res, dout2, *, k, impl, sdtype, interpret,
                   single=False):
    g2, vecs, amax, ws, bs = res
    mod = _rc_module(single)
    m = g2.shape[0]
    n = len(ws)
    mus = [None] * n
    s_list = [None] * n
    for level in range(n, 0, -1):
        if impl == "pallas":
            s = mod.recompute_bwd_stats(
                g2, dout2, amax, vecs, ws, bs, mus, level=level, k=k,
                interpret=interpret,
            )
        else:
            s = _jnp_rc_bwd_stats(
                g2, dout2, amax, vecs, ws, bs, mus, level=level, k=k,
                sdtype=sdtype,
            )
        s_list[level - 1] = s
        mus[level - 1] = s / m
    if impl == "pallas":
        dg2, dws, dbs = mod.recompute_bwd_final(
            g2, dout2, amax, vecs, ws, bs, mus, k=k,
            interpret=interpret,
        )
    else:
        dg2, dws, dbs = _jnp_rc_bwd_final(
            g2, dout2, amax, vecs, ws, bs, mus, k=k, sdtype=sdtype
        )
    grads = tuple(
        (dws[i], dbs[i].reshape(-1), s_list[i][1], s_list[i][0])
        for i in range(n)
    )
    return dg2, grads
