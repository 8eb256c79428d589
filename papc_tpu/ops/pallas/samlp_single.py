"""Single-launch SA-MLP recompute passes: in-kernel DMA pipelining.

The grid-based passes in :mod:`papc_tpu.ops.pallas.samlp` pay Mosaic's
per-grid-step overhead (~6 us: block bookkeeping + a DMA setup per
operand block, constants included) on every step — at SA shapes that
is ~2000 steps x 6 us ≈ the entire measured pass time, which is why
cutting HBM traffic 50x (recompute vs stream mode) measured EQUAL on
chip. These variants run each pass as ONE kernel invocation: constants
(weights, BN vectors, biases) land in VMEM once, and the kernel itself
streams row chunks of the big operands with double-buffered
``make_async_copy`` (pallas guide "Double Buffering" pattern),
accumulating across chunks in registers.

Same arithmetic as the grid recompute passes (bitwise in interpret
mode): f32 in-register chains, bf16-input dots, analytic BN backward.

HBM-stream alignment (real-Mosaic rule interpret mode does NOT model):
a ``memref_slice`` of an HBM operand must be 128-lane aligned in its
last dim, and the physical buffer is lane-padded — so streaming a
logical ``[M, 3]`` input fails with "Slice shape along dimension 1
must be aligned to tiling (128)". The public wrappers therefore
zero-pad every HBM-streamed operand to 128-wide multiples: the chain
input side (``g2`` cols + ``ws[0]`` rows — zero rows keep ``x@w``
exact) and, when the last layer is narrow, its output side (``ws[-1]``
cols, bias/BN-vec/mu cols, ``dout``/``amax`` cols — zero scale/shift
makes the padded activations 0 and zero ``dout`` kills their grads).
Padded outputs are sliced back before returning. VMEM-whole operands
(weights, stats outputs) need no padding.
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


def _choose_chunk(m, k, cols, budget=10 * 1024 * 1024,
                  target=4096):
    """Rows per in-kernel chunk: double-buffered input scratch + the
    live f32 chain must fit ``budget`` of scoped VMEM.

    ``cols`` lists the f32 column count of every per-row value live in
    the kernel (the input counted twice for its double buffer, each
    chain value once). What actually costs VMEM is the LANE-PADDED
    width: a ``[ch, 6]`` f32 block occupies ``ch*128*4`` bytes, so
    every count rounds up to 128 before summing. Chunk is a multiple
    of ``8*k`` (output blocks and max groups stay 8-row aligned) and
    divides ``m``."""
    bytes_per_row = 4 * sum(-(-c // 128) * 128 for c in cols)
    step = 8 * max(k, 1)
    cap = max(step, budget // max(1, bytes_per_row))
    t = min(target, cap)
    ch = max(step, (t // step) * step)
    while ch > step and m % ch:
        ch -= step
    if m % ch:
        # the in-kernel loop runs m // ch chunks: a non-dividing chunk
        # would silently drop tail rows from the accumulated stats and
        # leave their output groups uninitialized
        raise ValueError(
            f"_choose_chunk: no 8*k-aligned chunk divides m={m} "
            f"(k={k}) — callers must pass 8-row-aligned group counts"
        )
    return ch


def fits(m, k, c0, a_w, budget: int = 12 * 1024 * 1024) -> bool:
    """Whether the single-launch passes' MINIMUM chunk (8*k rows — the
    output/max-group alignment floor) plus their VMEM-resident
    constants fit the 16 MB scoped-VMEM limit with margin.

    Sized for the worst pass (``recompute_bwd_final``): per chunk row
    the double-buffered input, the full f32 chain, the cotangent walk
    and the double-buffered dg2 output are live, and the weights, their
    f32 grad accumulators and the grad outputs are resident. Everything
    is counted at lane-padded (128) width like :func:`_choose_chunk`.
    """
    if m % (8 * max(k, 1)):
        # _choose_chunk requires an 8*k-aligned chunk dividing m; gate
        # here so callers demote to stream instead of tracing into a
        # ValueError
        return False
    c0p = -(-c0 // 128) * 128
    a_p = [-(-c // 128) * 128 for c in a_w]
    c_last = a_p[-1]
    cols = ([c0p] * 5 + a_p + a_p[:-1] + [c_last] * 2
            + [8 * c_last // max(k, 1)])
    # identical lane-padding rule to _choose_chunk so the gate and the
    # chunk chooser can never disagree on per-row bytes
    bytes_per_row = 4 * sum(-(-c // 128) * 128 for c in cols)
    w_bytes = 4 * sum(
        (c0p if i == 0 else a_p[i - 1]) * a_p[i]
        for i in range(len(a_p))
    )
    return budget - 3 * w_bytes >= 8 * max(k, 1) * bytes_per_row


def _pad_cols(x, to: int = 128):
    """Zero-pad the last dim up to a multiple of ``to`` (lane width)."""
    pad = (-x.shape[-1]) % to
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _pad_input_side(g2, ws):
    """Lane-align the streamed chain input: pad ``g2`` cols and
    ``ws[0]`` rows with zeros (``x_pad @ w0_pad == x @ w0`` exactly)."""
    g2 = _pad_cols(g2)
    ws = list(ws)
    if ws[0].shape[0] != g2.shape[1]:
        ws[0] = jnp.pad(
            ws[0], ((0, g2.shape[1] - ws[0].shape[0]), (0, 0))
        )
    return g2, ws


def _pad_output_side(vecs, ws, bs, mus=None):
    """Lane-align the streamed last-layer side when it is narrow: pad
    ``ws[-1]`` cols, its bias/BN-vec/mu cols with zeros — the padded
    activations are ``max(0*a+0, 0) = 0`` and padded ``dout`` cols are
    zero, so the extra lanes carry exact zeros through fwd and bwd."""
    vecs, ws, bs = list(vecs), list(ws), list(bs)
    ws[-1] = _pad_cols(ws[-1])
    bs[-1] = _pad_cols(bs[-1])
    if vecs:
        vecs[-1] = _pad_cols(vecs[-1])
    if mus is not None:
        mus = list(mus)
        if mus[-1] is not None:
            mus[-1] = _pad_cols(mus[-1])
    return vecs, ws, bs, mus


def _pipe(hbm_ref, scratch, sem, ch, n_chunks):
    """Input stream: double-buffered chunk loader over axis 0."""

    def get(slot, i):
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(i * ch, ch)], scratch.at[slot],
            sem.at[slot],
        )

    return get


def _chain(x, vec_list, w_refs, b_refs, upto):
    """f32 chain from x: returns (a_list, h_list) like samlp._chain_fwd."""
    a_list, h_list = [], []
    h = x
    for i in range(upto):
        a = jnp.dot(
            h.astype(_BF16), w_refs[i][:].astype(_BF16),
            preferred_element_type=_F32,
        ) + b_refs[i][0, :]
        a_list.append(a)
        if i < upto - 1:
            v = vec_list[i]
            h = jnp.maximum(a * v[0, :] + v[1, :], 0.0)
            h_list.append(h)
    return a_list, h_list


def _const_specs(vecs, ws, bs, vec_rows):
    """VMEM specs + args for the per-layer constants."""
    specs, args = [], []
    for vec in vecs:
        c = vec.shape[-1]
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(vec[:vec_rows].astype(_F32))
    for w in ws:
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(w)
    for w, b in zip(ws, bs):
        c = w.shape[1]
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(b.reshape(1, c).astype(_F32))
    return specs, args


# ---------------------------------------------------------------- fwd

def _stats_kernel(*refs, upto, ch, n_chunks):
    g_hbm = refs[0]
    vec_refs = list(refs[1:upto])
    w_refs = list(refs[upto:2 * upto])
    b_refs = list(refs[2 * upto:3 * upto])
    s_ref = refs[3 * upto]
    g_buf, g_sem = refs[3 * upto + 1], refs[3 * upto + 2]
    get = _pipe(g_hbm, g_buf, g_sem, ch, n_chunks)
    get(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            get((i + 1) % 2, i + 1).start()

        get(slot, i).wait()
        x = g_buf[slot].astype(_F32)
        a_list, _ = _chain(x, vec_refs, w_refs, b_refs, upto)
        a = a_list[-1]
        return (acc[0] + jnp.sum(a, 0, keepdims=True),
                acc[1] + jnp.sum(a * a, 0, keepdims=True))

    c = w_refs[-1].shape[1]
    z = jnp.zeros((1, c), _F32)
    s1, s2 = lax.fori_loop(0, n_chunks, body, (z, z))
    s_ref[:] = jnp.concatenate([s1, s2], 0)


def recompute_stats(g2, vecs, ws, bs, *, upto, ch: int = 0,
                    interpret: bool = False):
    """Single-launch twin of ``samlp.recompute_stats``."""
    g2, ws = _pad_input_side(g2, ws)
    m, c0 = g2.shape
    a_w = [w.shape[1] for w in ws[:upto]]
    if not ch:
        # live per row: x + double-buffered input + a_i + h_i
        ch = _choose_chunk(m, 1, [c0] * 3 + a_w + a_w[:-1])
    n_chunks = m // ch
    cout = ws[upto - 1].shape[1]
    cspecs, cargs = _const_specs(vecs[:upto - 1], ws[:upto], bs[:upto],
                                 2)
    return pl.pallas_call(
        functools.partial(
            _stats_kernel, upto=upto, ch=ch, n_chunks=n_chunks
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + cspecs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, cout), _F32),
        scratch_shapes=[
            pltpu.VMEM((2, ch, c0), g2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g2, *cargs)


def _final_kernel(*refs, n, k, ch, n_chunks, with_amax):
    g_hbm = refs[0]
    vec_refs = list(refs[1:1 + n])
    w_refs = list(refs[1 + n:1 + 2 * n])
    b_refs = list(refs[1 + 2 * n:1 + 3 * n])
    out_hbm = refs[1 + 3 * n]
    amax_hbm = refs[2 + 3 * n] if with_amax else None
    sc = refs[(3 if with_amax else 2) + 3 * n:]
    if with_amax:
        g_buf, g_sem, o_buf, o_sem, x_buf, x_sem = sc
    else:
        g_buf, g_sem, o_buf, o_sem = sc
    get = _pipe(g_hbm, g_buf, g_sem, ch, n_chunks)
    ck = ch // k

    def put(slot, i):
        return pltpu.make_async_copy(
            o_buf.at[slot], out_hbm.at[pl.ds(i * ck, ck)],
            o_sem.at[slot],
        )

    def put_amax(slot, i):
        return pltpu.make_async_copy(
            x_buf.at[slot], amax_hbm.at[pl.ds(i * ck, ck)],
            x_sem.at[slot],
        )

    get(0, 0).start()

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            get((i + 1) % 2, i + 1).start()

        get(slot, i).wait()

        # the copy started 2 iterations ago reused this slot — drain it
        @pl.when(i >= 2)
        def _():
            put(slot, i - 2).wait()
            if with_amax:
                put_amax(slot, i - 2).wait()

        x = g_buf[slot].astype(_F32)
        a_list, _ = _chain(x, vec_refs, w_refs, b_refs, n)
        vL = vec_refs[n - 1]
        h = jnp.maximum(a_list[-1] * vL[0, :] + vL[1, :], 0.0)
        c = h.shape[1]
        h3 = h.reshape(ck, k, c)
        mx = jnp.max(h3, axis=1)
        o_buf[slot] = mx
        if with_amax:
            kio = lax.broadcasted_iota(jnp.int32, (ck, k, c), 1)
            x_buf[slot] = jnp.min(
                jnp.where(h3 == mx[:, None, :], kio, k), axis=1
            ).astype(jnp.int32)
        put(slot, i).start()
        if with_amax:
            put_amax(slot, i).start()
        return 0

    lax.fori_loop(0, n_chunks, body, 0)
    # drain the last (up to) two in-flight output copies
    for back in (2, 1):
        @pl.when(n_chunks >= back)
        def _(back=back):
            i = n_chunks - back
            put(i % 2, i).wait()
            if with_amax:
                put_amax(i % 2, i).wait()


def recompute_final_max(g2, vecs, ws, bs, *, k, ch: int = 0,
                        with_amax: bool = True,
                        interpret: bool = False):
    """Single-launch twin of ``samlp.recompute_final_max``."""
    g2, ws = _pad_input_side(g2, ws)
    c_true = ws[-1].shape[1]
    if c_true % 128:
        vecs, ws, bs, _ = _pad_output_side(vecs, ws, bs)
    m, c0 = g2.shape
    n = len(ws)
    c_last = ws[-1].shape[1]
    if not ch:
        a_w = [w.shape[1] for w in ws]
        # x + double buffer + a_i + h_i + final h; out/amax bufs are
        # ck = ch/k rows — count them at c_last/k per input row
        ch = _choose_chunk(
            m, k,
            [c0] * 3 + a_w + a_w[:-1]
            + [c_last, 4 * c_last // max(k, 1)],
        )
    n_chunks = m // ch
    ck = ch // k
    cspecs, cargs = _const_specs(vecs, ws, bs, 2)
    out_shape = [jax.ShapeDtypeStruct((m // k, c_last), _F32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((2, ch, c0), g2.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, ck, c_last), _F32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_amax:
        out_shape.append(
            jax.ShapeDtypeStruct((m // k, c_last), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((2, ck, c_last), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _final_kernel, n=n, k=k, ch=ch, n_chunks=n_chunks,
            with_amax=with_amax,
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + cspecs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(g2, *cargs)
    if c_true != c_last:  # slice the lane padding back off
        outs = tuple(o[:, :c_true] for o in outs)
    return outs if with_amax else (outs[0], None)


# ---------------------------------------------------------------- bwd

def _bwd_walk(a_list, dout, amax, vec_refs, w_refs, mu_refs, *, k,
              level, n):
    """Cotangent walk (same math as samlp._chain_bwd) on one chunk."""
    vL = vec_refs[n - 1]
    aL = a_list[n - 1]
    o = aL * vL[0, :] + vL[1, :]
    rows, c = aL.shape
    kio = lax.broadcasted_iota(jnp.int32, (rows // k, k, c), 1)
    dh = jnp.where(
        kio == amax[:, None, :], dout[:, None, :], 0.0
    ).reshape(rows, c)
    dy = jnp.where(o > 0, dh, 0.0)
    da_map = {}
    for j in range(n, level, -1):
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
            vp = vec_refs[j - 2]
            op = a_list[j - 2] * vp[0, :] + vp[1, :]
            dy = jnp.where(op > 0, dhp, 0.0)
        else:
            dy = dhp
    return dy, da_map


def _bwd_stats_kernel(*refs, n, k, level, ch, n_chunks):
    g_hbm, d_hbm, x_hbm = refs[0], refs[1], refs[2]
    base = 3
    vec_refs = list(refs[base:base + n])
    w_refs = list(refs[base + n:base + 2 * n])
    b_refs = list(refs[base + 2 * n:base + 3 * n])
    n_mu = n - level
    mu_list = list(refs[base + 3 * n:base + 3 * n + n_mu])
    s_ref = refs[base + 3 * n + n_mu]
    g_buf, g_sem, d_buf, d_sem, x_buf, x_sem = refs[
        base + 3 * n + n_mu + 1:]
    mu_refs = [None] * n
    for idx, j in enumerate(range(level + 1, n + 1)):
        mu_refs[j - 1] = mu_list[idx]
    ck = ch // k
    get_g = _pipe(g_hbm, g_buf, g_sem, ch, n_chunks)
    get_d = _pipe(d_hbm, d_buf, d_sem, ck, n_chunks)
    get_x = _pipe(x_hbm, x_buf, x_sem, ck, n_chunks)
    get_g(0, 0).start()
    get_d(0, 0).start()
    get_x(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            nxt = (i + 1) % 2
            get_g(nxt, i + 1).start()
            get_d(nxt, i + 1).start()
            get_x(nxt, i + 1).start()

        get_g(slot, i).wait()
        get_d(slot, i).wait()
        get_x(slot, i).wait()
        x = g_buf[slot].astype(_F32)
        a_list, _ = _chain(x, vec_refs, w_refs, b_refs, n)
        dy, _ = _bwd_walk(
            a_list, d_buf[slot], x_buf[slot], vec_refs, w_refs,
            mu_refs, k=k, level=level, n=n,
        )
        vl = vec_refs[level - 1]
        xhat = (a_list[level - 1] - vl[2, :]) * vl[3, :]
        return (acc[0] + jnp.sum(dy, 0, keepdims=True),
                acc[1] + jnp.sum(dy * xhat, 0, keepdims=True))

    c = w_refs[level - 1].shape[1]
    z = jnp.zeros((1, c), _F32)
    s1, s2 = lax.fori_loop(0, n_chunks, body, (z, z))
    s_ref[:] = jnp.concatenate([s1, s2], 0)


def _bwd_in_setup(g2, dout, amax, vecs, ws, bs, ch, k):
    m, c0 = g2.shape
    c_last = ws[-1].shape[1]
    ck = ch // k
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    args = [g2, dout.astype(_F32), amax]
    cspecs, cargs = _const_specs(vecs, ws, bs, 4)
    in_specs += cspecs
    args += cargs
    scratch = [
        pltpu.VMEM((2, ch, c0), g2.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, ck, c_last), _F32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((2, ck, c_last), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return in_specs, args, scratch


def recompute_bwd_stats(g2, dout, amax, vecs, ws, bs, mus, *, level, k,
                        ch: int = 0, interpret: bool = False):
    """Single-launch twin of ``samlp.recompute_bwd_stats``."""
    g2, ws = _pad_input_side(g2, ws)
    n = len(ws)
    c_true = ws[-1].shape[1]
    c_level_true = ws[level - 1].shape[1]
    if c_true % 128:
        vecs, ws, bs, mus = _pad_output_side(vecs, ws, bs, mus)
        dout = _pad_cols(dout)
        amax = _pad_cols(amax)
    m, c0 = g2.shape
    c_last = ws[-1].shape[1]
    if not ch:
        a_w = [w.shape[1] for w in ws]
        # fwd chain + dy/da walk values + the dout/amax chunk buffers
        # (ck = ch/k rows, counted per input row)
        ch = _choose_chunk(
            m, k,
            [c0] * 3 + a_w + a_w[:-1]
            + [c_last] * 2 + [8 * c_last // max(k, 1)],
        )
    n_chunks = m // ch
    in_specs, args, scratch = _bwd_in_setup(
        g2, dout, amax, vecs, ws, bs, ch, k
    )
    for j in range(level + 1, n + 1):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(mus[j - 1].astype(_F32))
    c_level = ws[level - 1].shape[1]
    out = pl.pallas_call(
        functools.partial(
            _bwd_stats_kernel, n=n, k=k, level=level, ch=ch,
            n_chunks=n_chunks,
        ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c_level), _F32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return out[:, :c_level_true]


def _bwd_final_kernel(*refs, n, k, ch, n_chunks):
    g_hbm, d_hbm, x_hbm = refs[0], refs[1], refs[2]
    base = 3
    vec_refs = list(refs[base:base + n])
    w_refs = list(refs[base + n:base + 2 * n])
    b_refs = list(refs[base + 2 * n:base + 3 * n])
    mu_list = list(refs[base + 3 * n:base + 4 * n])
    dg_hbm = refs[base + 4 * n]
    dw_refs = list(refs[base + 4 * n + 1:base + 5 * n + 1])
    db_refs = list(refs[base + 5 * n + 1:base + 6 * n + 1])
    (g_buf, g_sem, d_buf, d_sem, x_buf, x_sem,
     o_buf, o_sem) = refs[base + 6 * n + 1:]
    ck = ch // k
    get_g = _pipe(g_hbm, g_buf, g_sem, ch, n_chunks)
    get_d = _pipe(d_hbm, d_buf, d_sem, ck, n_chunks)
    get_x = _pipe(x_hbm, x_buf, x_sem, ck, n_chunks)

    def put(slot, i):
        return pltpu.make_async_copy(
            o_buf.at[slot], dg_hbm.at[pl.ds(i * ch, ch)],
            o_sem.at[slot],
        )

    get_g(0, 0).start()
    get_d(0, 0).start()
    get_x(0, 0).start()

    def body(i, carry):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            nxt = (i + 1) % 2
            get_g(nxt, i + 1).start()
            get_d(nxt, i + 1).start()
            get_x(nxt, i + 1).start()

        get_g(slot, i).wait()
        get_d(slot, i).wait()
        get_x(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            put(slot, i - 2).wait()

        x = g_buf[slot].astype(_F32)
        a_list, h_list = _chain(x, vec_refs, w_refs, b_refs, n)
        dy, da_map = _bwd_walk(
            a_list, d_buf[slot], x_buf[slot], vec_refs, w_refs,
            mu_list, k=k, level=0, n=n,
        )
        o_buf[slot] = dy
        put(slot, i).start()
        h_prev = [x] + h_list
        new_carry = []
        for j in range(1, n + 1):
            da = da_map[j]
            dw = lax.dot_general(
                h_prev[j - 1].astype(_BF16), da.astype(_BF16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=_F32,
            )
            db = jnp.sum(da, 0, keepdims=True)
            dw_c, db_c = carry[2 * (j - 1)], carry[2 * (j - 1) + 1]
            new_carry += [dw_c + dw, db_c + db]
        return tuple(new_carry)

    init = []
    for w in w_refs:
        init += [jnp.zeros(w.shape, _F32),
                 jnp.zeros((1, w.shape[1]), _F32)]
    final = lax.fori_loop(0, n_chunks, body, tuple(init))
    for j in range(n):
        dw_refs[j][:] = final[2 * j]
        db_refs[j][:] = final[2 * j + 1]
    for back in (2, 1):
        @pl.when(n_chunks >= back)
        def _(back=back):
            i = n_chunks - back
            put(i % 2, i).wait()


def recompute_bwd_final(g2, dout, amax, vecs, ws, bs, mus, *, k,
                        ch: int = 0, interpret: bool = False):
    """Single-launch twin of ``samlp.recompute_bwd_final``."""
    c0_true = g2.shape[1]
    g2, ws = _pad_input_side(g2, ws)
    c_true = ws[-1].shape[1]
    if c_true % 128:
        vecs, ws, bs, mus = _pad_output_side(vecs, ws, bs, mus)
        dout = _pad_cols(dout)
        amax = _pad_cols(amax)
    m, c0 = g2.shape
    n = len(ws)
    c_last = ws[-1].shape[1]
    if not ch:
        a_w = [w.shape[1] for w in ws]
        # fwd chain + walk + double-buffered dg output (c0) + chunk
        # buffers for dout/amax
        ch = _choose_chunk(
            m, k,
            [c0] * 5 + a_w + a_w[:-1]
            + [c_last] * 2 + [8 * c_last // max(k, 1)],
        )
    n_chunks = m // ch
    in_specs, args, scratch = _bwd_in_setup(
        g2, dout, amax, vecs, ws, bs, ch, k
    )
    for j in range(1, n + 1):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(mus[j - 1].astype(_F32))
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((m, c0), _F32)]
    for w in ws:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, _F32))
    for w in ws:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, w.shape[1]), _F32))
    scratch += [
        pltpu.VMEM((2, ch, c0), _F32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    outs = pl.pallas_call(
        functools.partial(
            _bwd_final_kernel, n=n, k=k, ch=ch, n_chunks=n_chunks
        ),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    dg2 = outs[0][:, :c0_true]
    dws = list(outs[1:1 + n])
    dbs = list(outs[1 + n:1 + 2 * n])
    # slice the zero-padded lanes back off the edge-layer grads
    dws[0] = dws[0][:c0_true, :]
    if c_true != c_last:
        dws[-1] = dws[-1][:, :c_true]
        dbs[-1] = dbs[-1][:, :c_true]
    return dg2, tuple(dws), tuple(dbs)
