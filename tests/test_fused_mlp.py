"""Fused SA-MLP block (ops/fused_mlp + ops/pallas/samlp) vs flax oracle.

Three-level oracle chain (CLAUDE.md convention):
  plain flax Dense/BN/ReLU stack (autodiff)  ←tolerance→  jnp twin
  (mirrors the kernels' bf16-storage arithmetic + analytic BN VJP)
  ←exact/1ulp→  Pallas kernels in interpret mode.
The PointMLP integration test forces the fused branch via
``fused_mlp.override`` and checks the shared-param-tree contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from papc_tpu.nn.layers import BN_EPS, BN_MOMENTUM, PointMLP
from papc_tpu.ops import fused_mlp


class FlaxOracle(nn.Module):
    """The classic per-op stack + max — the semantics target."""

    features: tuple

    @nn.compact
    def __call__(self, x, train=True):
        for f in self.features:
            x = nn.Dense(f)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
            )(x)
            x = nn.relu(x)
        return jnp.max(x, axis=2)


def _setup(rng, feats=(16, 32), shape=(4, 16, 8, 6)):
    g = jnp.asarray(rng.randn(*shape), jnp.float32)
    oracle = FlaxOracle(feats)
    variables = oracle.init(jax.random.PRNGKey(7), g, train=False)
    params = tuple(
        (
            variables["params"][f"Dense_{i}"]["kernel"],
            variables["params"][f"Dense_{i}"]["bias"],
            variables["params"][f"BatchNorm_{i}"]["scale"],
            variables["params"][f"BatchNorm_{i}"]["bias"],
        )
        for i in range(len(feats))
    )
    running = tuple(
        (
            variables["batch_stats"][f"BatchNorm_{i}"]["mean"],
            variables["batch_stats"][f"BatchNorm_{i}"]["var"],
        )
        for i in range(len(feats))
    )
    return g, oracle, variables, params, running


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_forward_train_matches_flax(rng, impl):
    g, oracle, variables, params, running = _setup(rng)
    want, mut = oracle.apply(variables, g, train=True,
                             mutable=["batch_stats"])
    got, new_running = fused_mlp.fused_mlp_max(
        g, params, running, train=True, momentum=BN_MOMENTUM,
        eps=BN_EPS, impl=impl, interpret=True,
    )
    # bf16 inter-layer storage: tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=6e-2)
    for i, (nm, nv) in enumerate(new_running):
        np.testing.assert_allclose(
            np.asarray(nm),
            np.asarray(mut["batch_stats"][f"BatchNorm_{i}"]["mean"]),
            rtol=0, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(nv),
            np.asarray(mut["batch_stats"][f"BatchNorm_{i}"]["var"]),
            rtol=0, atol=2e-3,
        )


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_forward_eval_matches_flax(rng, impl):
    g, oracle, variables, params, running = _setup(rng)
    # make running stats non-trivial
    running = tuple(
        (m + 0.3, v * 1.7 + 0.1) for (m, v) in running
    )
    variables = dict(variables)
    variables["batch_stats"] = {
        f"BatchNorm_{i}": {"mean": m, "var": v}
        for i, (m, v) in enumerate(running)
    }
    want = oracle.apply(variables, g, train=False)
    got, same = fused_mlp.fused_mlp_max(
        g, params, running, train=False, impl=impl, interpret=True,
        eps=BN_EPS,
    )
    assert same is running
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=6e-2)


def test_pallas_matches_jnp_twin_exactly(rng):
    """Interpret-mode kernels mirror the twin's arithmetic: forward
    outputs should agree to fp32 roundoff (same ops, same order up to
    XLA scheduling)."""
    g, _, _, params, running = _setup(rng)
    a, _ = fused_mlp.fused_mlp_max(
        g, params, running, train=True, impl="jnp", eps=BN_EPS)
    b, _ = fused_mlp.fused_mlp_max(
        g, params, running, train=True, impl="pallas", interpret=True,
        eps=BN_EPS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-5)


def test_custom_vjp_matches_twin_autodiff_f32(rng):
    """The hand-written backward (analytic BN + argmax routing) vs
    plain autodiff through the twin's OWN forward, BOTH in full f32
    (sdtype=f32 switches the twin's dots to true f32). This isolates
    the backward math from matmul precision: agreement is ~1e-4 of
    peak. (At production bf16 the custom VJP and autodiff are two
    differently-rounded estimators of the same quantity — their
    mutual distance is the bf16 band, covered by the loose test.)"""
    g, _, variables, params, running = _setup(rng)
    b, s, k, c0 = g.shape
    g2 = g.reshape(b * s * k, c0)

    def loss_ref(p, x2):
        out2, _, _ = fused_mlp._fwd_passes(
            x2, p, k=k, eps=BN_EPS, tm=0, impl="jnp",
            sdtype=jnp.float32, interpret=False)
        return jnp.sum(out2 * out2)

    def loss_fused(p, x):
        out, _ = fused_mlp.fused_mlp_max(
            x, p, running, train=True, eps=BN_EPS, impl="jnp",
            sdtype=jnp.float32)
        return jnp.sum(out * out)

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, g2)
    gp_u, gx_u = jax.grad(loss_fused, argnums=(0, 1))(params, g)
    xs = max(1.0, float(jnp.max(jnp.abs(gx_r))))
    np.testing.assert_allclose(
        np.asarray(gx_u).reshape(gx_r.shape), np.asarray(gx_r),
        rtol=0, atol=1e-4 * xs)
    for i in range(len(params)):
        for got, want in zip(gp_u[i], gp_r[i]):
            scale = max(1.0, float(jnp.max(jnp.abs(want))))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want),
                rtol=0, atol=1e-4 * scale,
            )


def test_pallas_grads_match_jnp_twin(rng):
    """Pallas kernels (interpret) and the jnp twin implement the SAME
    custom VJP arithmetic at production bf16 — grads agree to fp32
    roundoff of the shared formulas."""
    g, _, variables, params, running = _setup(rng)

    def make_loss(impl):
        def loss(p, x):
            out, _ = fused_mlp.fused_mlp_max(
                x, p, running, train=True, eps=BN_EPS, impl=impl,
                interpret=True)
            return jnp.sum(out * out)
        return loss

    gp_j, gx_j = jax.grad(make_loss("jnp"), argnums=(0, 1))(params, g)
    gp_p, gx_p = jax.grad(make_loss("pallas"), argnums=(0, 1))(params, g)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j),
                               rtol=1e-5, atol=1e-4)
    for tj, tp in zip(jax.tree_util.tree_leaves(gp_j),
                      jax.tree_util.tree_leaves(gp_p)):
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tj),
                                   rtol=1e-5, atol=1e-4)


def test_grads_track_flax_autodiff_loosely(rng):
    """Sanity vs the true-f32 flax oracle: the fused grads sit within
    the bf16-matmul noise band (the SAME band the op-by-op XLA path
    occupies on TPU, where DEFAULT matmul precision feeds the MXU
    bf16 inputs — measured equal while building the kernels)."""
    g, oracle, variables, params, running = _setup(rng)

    def loss_flax(p, x):
        out, _ = oracle.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean(out * out)

    def loss_fused(p, x):
        out, _ = fused_mlp.fused_mlp_max(
            x, p, running, train=True, eps=BN_EPS, impl="jnp")
        return jnp.mean(out * out)

    gx_f = jax.grad(loss_flax, argnums=1)(variables["params"], g)
    gx_u = jax.grad(loss_fused, argnums=1)(params, g)
    ref = np.asarray(gx_f)
    scale = max(1.0, np.abs(ref).max())
    err = np.abs(np.asarray(gx_u) - ref)
    # bf16 rel precision 2^-8 amplified through a 2-layer BN chain:
    # allow 30% of peak on isolated elements, 1% RMS
    assert err.max() <= 0.3 * scale
    assert np.sqrt((err ** 2).mean()) <= 1e-2 * scale


def test_pointmlp_fused_branch_shares_param_tree(rng):
    """PointMLP(pool_max) with the fused branch forced reads the SAME
    variables the classic branch created, returns matching outputs, and
    writes running stats through the flax mutable mechanism."""
    g = jnp.asarray(rng.randn(8, 64, 8, 6), jnp.float32)
    m = PointMLP((16, 32), pool_max=True)
    variables = m.init(jax.random.PRNGKey(3), g, train=False)
    assert fused_mlp.supported(g.shape, (16, 32))

    classic, mut_c = m.apply(variables, g, train=True,
                             mutable=["batch_stats"])
    with fused_mlp.override(enable=True, impl="pallas", interpret=True):
        fused, mut_f = m.apply(variables, g, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(classic),
                               rtol=0, atol=6e-2)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(mut_c["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"]),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-3)

    # eval path too
    ec = m.apply(variables, g, train=False)
    with fused_mlp.override(enable=True, impl="jnp"):
        ef = m.apply(variables, g, train=False)
    np.testing.assert_allclose(np.asarray(ef), np.asarray(ec),
                               rtol=0, atol=6e-2)


def test_gate_small_and_3d_inputs_stay_classic():
    assert not fused_mlp.supported((2, 4, 8, 6), (16,))  # < 4096 rows
    assert not fused_mlp.supported((128, 64, 6), (16,))  # not grouped
    assert not fused_mlp.supported((32, 1, 1024, 6), (16,))  # group_all
    assert not fused_mlp.supported((4, 3, 512, 6), (16,))  # groups !% 8
    assert fused_mlp.supported((8, 64, 16, 6), (16, 32))


def test_bf16_input_roundtrip(rng):
    """bf16 grouped input (trainer bf16 mode): output dtype follows the
    input; values track the fp32 path within bf16 noise."""
    g, _, _, params, running = _setup(rng)
    got32, _ = fused_mlp.fused_mlp_max(
        g, params, running, train=True, eps=BN_EPS, impl="jnp")
    pb = tuple(tuple(q.astype(jnp.bfloat16) for q in p) for p in params)
    got16, _ = fused_mlp.fused_mlp_max(
        g.astype(jnp.bfloat16), pb, running, train=True, eps=BN_EPS,
        impl="jnp")
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(got32),
        rtol=0, atol=1e-1,
    )


# --------------------------- v2 (recompute mode) ---------------------------

@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_recompute_forward_matches_flax(rng, impl):
    g, oracle, variables, params, running = _setup(rng)
    want, mut = oracle.apply(variables, g, train=True,
                             mutable=["batch_stats"])
    got, new_running = fused_mlp.fused_mlp_max(
        g, params, running, train=True, momentum=BN_MOMENTUM,
        eps=BN_EPS, impl=impl, interpret=True, mode="recompute",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=6e-2)
    for i, (nm, nv) in enumerate(new_running):
        np.testing.assert_allclose(
            np.asarray(nm),
            np.asarray(mut["batch_stats"][f"BatchNorm_{i}"]["mean"]),
            rtol=0, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(nv),
            np.asarray(mut["batch_stats"][f"BatchNorm_{i}"]["var"]),
            rtol=0, atol=2e-3)


def test_recompute_pallas_matches_jnp(rng):
    """Interpret-mode recompute kernels vs their jnp twins: same
    arithmetic, fwd and grads."""
    g, _, _, params, running = _setup(rng)

    def make_loss(impl):
        def loss(p, x):
            out, _ = fused_mlp.fused_mlp_max(
                x, p, running, train=True, eps=BN_EPS, impl=impl,
                interpret=True, mode="recompute")
            return jnp.sum(out * out)
        return loss

    oj = make_loss("jnp")(params, g)
    op = make_loss("pallas")(params, g)
    np.testing.assert_allclose(float(op), float(oj), rtol=1e-6)
    gp_j, gx_j = jax.grad(make_loss("jnp"), argnums=(0, 1))(params, g)
    gp_p, gx_p = jax.grad(make_loss("pallas"), argnums=(0, 1))(params, g)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j),
                               rtol=1e-5, atol=1e-4)
    for tj, tp in zip(jax.tree_util.tree_leaves(gp_j),
                      jax.tree_util.tree_leaves(gp_p)):
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tj),
                                   rtol=1e-5, atol=1e-4)


def test_recompute_vjp_matches_autodiff_f32(rng):
    """f32-isolated: the recompute custom VJP vs autodiff through the
    recompute twin forward — backward math correctness."""
    g, _, variables, params, running = _setup(rng)
    b, s, k, c0 = g.shape
    g2 = g.reshape(b * s * k, c0)

    def loss_ref(p, x2):
        out2, _, _ = fused_mlp._fwd_recompute(
            x2, p, k=k, eps=BN_EPS, impl="jnp",
            sdtype=jnp.float32, interpret=False)
        return jnp.sum(out2 * out2)

    def loss_fused(p, x):
        out, _ = fused_mlp.fused_mlp_max(
            x, p, running, train=True, eps=BN_EPS, impl="jnp",
            sdtype=jnp.float32, mode="recompute")
        return jnp.sum(out * out)

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, g2)
    gp_u, gx_u = jax.grad(loss_fused, argnums=(0, 1))(params, g)
    xs = max(1.0, float(jnp.max(jnp.abs(gx_r))))
    np.testing.assert_allclose(
        np.asarray(gx_u).reshape(gx_r.shape), np.asarray(gx_r),
        rtol=0, atol=1e-4 * xs)
    for i in range(len(params)):
        for got, want in zip(gp_u[i], gp_r[i]):
            # +5e-4 absolute floor: db is analytically zero through a
            # train-mode BN (bias shifts cancel in x̂), so both sides
            # are pure roundoff there
            scale = max(1.0, float(jnp.max(jnp.abs(want))))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want),
                rtol=0, atol=1e-4 * scale + 5e-4)


def test_recompute_close_to_stream(rng):
    """The two modes compute the same function (different storage
    rounding: stream keeps bf16 activations, recompute keeps the
    chain f32 in-register) — outputs within the bf16 band."""
    g, _, _, params, running = _setup(rng)
    a, ra = fused_mlp.fused_mlp_max(
        g, params, running, train=True, eps=BN_EPS, impl="jnp",
        mode="stream")
    b_, rb = fused_mlp.fused_mlp_max(
        g, params, running, train=True, eps=BN_EPS, impl="jnp",
        mode="recompute")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=0, atol=5e-2)
    for (ma, va), (mb, vb) in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb),
                                   rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=0, atol=2e-3)


def test_recompute1_odd_dims_matches_jnp(rng):
    """recompute1 at SA2-flavored awkward dims: channel counts that are
    not lane multiples (19 -> 24 -> 40) and a K=16 max group; exercises
    lane padding in the chunk model and ck = ch/k output streaming."""
    g, _, _, params, running = _setup(
        rng, feats=(24, 40), shape=(2, 8, 16, 19))

    def loss(mode, impl):
        def f(p, x):
            out, _ = fused_mlp.fused_mlp_max(
                x, p, running, train=True, eps=BN_EPS, impl=impl,
                interpret=True, mode=mode)
            return jnp.sum(out * out)
        return f

    la = loss("recompute", "jnp")(params, g)
    lb = loss("recompute1", "pallas")(params, g)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-6)
    ga = jax.grad(loss("recompute", "jnp"), (0, 1))(params, g)
    gb = jax.grad(loss("recompute1", "pallas"), (0, 1))(params, g)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-4)


def test_recompute1_single_launch_matches_recompute(rng):
    """The single-launch (in-kernel DMA pipeline) recompute passes are
    arithmetic twins of the grid recompute passes — fwd and grads
    bitwise in interpret mode."""
    g, _, _, params, running = _setup(rng)

    def make_loss(mode, impl):
        def loss(p, x):
            out, _ = fused_mlp.fused_mlp_max(
                x, p, running, train=True, eps=BN_EPS, impl=impl,
                interpret=True, mode=mode)
            return jnp.sum(out * out)
        return loss

    la = make_loss("recompute", "jnp")(params, g)
    lb = make_loss("recompute1", "pallas")(params, g)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-6)
    ga = jax.grad(make_loss("recompute", "jnp"), (0, 1))(params, g)
    gb = jax.grad(make_loss("recompute1", "pallas"), (0, 1))(params, g)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("mode", ["stream", "recompute", "recompute1"])
def test_row_counts_not_divisible_by_256(rng, mode):
    """PFN-flavored shapes: K=100 groups and a row count (16000) that
    no multiple of 256 divides. pass_tile must still cover every row —
    the old 256-stride-only search left tail rows uninitialized
    (stream: NaN) or out of the accumulated stats (recompute: silently
    wrong variance)."""
    g, _, _, params, running = _setup(
        rng, feats=(64,), shape=(2, 80, 100, 9))

    def loss(impl, md):
        def f(p, x):
            out, _ = fused_mlp.fused_mlp_max(
                x, p, running, train=True, eps=BN_EPS, impl=impl,
                interpret=True, mode=md)
            return jnp.sum(out * out)
        return f

    la = loss("jnp", "stream")(params, g)
    lb = loss("pallas", mode)(params, g)
    assert bool(jnp.isfinite(lb))
    np.testing.assert_allclose(float(lb), float(la), rtol=2e-4)
    gb = jax.grad(loss("pallas", mode), (0, 1))(params, g)
    for leaf in jax.tree_util.tree_leaves(gb):
        assert bool(jnp.isfinite(leaf).all())
