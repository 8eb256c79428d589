"""Transposed (channel-sublane) fused SA-MLP path vs the row path.

fused_mlp_max_t takes grouped_t [B, C0, S·K] (the gather_t layout) and
must match fused_mlp_max on the transposed data: outputs, BN stats,
parameter gradients, and the block-input gradient (transposed back).
Also covers sample_and_group_t vs sample_and_group (interpret-mode
gather kernels) and the PointMLP transposed entry's shared param tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.nn.layers import BN_EPS, PointMLP
from papc_tpu.ops import fused_mlp

from tests.test_fused_mlp import _setup


def _to_t(g):
    b, s, k, c = g.shape
    return g.reshape(b, s * k, c).transpose(0, 2, 1)  # [B, C, S*K]


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_fused_t_forward_matches_row(rng, impl):
    g, _, _, params, running = _setup(rng)
    k = g.shape[2]
    out_row, run_row = fused_mlp.fused_mlp_max(
        g, params, running, train=True, eps=BN_EPS, impl=impl,
        interpret=True,
    )
    out_t, run_t = fused_mlp.fused_mlp_max_t(
        _to_t(g), params, running, k=k, train=True, eps=BN_EPS,
        impl=impl, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_row), rtol=1e-5, atol=1e-5
    )
    for (m_a, v_a), (m_b, v_b) in zip(run_t, run_row):
        np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_fused_t_eval_matches_row(rng, impl):
    g, _, _, params, running = _setup(rng)
    k = g.shape[2]
    out_row, _ = fused_mlp.fused_mlp_max(
        g, params, running, train=False, eps=BN_EPS, impl=impl,
        interpret=True,
    )
    out_t, _ = fused_mlp.fused_mlp_max_t(
        _to_t(g), params, running, k=k, train=False, eps=BN_EPS,
        impl=impl, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_row), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_fused_t_grads_match_row(rng, impl):
    g, _, _, params, running = _setup(rng)
    k = g.shape[2]

    def loss_row(gg, p):
        out, _ = fused_mlp.fused_mlp_max(
            gg, p, running, train=True, eps=BN_EPS, impl=impl,
            interpret=True,
        )
        return (out * out).sum()

    def loss_t(gg_t, p):
        out, _ = fused_mlp.fused_mlp_max_t(
            gg_t, p, running, k=k, train=True, eps=BN_EPS, impl=impl,
            interpret=True,
        )
        return (out * out).sum()

    dg_row, dp_row = jax.grad(loss_row, argnums=(0, 1))(g, params)
    dg_t, dp_t = jax.grad(loss_t, argnums=(0, 1))(_to_t(g), params)
    np.testing.assert_allclose(
        np.asarray(dg_t), np.asarray(_to_t(dg_row)),
        rtol=2e-4, atol=2e-4,
    )
    for layer_t, layer_row in zip(dp_t, dp_row):
        for a, b in zip(layer_t, layer_row):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )


def test_sample_and_group_t_matches_row(rng):
    from papc_tpu.ops import sample_and_group
    from papc_tpu.ops.grouping import sample_and_group_t

    B, N, D = 2, 64, 5
    xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    for points in (None, feats):
        new_xyz, grouped = sample_and_group(8, 0.8, 4, xyz, points)
        new_xyz_t, grouped_t = sample_and_group_t(
            8, 0.8, 4, xyz, points, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(new_xyz_t), np.asarray(new_xyz), rtol=1e-6
        )
        b, s, k, c = grouped.shape
        np.testing.assert_allclose(
            np.asarray(grouped_t),
            np.asarray(grouped).reshape(b, s * k, c).transpose(0, 2, 1),
            rtol=1e-5, atol=1e-6,
        )


def test_pointmlp_transposed_shares_param_tree(rng):
    """The transposed entry must create/read the SAME param subtree as
    the classic branch (Dense_i/BatchNorm_i twins)."""
    B, S, K, C = 2, 16, 8, 6
    g = jnp.asarray(rng.randn(B, S, K, C), jnp.float32)
    g_t = _to_t(g)
    mlp = PointMLP((16, 32), pool_max=True)
    v_row = mlp.init(jax.random.PRNGKey(0), g, train=False)
    v_t = mlp.init(
        jax.random.PRNGKey(0), g_t, train=False, transposed_k=K
    )
    assert jax.tree_util.tree_structure(
        v_row["params"]
    ) == jax.tree_util.tree_structure(v_t["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(v_row["params"]),
        jax.tree_util.tree_leaves(v_t["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # apply (fused forced, jnp twin) must match the classic row apply
    with fused_mlp.override(enable=True, impl="jnp"):
        out_t, _ = mlp.apply(
            v_row, g_t, train=True, transposed_k=K,
            mutable=["batch_stats"],
        )
    out_row, _ = mlp.apply(
        v_row, g, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_row), rtol=2e-2, atol=2e-2
    )
