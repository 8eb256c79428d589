"""Model-level tests: init, forward shapes, parameter completeness, grads.

Covers the reference's 13 model/mode combos (PAPC/train.py:8-60), plus a
check that every layer's params actually register (catching the class of
bug the reference has in its SA layers — pointnet2_basic_layers.py:185).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.models import init_model

B, N = 2, 128
KEY = jax.random.PRNGKey(0)


def _inputs(spec, num_classes=4):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, num_classes, size=(B,)))
    if spec.input_kind == "voxel":
        vox = jnp.asarray(
            (rng.rand(B, 32, 32, 32, 1) > 0.9).astype(np.float32)
        )
        return (vox,)
    if spec.input_kind == "kd":
        depth = int(np.log2(N))
        splits = tuple(
            jnp.asarray(rng.randint(0, 3, size=(B, N >> l)))
            for l in range(depth)
        )
        return (pts, splits)
    if spec.mode == "seg":
        return (pts, label)
    return (pts,)


POINT_COMBOS = [
    ("pointnet_basic", "clas"),
    ("pointnet", "clas"),
    ("pointnet_conv2d", "clas"),
    ("vfe", "clas"),
    ("pointnet2_ssg", "clas"),
    ("pointnet2_msg", "clas"),
    ("pointnet_basic", "seg"),
    ("pointnet", "seg"),
    ("vfe", "seg"),
    ("pointnet2_ssg", "seg"),
    ("pointnet2_msg", "seg"),
]


@pytest.mark.parametrize("name,mode", POINT_COMBOS)
def test_point_models_forward(name, mode):
    num_classes, num_parts = 4, 6
    spec = init_model(name, mode, num_classes, num_parts, max_point=N)
    inputs = _inputs(spec, num_classes)
    variables = spec.model.init(
        {"params": KEY, "dropout": KEY}, *inputs, train=False
    )
    out = spec.model.apply(variables, *inputs, train=False)
    if mode == "clas":
        assert out.shape == (B, num_classes)
    else:
        assert out.shape == (B, N, num_parts)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("name,mode", [("kdnet", "clas"), ("kdunet", "seg")])
def test_kd_models_forward(name, mode):
    num_classes, num_parts = 4, 6
    spec = init_model(name, mode, num_classes, num_parts, max_point=N)
    inputs = _inputs(spec, num_classes)
    variables = spec.model.init(
        {"params": KEY, "dropout": KEY}, *inputs, train=False
    )
    out = spec.model.apply(variables, *inputs, train=False)
    if mode == "clas":
        assert out.shape == (B, num_classes)
    else:
        assert out.shape == (B, N, num_parts)
    assert bool(jnp.isfinite(out).all())


def test_voxnet_forward():
    spec = init_model("voxnet", "clas", num_classes=10)
    inputs = _inputs(spec, 10)
    variables = spec.model.init(
        {"params": KEY, "dropout": KEY}, *inputs, train=False
    )
    out = spec.model.apply(variables, *inputs, train=False)
    assert out.shape == (B, 10)


def test_all_params_receive_gradients():
    """Every registered parameter must get a nonzero-shaped gradient —
    the reference's SA-layer params never would (its registration bug)."""
    spec = init_model("pointnet2_ssg", "clas", 4, max_point=N)
    inputs = _inputs(spec, 4)
    variables = spec.model.init(
        {"params": KEY, "dropout": KEY}, *inputs, train=False
    )

    def loss(params):
        out, _ = spec.model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            *inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": KEY},
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert len(flat) > 20  # SA mlps x3 stages + head
    zero_paths = [
        jax.tree_util.keystr(p)
        for p, g in flat
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    assert not zero_paths, f"dead params: {zero_paths}"


def test_tnet_initial_transform_is_identity():
    from papc_tpu.nn import TNet

    pts = jnp.asarray(np.random.RandomState(0).randn(2, 32, 3), jnp.float32)
    tnet = TNet(k=3)
    variables = tnet.init(KEY, pts, train=False)
    t = tnet.apply(variables, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(t), np.tile(np.eye(3), (2, 1, 1)), atol=1e-5
    )


def test_pointnet_conv2d_returns_log_probs():
    """The Conv2D variant ends in LogSoftmax (pointnet_Conv2D.py:75):
    exp(out) must be a probability distribution."""
    spec = init_model("pointnet_conv2d", "clas", 4, max_point=N)
    inputs = _inputs(spec, 4)
    variables = spec.model.init(
        {"params": KEY, "dropout": KEY}, *inputs, train=False
    )
    out = spec.model.apply(variables, *inputs, train=False)
    assert out.shape == (B, 4)
    assert float(jnp.max(out)) <= 0.0
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(out), -1)), np.ones(B), rtol=1e-5
    )
