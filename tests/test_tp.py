"""Tensor-parallel correctness: tp=2 must match tp=1 numerically (the
same standard test_dp_equivalence.py sets for DP). The TP rule set
column-shards wide Dense kernels over the 'model' axis; XLA inserts the
activation collectives — results must agree to float-reduction tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.models import init_model
from papc_tpu.parallel.tp import param_spec, shard_params
from papc_tpu.train.trainer import (
    TrainState,
    make_optimizer,
    make_train_step,
)


def _tiny_spec():
    spec = init_model("pointnet2_ssg", "clas", num_classes=4)
    return spec.__class__(
        model=spec.model.__class__(
            num_classes=4, npoints=(16, 8), nsamples=(8, 8)
        ),
        input_kind=spec.input_kind,
        mode=spec.mode,
    )


def _batch(rng, B=4, N=32):
    return {
        "points": jnp.asarray(rng.randn(B, N, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 4, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_tp2_matches_tp1(rng):
    from jax.sharding import Mesh

    spec = _tiny_spec()
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    variables = spec.model.init(
        {"params": key, "dropout": key}, batch["points"], train=False
    )
    train_step, eval_step = make_train_step(spec, num_parts=4)

    def run(n_model):
        mesh = Mesh(
            np.asarray(jax.devices()[:n_model]).reshape(1, n_model),
            ("data", "model"),
        )
        # jnp.copy first: device_put aliases when the sharding is a
        # no-op, and the donated step consumes whatever it's given
        params = shard_params(
            mesh,
            jax.tree_util.tree_map(jnp.copy, variables["params"]),
            min_dim=256,
        )
        if n_model > 1:
            # the rule set must actually shard something in this model
            specs = jax.tree_util.tree_leaves_with_path(
                jax.tree_util.tree_map_with_path(
                    lambda p, l: str(param_spec(p, l, n_model, 256)),
                    variables["params"],
                )
            )
            assert any("model" in s for _, s in specs)
        state = TrainState.create(
            apply_fn=spec.model.apply,
            params=params,
            # fresh copies: the donated train step consumes its inputs,
            # and `variables` must survive for the second run
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get("batch_stats", {})
            ),
            tx=make_optimizer(1e-3, 0.0),
        )
        losses = []
        with mesh:
            for i in range(3):
                state, loss, _ = train_step(
                    state, batch, jax.random.PRNGKey(i + 1)
                )
                losses.append(float(loss))
            out = eval_step(state, batch)
        return losses, float(out[0]), state

    losses1, eval1, s1 = run(1)
    losses2, eval2, s2 = run(2)
    np.testing.assert_allclose(losses1, losses2, rtol=1e-4)
    # post-Adam eval: grad/sqrt(v) amplifies reduction-order float noise
    # (same rationale as the DP test's param tolerance)
    assert eval1 == pytest.approx(eval2, rel=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3
        )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_tp_forward_exact(rng):
    from jax.sharding import Mesh

    spec = _tiny_spec()
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    variables = spec.model.init(
        {"params": key, "dropout": key}, batch["points"], train=False
    )

    def fwd(params):
        return spec.model.apply(
            {
                "params": params,
                "batch_stats": variables.get("batch_stats", {}),
            },
            batch["points"],
            train=False,
        )

    ref = np.asarray(jax.jit(fwd)(variables["params"]))
    mesh = Mesh(
        np.asarray(jax.devices()[:2]).reshape(1, 2), ("data", "model")
    )
    with mesh:
        tp = np.asarray(
            jax.jit(fwd)(shard_params(mesh, variables["params"], 256))
        )
    np.testing.assert_allclose(ref, tp, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_tp_conv_forward_exact(rng):
    """Conv kernels [kh, kw, cin, cout] column-shard over cout (the
    detection RPN's layer family); tp=2 forward must match unsharded."""
    from flax import linen as nn
    from jax.sharding import Mesh

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(256, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.Conv(256, (3, 3))(x)
            x = nn.relu(x)
            return nn.Conv(16, (1, 1))(x)  # narrow head: replicated

    model = ConvStack()
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def fwd(params):
        return model.apply({"params": params}, x)

    ref = np.asarray(jax.jit(fwd)(variables["params"]))
    mesh = Mesh(
        np.asarray(jax.devices()[:2]).reshape(1, 2), ("data", "model")
    )
    sharded = shard_params(mesh, variables["params"], min_dim=256)
    # the rule must have actually sharded the wide conv kernels
    wide = sharded["Conv_0"]["kernel"]
    assert "model" in str(wide.sharding.spec)
    with mesh:
        tp = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(ref, tp, atol=1e-5)


def test_tp_bias_rule_requires_sharded_kernel():
    """A bias shards ONLY when its sibling kernel sharded: free-standing
    wide vectors (BatchNorm bias/scale) stay replicated (the pre-r5 rule
    sharded any wide bias, contradicting its own docstring)."""
    from jax.sharding import PartitionSpec as P

    from papc_tpu.parallel.tp import _kernel_spec

    params = {
        "Dense_0": {
            "kernel": np.zeros((128, 512), np.float32),
            "bias": np.zeros((512,), np.float32),
        },
        "Dense_narrow": {
            "kernel": np.zeros((128, 64), np.float32),
            "bias": np.zeros((64,), np.float32),
        },
        "BatchNorm_0": {
            "scale": np.ones((512,), np.float32),
            "bias": np.zeros((512,), np.float32),
        },
        "Conv_0": {
            "kernel": np.zeros((3, 3, 64, 256), np.float32),
            "bias": np.zeros((256,), np.float32),
        },
    }
    n_model, min_dim = 2, 256

    def spec_of(module, name, kernel_sharded):
        return param_spec(
            (module, name), params[module][name], n_model, min_dim,
            kernel_sharded=kernel_sharded,
        )

    # kernels: wide Dense + Conv shard their LAST axis, narrow doesn't
    assert spec_of("Dense_0", "kernel", None) == P(None, "model")
    assert spec_of("Conv_0", "kernel", None) == P(
        None, None, None, "model"
    )
    assert spec_of("Dense_narrow", "kernel", None) == P()
    assert _kernel_spec((3, 3, 64, 256), 2, 256) == P(
        None, None, None, "model"
    )
    # biases: only next to a sharded kernel
    assert spec_of("Dense_0", "bias", True) == P("model")
    assert spec_of("Conv_0", "bias", True) == P("model")
    assert spec_of("Dense_narrow", "bias", False) == P()
    # the regression: a wide BatchNorm bias must NOT shard
    assert spec_of("BatchNorm_0", "bias", False) == P()
    assert spec_of("BatchNorm_0", "scale", False) == P()
