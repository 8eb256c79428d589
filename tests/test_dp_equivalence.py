"""Data-parallel correctness: training sharded over 8 devices must match
single-device training (same data, same init) to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.models import init_model
from papc_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from papc_tpu.train.trainer import create_train_state, make_train_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_matches_single_device(rng):
    spec = init_model("pointnet_basic", "clas", 4, max_point=64)
    B = 16
    batch = {
        "points": jnp.asarray(rng.randn(B, 64, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 4, size=(B,))),
        "mask": jnp.ones((B,), bool),
    }
    key = jax.random.PRNGKey(0)
    train_step, _ = make_train_step(spec, num_parts=4)

    def run(n_dev):
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        state = create_train_state(spec, key, batch, 1e-3, 0.0)
        state = replicate(mesh, state)
        losses = []
        b = shard_batch(mesh, batch)
        s = state
        for i in range(3):
            s, loss, _ = train_step(s, b, jax.random.PRNGKey(i + 1))
            losses.append(float(loss))
        return losses, s

    losses1, s1 = run(1)
    losses8, s8 = run(8)
    np.testing.assert_allclose(losses1, losses8, rtol=1e-4)
    # params track to reduction-order float noise (psum tree order +
    # Adam's grad/sqrt(v) amplification of tiny differences)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3
        )


def test_sigint_atomic_checkpoint():
    import os
    import signal

    from papc_tpu.train.checkpoint import DelayedKeyboardInterrupt

    fired = []
    old = signal.signal(signal.SIGINT, lambda s, f: fired.append(1))
    try:
        with DelayedKeyboardInterrupt():
            os.kill(os.getpid(), signal.SIGINT)
            # inside the block the signal must be deferred
            assert fired == []
        # on exit the original handler receives it
        assert fired == [1]
    finally:
        signal.signal(signal.SIGINT, old)
