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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_detection_dp_matches_single_device(rng):
    """PointPillars train step sharded over 8 devices == 1 device."""
    from papc_tpu.detect import builders
    from papc_tpu.detect.config import DEFAULT_CONFIG_PATH, cfg_from_yaml_file
    from papc_tpu.detect.train import make_detection_train_step
    from papc_tpu.parallel.mesh import data_sharding
    from papc_tpu.train.trainer import TrainState

    cfg = cfg_from_yaml_file(DEFAULT_CONFIG_PATH)
    cfg.VOXEL_GENERATOR.VOXEL_SIZE = [4.32, 4.96, 4]
    cfg.VOXEL_GENERATOR.MAX_VOXELS = 32
    vg = builders.build_voxel_generator(cfg.VOXEL_GENERATOR)
    coder = builders.build_box_coder(cfg.BOX_CODER)
    gen = cfg.TARGET_ASSIGNER.ANCHOR_GENERATORS[0].anchor_generator_stride
    gen.strides = [8.64, 9.92, 0.0]
    gen.offsets = [4.32, -34.72, -1.78]
    ta = builders.build_target_assigner(cfg.TARGET_ASSIGNER, coder)
    model = builders.build_network(cfg, vg, ta)
    loss_cfg = builders.build_loss_config(cfg, ta)

    B, V, P = 8, 32, 8
    grid = vg.grid_size
    A = (grid[0] // 2) * (grid[1] // 2) * 2
    batch = {
        "voxels": jnp.asarray(rng.randn(B, V, P, 4), jnp.float32),
        "num_points": jnp.asarray(rng.randint(1, P, (B, V)), jnp.int32),
        "coordinates": jnp.asarray(
            np.stack([np.zeros((B, V)), rng.randint(0, grid[1], (B, V)),
                      rng.randint(0, grid[0], (B, V))], -1), jnp.int32),
        "anchors": jnp.asarray(
            np.tile(np.array([0.0, 0, -1, 1.6, 3.9, 1.56, 0], np.float32),
                    (B, A, 1))),
        "labels": jnp.asarray(rng.randint(-1, 2, (B, A)), jnp.int32),
        "reg_targets": jnp.asarray(rng.randn(B, A, 7) * 0.1, jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["voxels"], batch["num_points"],
        batch["coordinates"], train=False,
    )
    step, init_rm = make_detection_train_step(model, loss_cfg)

    def run(n_dev):
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get("batch_stats", {})),
            tx=builders.build_optimizer(cfg.TRAIN_CONFIG.OPTIMIZER),
        )
        state = replicate(mesh, state)
        b = jax.device_put(batch, data_sharding(mesh))
        rm = init_rm()
        losses = []
        for _ in range(2):
            state, metrics, rm = step(state, b, rm)
            losses.append(float(metrics["loss"]))
        return losses

    np.testing.assert_allclose(run(1), run(8), rtol=1e-4)
