"""bf16 mixed-precision training mode.

The TPU-native scheme (papc_tpu.train.precision docstring): fp32 master
params / optimizer state / BN running stats, bf16 forward+backward, fp32
loss reduction. These tests pin (a) that the mode actually trains, (b)
that every state dtype stays fp32 step-over-step — a bf16 leaf in the
carried state alternates dtypes and forces an XLA recompile every step,
the round-1 failure mode that kept this unwired — and (c) DP equivalence
holds at bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.models import init_model
from papc_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from papc_tpu.train.trainer import create_train_state, make_train_step


def _clas_batch(rng, B=16, N=64, C=4):
    # separable blobs: class k centered at offset k along x
    labels = rng.randint(0, C, size=(B,))
    pts = rng.randn(B, N, 3) * 0.1
    pts[..., 0] += labels[:, None]
    return {
        "points": jnp.asarray(pts, jnp.float32),
        "label": jnp.asarray(labels),
        "mask": jnp.ones((B,), bool),
    }


def _float_dtypes(tree):
    return {
        str(x.dtype)
        for x in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.result_type(x), jnp.floating)
    }


def test_bf16_step_trains_and_state_stays_fp32(rng):
    spec = init_model("pointnet_basic", "clas", 4, max_point=64)
    batch = _clas_batch(rng)
    state = create_train_state(spec, jax.random.PRNGKey(0), batch, 1e-3, 0.0)
    train_step, _ = make_train_step(spec, num_parts=4, precision="bf16")

    losses = []
    for i in range(20):
        state, loss, metric = train_step(
            state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
        # dtype stability: every carried float leaf is fp32 after every
        # step (params, Adam moments, BN running stats)
        assert _float_dtypes(state.params) == {"float32"}
        assert _float_dtypes(state.batch_stats) <= {"float32"}
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses
    assert float(metric) > 0.5


def test_bf16_matches_fp32_loosely(rng):
    spec = init_model("pointnet_basic", "clas", 4, max_point=64)
    batch = _clas_batch(rng)

    def run(precision):
        state = create_train_state(
            spec, jax.random.PRNGKey(0), batch, 1e-3, 0.0
        )
        step, _ = make_train_step(spec, num_parts=4, precision=precision)
        for i in range(3):
            state, loss, _ = step(state, batch, jax.random.PRNGKey(i))
        return float(loss)

    assert run("bf16") == pytest.approx(run("fp32"), rel=0.1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_bf16_matches_single_device(rng):
    spec = init_model("pointnet_basic", "clas", 4, max_point=64)
    batch = _clas_batch(rng)
    train_step, _ = make_train_step(spec, num_parts=4, precision="bf16")

    def run(n_dev):
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        state = create_train_state(
            spec, jax.random.PRNGKey(0), batch, 1e-3, 0.0
        )
        state = replicate(mesh, state)
        b = shard_batch(mesh, batch)
        losses = []
        for i in range(3):
            state, loss, _ = train_step(state, b, jax.random.PRNGKey(i))
            losses.append(float(loss))
        return losses

    # bf16 tolerance: ~3 decimal digits of mantissa
    np.testing.assert_allclose(run(1), run(8), rtol=2e-2)


def test_detection_bf16_step(rng):
    """Tiny PointPillars step at bf16: finite loss, fp32 state dtypes."""
    from papc_tpu.detect import builders
    from papc_tpu.detect.config import DEFAULT_CONFIG_PATH, cfg_from_yaml_file
    from papc_tpu.detect.train import make_detection_train_step
    from papc_tpu.train.trainer import TrainState

    cfg = cfg_from_yaml_file(DEFAULT_CONFIG_PATH)
    cfg.VOXEL_GENERATOR.VOXEL_SIZE = [4.32, 4.96, 4]
    cfg.VOXEL_GENERATOR.MAX_VOXELS = 64
    vg = builders.build_voxel_generator(cfg.VOXEL_GENERATOR)
    coder = builders.build_box_coder(cfg.BOX_CODER)
    gen = cfg.TARGET_ASSIGNER.ANCHOR_GENERATORS[0].anchor_generator_stride
    gen.strides = [8.64, 9.92, 0.0]
    gen.offsets = [4.32, -34.72, -1.78]
    ta = builders.build_target_assigner(cfg.TARGET_ASSIGNER, coder)
    model = builders.build_network(cfg, vg, ta)
    loss_cfg = builders.build_loss_config(cfg, ta)

    B, V, P = 2, 64, 10
    grid = vg.grid_size
    A = (grid[0] // 2) * (grid[1] // 2) * 2
    batch = {
        "voxels": jnp.asarray(rng.randn(B, V, P, 4), jnp.float32),
        "num_points": jnp.asarray(rng.randint(1, P, (B, V)), jnp.int32),
        "coordinates": jnp.asarray(
            np.stack(
                [np.zeros((B, V)), rng.randint(0, grid[1], (B, V)),
                 rng.randint(0, grid[0], (B, V))], -1,
            ),
            jnp.int32,
        ),
        "anchors": jnp.asarray(
            np.tile(np.array([0.0, 0, -1, 1.6, 3.9, 1.56, 0], np.float32),
                    (B, A, 1))
        ),
        "labels": jnp.asarray(rng.randint(-1, 2, (B, A)), jnp.int32),
        "reg_targets": jnp.asarray(rng.randn(B, A, 7) * 0.1, jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["voxels"], batch["num_points"],
        batch["coordinates"], train=False,
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=builders.build_optimizer(cfg.TRAIN_CONFIG.OPTIMIZER),
    )
    step, init_rm = make_detection_train_step(
        model, loss_cfg, precision="bf16"
    )
    rm = init_rm()
    for _ in range(2):
        state, metrics, rm = step(state, batch, rm)
        assert np.isfinite(float(metrics["loss"]))
        assert _float_dtypes(state.params) == {"float32"}
        assert _float_dtypes(state.batch_stats) <= {"float32"}
