"""Scanned multi-step training (make_scan_train_step / train(scan_steps)).

The scanned program must be the SAME update as sequential stepping —
proved by replaying its rng schedule through the per-call step and
comparing final params — and the train() integration must learn and
handle the < K leftover tail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from papc_tpu.data.synthetic import write_shapenet_h5
from papc_tpu.models import init_model
from papc_tpu.train.trainer import (
    create_train_state,
    make_scan_train_step,
    make_train_step,
    stack_batches,
    train,
)

N_POINTS = 64
NUM_CLASSES = 4


def _batches(rs, k, b=8):
    out = []
    for _ in range(k):
        out.append(
            {
                "points": rs.randn(b, N_POINTS, 3).astype(np.float32),
                "label": rs.randint(0, NUM_CLASSES, size=(b,)),
                "mask": np.ones((b,), bool),
            }
        )
    return out


def test_scan_equals_sequential():
    spec = init_model("pointnet2_ssg", "clas", num_classes=NUM_CLASSES)
    rs = np.random.RandomState(0)
    K = 4
    host_batches = _batches(rs, K)
    first = jax.tree_util.tree_map(jnp.asarray, host_batches[0])
    rng = jax.random.PRNGKey(7)
    state_a = create_train_state(spec, rng, first)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    scan_step = make_scan_train_step(spec, K)
    stacked = jax.tree_util.tree_map(
        jnp.asarray, stack_batches(host_batches)
    )
    base = jax.random.PRNGKey(123)
    state_a, losses, metrics = scan_step(state_a, stacked, base)
    assert losses.shape == (K,) and metrics.shape == (K,)

    train_step, _ = make_train_step(spec)
    r = base
    seq_losses = []
    for hb in host_batches:
        r, sub = jax.random.split(r)
        batch = jax.tree_util.tree_map(jnp.asarray, hb)
        state_b, loss, _ = train_step(state_b, batch, sub)
        seq_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5, atol=1e-5
    )
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("shapenet_scan")
    write_shapenet_h5(
        str(path), n_train=40, n_test=8, n_val=8, n_points=N_POINTS,
        num_classes=NUM_CLASSES, num_parts=8,
    )
    return str(path)


def test_train_with_scan_steps_learns(dataset, tmp_path):
    # batchsize 16 over 40 samples -> 2 full stacks of K=1... use
    # K=2: 2 scanned calls + 1 leftover single step per epoch
    logs = []
    state, history = train(
        model_name="pointnet_basic",
        mode="clas",
        max_point=N_POINTS,
        num_classes=NUM_CLASSES,
        num_parts=8,
        learning_rate=1e-3,
        weight_decay=1e-4,
        epoch_num=3,
        batchsize=16,
        info_iter=2,
        save_iter=2,
        path=dataset,
        model_dir=str(tmp_path / "model"),
        scan_steps=2,
        log=logs.append,
    )
    assert history[-1]["val_loss"] < history[0]["val_loss"] * 1.5
    assert history[-1]["val_metric"] > 0.3
    assert any("loss is" in line for line in logs)
