"""End-to-end smoke: synthetic ShapeNet h5 → train → loss decreases →
checkpoint round-trips. Exercises the same path as the root CLI."""

import os

import numpy as np
import pytest

from papc_tpu.data.synthetic import write_shapenet_h5

N_POINTS = 64
NUM_CLASSES = 4
NUM_PARTS = 8


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("shapenet")
    write_shapenet_h5(
        str(path),
        n_train=64,
        n_test=8,
        n_val=8,
        n_points=N_POINTS,
        num_classes=NUM_CLASSES,
        num_parts=NUM_PARTS,
    )
    return str(path)


def test_train_clas_loss_decreases(dataset, tmp_path):
    from papc_tpu.train import train

    logs = []
    state, history = train(
        model_name="pointnet_basic",
        mode="clas",
        max_point=N_POINTS,
        num_classes=NUM_CLASSES,
        num_parts=NUM_PARTS,
        learning_rate=1e-3,
        weight_decay=1e-4,
        epoch_num=3,
        batchsize=16,
        info_iter=2,
        save_iter=2,
        path=dataset,
        model_dir=str(tmp_path / "model"),
        log=logs.append,
    )
    assert history[-1]["val_loss"] < history[0]["val_loss"] * 1.5
    assert history[-1]["val_metric"] > 0.3  # separable classes: learns fast
    # checkpoint written for epochs 0 and 2
    assert os.path.isdir(tmp_path / "model" / "pointnet_basic_0")
    assert os.path.isdir(tmp_path / "model" / "pointnet_basic_2")
    assert any("accuracy" in line for line in logs)


def test_train_seg_runs(dataset, tmp_path):
    from papc_tpu.train import train

    state, history = train(
        model_name="pointnet_basic",
        mode="seg",
        max_point=N_POINTS,
        num_classes=NUM_CLASSES,
        num_parts=NUM_PARTS,
        epoch_num=1,
        batchsize=16,
        info_iter=10,
        save_iter=5,
        path=dataset,
        model_dir=str(tmp_path / "model"),
        log=lambda s: None,
    )
    assert np.isfinite(history[-1]["val_loss"])
    assert 0.0 <= history[-1]["val_metric"] <= 1.0


def test_checkpoint_roundtrip(dataset, tmp_path):
    import jax
    import jax.numpy as jnp

    from papc_tpu.data import ShapeNetLoader
    from papc_tpu.models import init_model
    from papc_tpu.train import (
        create_train_state,
        restore_checkpoint,
        save_checkpoint,
    )

    spec = init_model("pointnet_basic", "clas", NUM_CLASSES,
                      max_point=N_POINTS)
    loader = ShapeNetLoader(dataset, "val", N_POINTS, 8)
    batch = next(iter(loader()))._asdict()
    state = create_train_state(spec, jax.random.PRNGKey(0), batch)
    path = save_checkpoint(state, str(tmp_path), "m", 0)

    state2 = create_train_state(spec, jax.random.PRNGKey(1), batch)
    state2 = restore_checkpoint(state2, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padded_final_batch_static_shapes(dataset):
    from papc_tpu.data import ShapeNetLoader

    loader = ShapeNetLoader(dataset, "val", N_POINTS, batchsize=6)
    batches = list(loader())
    # 8 samples / bs 6 -> 2 batches, second padded
    assert len(batches) == 2
    assert batches[0].points.shape == batches[1].points.shape
    assert batches[1].mask.sum() == 2


def test_evaluate_auto_restores_latest(dataset, tmp_path):
    """--evaluate without an explicit checkpoint must restore the LATEST
    trained checkpoint, and must refuse to score random weights when no
    checkpoint exists (regression: it silently evaluated a fresh init at
    chance accuracy)."""
    import pytest

    from papc_tpu.train import evaluate, train

    with pytest.raises(FileNotFoundError):
        evaluate(
            model_name="pointnet_basic", mode="clas", max_point=N_POINTS,
            num_classes=NUM_CLASSES, batchsize=16, path=dataset,
            model_dir=str(tmp_path / "nothing_here"), log=lambda s: None,
        )

    train(
        model_name="pointnet_basic", mode="clas", max_point=N_POINTS,
        num_classes=NUM_CLASSES, num_parts=NUM_PARTS, learning_rate=1e-3,
        weight_decay=1e-4, epoch_num=3, batchsize=16, info_iter=100,
        save_iter=2, path=dataset, model_dir=str(tmp_path / "model"),
        log=lambda s: None,
    )
    logs = []
    result = evaluate(
        model_name="pointnet_basic", mode="clas", max_point=N_POINTS,
        num_classes=NUM_CLASSES, batchsize=16, path=dataset,
        model_dir=str(tmp_path / "model"), log=logs.append,
    )
    assert any("pointnet_basic_2" in line for line in logs)
    # a restored trained model scores far above chance (1/NUM_CLASSES)
    assert result["accuracy"] > 2.0 / NUM_CLASSES
