"""Registry × loader matrix: EVERY (model, mode) combo the registry can
construct must be trainable through the public ``make_dataloader`` path
— no special-cased model names.

Guards the drift class the reference has: its Conv2D PointNet is
constructible through ``init_model`` but unreachable through the loader
table (``PAPC/datasets/dataloader.py:5-40`` lists model names by hand).
Here the dispatch derives the loader family from the registry's
``input_kind``, and this test proves the property by iterating
``registry_combos()`` itself.
"""

import jax
import numpy as np
import pytest

from papc_tpu.data.dispatch import make_dataloader
from papc_tpu.data.synthetic import write_shapenet_h5
from papc_tpu.models.registry import init_model, registry_combos
from papc_tpu.train.trainer import (
    _as_batch_dict,
    create_train_state,
    make_train_step,
)

# power of two (kd loaders need log2-depth trees) and >= the MSG ball
# queries' largest nsample (128)
N_POINTS = 128
NUM_CLASSES = 4
NUM_PARTS = 8
BATCH = 8


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("shapenet_matrix")
    write_shapenet_h5(
        str(path),
        n_train=BATCH,
        n_test=BATCH,
        n_val=BATCH,
        n_points=N_POINTS,
        num_classes=NUM_CLASSES,
        num_parts=NUM_PARTS,
    )
    return str(path)


@pytest.mark.parametrize("name,mode", registry_combos())
def test_every_registry_combo_trains_through_dispatch(
    dataset, name, mode
):
    loader = make_dataloader(
        name, N_POINTS, BATCH, path=dataset, mode1=mode, mode2="train"
    )
    spec = init_model(
        name, mode, NUM_CLASSES, NUM_PARTS, max_point=N_POINTS
    )
    batch = _as_batch_dict(spec, next(iter(loader())))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(spec, rng, batch)
    train_step, _eval_step = make_train_step(spec, NUM_PARTS)
    state, loss, metric = train_step(state, batch, rng)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metric) <= 1.0


def test_unknown_model_rejected(dataset):
    with pytest.raises(SystemExit):
        make_dataloader("nope", N_POINTS, BATCH, path=dataset)


def test_bad_mode_rejected(dataset):
    with pytest.raises(SystemExit):
        make_dataloader(
            "pointnet", N_POINTS, BATCH, path=dataset, mode1="detect"
        )
