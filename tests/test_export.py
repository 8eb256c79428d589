"""StableHLO export/reload roundtrips (papc_tpu.export) — the serving
analog of the reference's TensorRT staging helpers
(``data/preprocess.py:369-502``)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_classifier_export_roundtrip(tmp_path, jnp):
    import jax

    from papc_tpu import export as ex
    from papc_tpu.models import init_model

    spec = init_model("pointnet_basic", "clas", num_classes=16, max_point=64)
    pts = jnp.asarray(np.random.RandomState(0).randn(4, 64, 3), jnp.float32)
    variables = spec.model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts,
        train=False,
    )
    path = str(tmp_path / "pointnet_basic.stablehlo")
    data = ex.export_classifier(
        spec,
        variables,
        batch_size=4,
        max_point=64,
        path=path,
        platforms=("cpu",),
    )
    assert len(data) > 0
    # reload from disk (bytes path covered implicitly: same serialization)
    fn = ex.load_exported(path)
    got = np.asarray(fn(pts))
    want = np.asarray(spec.model.apply(variables, pts, train=False))
    assert got.shape == (4, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_exported_artifact_is_python_free(tmp_path, jnp):
    """The artifact must replay with no papc_tpu model code: only bytes +
    jax.export.deserialize."""
    import jax

    from papc_tpu import export as ex
    from papc_tpu.models import init_model

    spec = init_model("pointnet_basic", "clas", num_classes=4, max_point=32)
    pts = jnp.asarray(np.random.RandomState(1).randn(2, 32, 3), jnp.float32)
    variables = spec.model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pts,
        train=False,
    )
    data = ex.export_classifier(
        spec, variables, batch_size=2, max_point=32, platforms=("cpu",)
    )
    from jax import export as jexport

    out = jexport.deserialize(data).call(pts)
    assert np.asarray(out).shape == (2, 4)


def test_detector_predict_export(tmp_path, jnp):
    """Full PointPillars inference step exports and replays bit-stable."""
    import jax
    import yaml

    from papc_tpu import export as ex
    from papc_tpu.detect import builders
    from papc_tpu.detect.config import DEFAULT_CONFIG_PATH, Config
    from papc_tpu.detect.train import make_predict_step
    from papc_tpu.train.trainer import TrainState

    raw = yaml.safe_load(open(DEFAULT_CONFIG_PATH))
    # tiny grid so the CPU test stays fast
    raw["VOXEL_GENERATOR"]["POINT_CLOUD_RANGE"] = [0, -3.2, -3, 6.4, 3.2, 1]
    raw["VOXEL_GENERATOR"]["VOXEL_SIZE"] = [0.2, 0.2, 4]
    raw["VOXEL_GENERATOR"]["MAX_VOXELS"] = 200
    raw["VOXEL_GENERATOR"]["MAX_NUMBER_OF_POINTS_PER_VOXEL"] = 20
    raw["MODEL"]["PILLAR_FEATURE_EXTRACTOR"]["num_filters"] = [16]
    raw["MODEL"]["BACKBONE"]["num_filters"] = [16, 16, 16]
    raw["MODEL"]["BACKBONE"]["num_upsample_filters"] = [16, 16, 16]
    cfg = Config.wrap(raw)

    vg = builders.build_voxel_generator(cfg.VOXEL_GENERATOR)
    coder = builders.build_box_coder(cfg.BOX_CODER)
    ta = builders.build_target_assigner(cfg.TARGET_ASSIGNER, coder)
    model = builders.build_network(cfg, vg, ta)
    predict_cfg = builders.build_predict_config(cfg, ta)

    rs = np.random.RandomState(0)
    Bd, V, P = 1, 200, 20
    grid = vg.grid_size
    anchors = ta.generate_anchors(
        [1, grid[1] // 2, grid[0] // 2]
    )["anchors"].reshape(-1, 7)
    batch = {
        "voxels": jnp.asarray(rs.randn(Bd, V, P, 4), jnp.float32),
        "num_points": jnp.asarray(rs.randint(1, P, (Bd, V)), jnp.int32),
        "coordinates": jnp.asarray(
            np.stack(
                [
                    np.zeros((Bd, V)),
                    rs.randint(0, grid[1], (Bd, V)),
                    rs.randint(0, grid[0], (Bd, V)),
                ],
                -1,
            ),
            jnp.int32,
        ),
        "anchors": jnp.asarray(np.tile(anchors[None], (Bd, 1, 1)), jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["voxels"],
        batch["num_points"],
        batch["coordinates"],
        train=False,
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=builders.build_optimizer(cfg.TRAIN_CONFIG.OPTIMIZER),
    )
    predict_step = make_predict_step(model, predict_cfg, coder)

    path = str(tmp_path / "pointpillars_predict.stablehlo")
    ex.export_detector_predict(
        predict_step, state, batch, path=path, platforms=("cpu",)
    )
    fn = ex.load_exported(path)
    got = fn(batch)
    want = predict_step(state, batch)
    for k in ("box3d_lidar", "scores", "label_preds", "valid"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5
        )
