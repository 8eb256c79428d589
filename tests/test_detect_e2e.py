"""Detection end-to-end: config load → build → short train → predict →
KITTI eval on the synthetic mini dataset."""

import pathlib

import numpy as np
import pytest
import yaml

from papc_tpu.data.synthetic_kitti import write_kitti
from papc_tpu.detect.config import (
    DEFAULT_CONFIG_PATH,
    cfg_from_list,
    cfg_from_yaml_file,
)
from papc_tpu.detect.kitti.create_data import (
    create_groundtruth_database,
    create_kitti_info_file,
    create_reduced_point_cloud,
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    write_kitti(str(root), n_train=6, n_val=2, num_cars=2)
    create_kitti_info_file(
        str(root), imageset_dir=str(pathlib.Path(root) / "ImageSets")
    )
    create_reduced_point_cloud(str(root))
    create_groundtruth_database(str(root), used_classes=["Car"])
    return root


@pytest.fixture(scope="module")
def tiny_cfg(kitti_root, tmp_path_factory):
    """Default config shrunk to a coarse grid for CPU test speed."""
    cfg_dir = tmp_path_factory.mktemp("cfg")
    cfg = yaml.safe_load(open(DEFAULT_CONFIG_PATH))
    cfg["VOXEL_GENERATOR"]["VOXEL_SIZE"] = [1.08, 1.24, 4]
    cfg["VOXEL_GENERATOR"]["MAX_VOXELS"] = 800
    cfg["VOXEL_GENERATOR"]["MAX_NUMBER_OF_POINTS_PER_VOXEL"] = 40
    # grid 64 x 64 -> feature map 32 x 32
    gen = cfg["TARGET_ASSIGNER"]["ANCHOR_GENERATORS"][0][
        "anchor_generator_stride"
    ]
    gen["strides"] = [2.16, 2.48, 0.0]
    gen["offsets"] = [1.08, -38.44, -1.78]
    cfg["MODEL"]["POST_PROCESSING"]["nms_pre_max_size"] = 128
    cfg["MODEL"]["POST_PROCESSING"]["nms_post_max_size"] = 16
    cfg["MODEL"]["POST_PROCESSING"]["nms_score_threshold"] = 0.05
    for reader in ("TRAIN_INPUT_READER", "EVAL_INPUT_READER"):
        cfg[reader]["MAX_NUMBER_OF_VOXELS"] = 800
        cfg[reader]["KITTI_ROOT_PATH"] = str(kitti_root)
        cfg[reader]["BATCH_SIZE"] = 2
    path = cfg_dir / "tiny.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_config_system(tiny_cfg):
    cfg = cfg_from_yaml_file(tiny_cfg)
    assert cfg.MODEL.NUM_CLASS == 1
    assert cfg.VOXEL_GENERATOR.MAX_VOXELS == 800
    cfg_from_list(cfg, ["MODEL.NUM_CLASS", "2",
                        "TRAIN_CONFIG.STEPS", "10"])
    assert cfg.MODEL.NUM_CLASS == 2
    assert cfg.TRAIN_CONFIG.STEPS == 10
    with pytest.raises(AssertionError):
        cfg_from_list(cfg, ["MODEL.NOT_A_KEY", "1"])


def test_base_config_inheritance(tmp_path, tiny_cfg):
    child = tmp_path / "child.yaml"
    child.write_text(
        yaml.safe_dump(
            {
                "_BASE_CONFIG_": tiny_cfg,
                "MODEL": {"NUM_CLASS": 3},
            }
        )
    )
    cfg = cfg_from_yaml_file(str(child))
    assert cfg.MODEL.NUM_CLASS == 3
    # inherited values survive
    assert cfg.VOXEL_GENERATOR.MAX_VOXELS == 800


def test_detection_train_and_eval(kitti_root, tiny_cfg, tmp_path):
    from papc_tpu.detect.train import train

    logs = []
    state, annos = train(
        cfg_file=tiny_cfg,
        model_dir=str(tmp_path / "model"),
        max_steps=6,
        display_step=2,
        eval_on_finish=True,
        log=logs.append,
    )
    assert int(state.step) == 6
    # pipeline.config copied for reproducibility
    assert (tmp_path / "model" / "pipeline.config").exists()
    # checkpoint written + indexed
    assert (tmp_path / "model" / "checkpoints.json").exists()
    # loss logged
    assert any("loss" in line for line in logs)
    # eval produced one anno per val frame
    assert annos is not None and len(annos) == 2

    # evaluator runs on (gt, dt) pairs
    import pickle

    from papc_tpu.eval.kitti_eval import get_official_eval_result

    with open(kitti_root / "kitti_infos_val.pkl", "rb") as f:
        infos = pickle.load(f)
    gt_annos = [info["annos"] for info in infos]
    result = get_official_eval_result(gt_annos, annos, "Car")
    assert "Car AP@0.70" in result
    assert "3d   AP:" in result


def test_detection_train_scan_steps(kitti_root, tiny_cfg, tmp_path):
    """TRAIN_CONFIG.SCAN_STEPS=2: K steps run per jitted call
    (lax.scan); an odd max_steps exercises the < K leftover fallback
    to single stepping."""
    from papc_tpu.detect.train import train

    logs = []
    state, _ = train(
        cfg_file=tiny_cfg,
        model_dir=str(tmp_path / "model"),
        cfg_overrides=["TRAIN_CONFIG.SCAN_STEPS", "2"],
        max_steps=5,
        display_step=2,
        eval_on_finish=False,
        log=logs.append,
    )
    assert int(state.step) == 5
    assert any("loss" in line for line in logs)
    assert (tmp_path / "model" / "checkpoints.json").exists()


def test_detection_train_device_pillarize(kitti_root, tiny_cfg, tmp_path):
    """DEVICE_PILLARIZE=true: raw clouds ship to device; pillarization
    happens inside the jitted step via ops.voxelize."""
    import yaml as _yaml

    cfg = _yaml.safe_load(open(tiny_cfg))
    cfg["MODEL"]["DEVICE_PILLARIZE"] = True
    for reader in ("TRAIN_INPUT_READER", "EVAL_INPUT_READER"):
        cfg[reader]["MAX_POINTS_PER_FRAME"] = 4096
    path = tmp_path / "dv.yaml"
    path.write_text(_yaml.safe_dump(cfg))

    from papc_tpu.detect.train import train

    state, annos = train(
        cfg_file=str(path),
        model_dir=str(tmp_path / "model"),
        max_steps=4,
        display_step=2,
        eval_on_finish=True,
        log=lambda s: None,
    )
    assert int(state.step) == 4
    assert annos is not None and len(annos) == 2


def _make_annos(rng, n_frames=10, n_boxes=5):
    """In-memory GT annos with enough boxes for dense recall sampling
    (the official 41-point threshold selection needs ~40+ GT to saturate
    the recall axis — with a handful of GT the 11-point AP legitimately
    caps low)."""
    annos = []
    for _ in range(n_frames):
        x = rng.uniform(-20, 20, n_boxes)
        z = rng.uniform(10, 60, n_boxes)
        annos.append(
            {
                "name": np.array(["Car"] * n_boxes),
                "truncated": np.zeros(n_boxes),
                "occluded": np.zeros(n_boxes, np.int64),
                "alpha": rng.uniform(-np.pi, np.pi, n_boxes),
                "bbox": np.stack(
                    [
                        100 + 50 * np.arange(n_boxes),
                        100 * np.ones(n_boxes),
                        140 + 50 * np.arange(n_boxes),
                        160 * np.ones(n_boxes),
                    ],
                    axis=1,
                ).astype(np.float64),
                "dimensions": np.tile([3.9, 1.56, 1.6], (n_boxes, 1)),
                "location": np.stack(
                    [x, np.full(n_boxes, 1.5), z], axis=1
                ),
                "rotation_y": rng.uniform(-np.pi, np.pi, n_boxes),
                "score": np.zeros(n_boxes),
            }
        )
    return annos


def test_eval_perfect_predictions_give_100(rng):
    """Feeding the GT back as detections must score ~100 mAP."""
    from papc_tpu.eval.kitti_eval import get_official_eval_result

    gt_annos = _make_annos(rng)
    dt_annos = []
    for gt in gt_annos:
        dt = {k: np.copy(v) for k, v in gt.items()}
        dt["score"] = np.ones(len(gt["name"]))
        dt_annos.append(dt)
    result, data = get_official_eval_result(
        gt_annos, dt_annos, "Car", return_data=True
    )
    # moderate difficulty, 0.7 overlap
    assert data[(0, "0.7")]["3d"][1] > 95.0
    assert data[(0, "0.7")]["bbox"][1] > 95.0
    assert data[(0, "0.7")]["bev"][1] > 95.0


def test_eval_no_detections_give_0(rng):
    from papc_tpu.eval.kitti_eval import get_official_eval_result

    gt_annos = _make_annos(rng, n_frames=4)
    from papc_tpu.detect.kitti.common import empty_result_anno

    dt_annos = [empty_result_anno() for _ in gt_annos]
    result, data = get_official_eval_result(
        gt_annos, dt_annos, "Car", return_data=True
    )
    assert data[(0, "0.7")]["3d"][1] == 0.0


def test_burnin_lr_schedule():
    """ExponentialDecayWithBurnin (reference learning_schedules.py:89-116,
    intended semantics): burnin LR until burnin_steps, then staircase
    exponential decay of the base LR."""
    from papc_tpu.detect.builders import build_lr_schedule
    from papc_tpu.detect.config import Config

    opt_cfg = Config.wrap({
        "learning_rate": {
            "name": "exponential_decay_with_burnin",
            "decay_steps": 10,
            "decay_factor": 0.5,
            "burnin_learning_rate": 1e-4,
            "burnin_steps": 5,
        }
    })
    sched = build_lr_schedule(opt_cfg, base_lr=1e-2)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(4)) == pytest.approx(1e-4)
    assert float(sched(5)) == pytest.approx(1e-2)
    assert float(sched(10)) == pytest.approx(5e-3)
    assert float(sched(25)) == pytest.approx(2.5e-3)
    # burnin_learning_rate == 0 -> burnin holds base_lr
    opt_cfg.learning_rate.burnin_learning_rate = 0.0
    sched0 = build_lr_schedule(opt_cfg, base_lr=1e-2)
    assert float(sched0(0)) == pytest.approx(1e-2)


def test_coco_eval_perfect_predictions(rng):
    """COCO-style overlap-sweep AP (reference eval.py:856-931): perfect
    predictions score near-100 and the report carries the sweep header."""
    from papc_tpu.eval.kitti_eval import get_coco_eval_result

    gt_annos = _make_annos(rng)
    dt_annos = []
    for gt in gt_annos:
        dt = {k: np.copy(v) for k, v in gt.items()}
        dt["score"] = np.ones(len(gt["name"]))
        dt_annos.append(dt)
    result = get_coco_eval_result(gt_annos, dt_annos, "Car")
    assert "coco" in result and "AP@0.50:0.05:0.95" in result
    # parse the 3d line: "3d   AP:xx.xx, yy.yy, zz.zz"
    line = [l for l in result.splitlines() if l.startswith("3d")][0]
    vals = [float(v) for v in line.split("AP:")[1].split(",")]
    assert vals[1] > 90.0, result


def test_detection_resume_from_checkpoint(tiny_cfg, tmp_path):
    """Stack B resume contract (reference train.py:68-89,132-136): a
    second train() against the same model_dir restores params/opt/step
    from checkpoints.json and continues to the new step target."""
    from papc_tpu.detect.train import train

    mdir = str(tmp_path / "model")
    state1, _ = train(
        cfg_file=tiny_cfg, model_dir=mdir, max_steps=4,
        display_step=10**6, eval_on_finish=False, log=lambda s: None,
    )
    assert int(state1.step) == 4
    logs = []
    state2, _ = train(
        cfg_file=tiny_cfg, model_dir=mdir, max_steps=8,
        display_step=10**6, eval_on_finish=False, log=logs.append,
    )
    assert int(state2.step) == 8
    assert any("resumed from step 4" in str(line) for line in logs)


def test_3class_config_builds_and_trains(tmp_path):
    """The shipped 3-class experiment (pointpillars_kitti_3class.yaml):
    three per-class anchor generators concatenate (6 anchors/location,
    per-anchor matched/unmatched thresholds), NUM_CLASS=3 heads build,
    a train step runs with 3-class labels, and predict routes through
    the multiclass (per-class NMS) branch the config turns on."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from papc_tpu.detect import builders
    from papc_tpu.detect.config import cfg_from_yaml_file
    from papc_tpu.detect.train import (
        make_detection_train_step,
        make_predict_step,
    )
    from papc_tpu.train.trainer import TrainState

    cfg_path = (
        pathlib.Path(__file__).parent.parent
        / "papc_tpu/detect/configs/pointpillars_kitti_3class.yaml"
    )
    cfg = cfg_from_yaml_file(str(cfg_path))
    assert list(cfg.CLASS_NAMES) == ["Car", "Pedestrian", "Cyclist"]

    # shrink to a tiny grid for CI
    cfg.VOXEL_GENERATOR.VOXEL_SIZE = [4.32, 4.96, 4]
    cfg.VOXEL_GENERATOR.MAX_VOXELS = 32
    for g in cfg.TARGET_ASSIGNER.ANCHOR_GENERATORS:
        gen = g.anchor_generator_stride
        gen.strides = [8.64, 9.92, 0.0]
        gen.offsets = [4.32, -34.72, gen.offsets[2]]

    vg = builders.build_voxel_generator(cfg.VOXEL_GENERATOR)
    coder = builders.build_box_coder(cfg.BOX_CODER)
    ta = builders.build_target_assigner(cfg.TARGET_ASSIGNER, coder)
    model = builders.build_network(cfg, vg, ta)
    loss_cfg = builders.build_loss_config(cfg, ta)
    predict_cfg = builders.build_predict_config(cfg, ta)
    assert predict_cfg.multiclass_nms
    assert predict_cfg.num_class == 3
    assert ta.num_anchors_per_location == 6

    grid = vg.grid_size
    fmap = [1, grid[1] // 2, grid[0] // 2]
    ret = ta.generate_anchors(fmap)
    anchors_np = ret["anchors"].reshape(-1, 7)
    A = anchors_np.shape[0]
    assert A == fmap[1] * fmap[2] * 6
    # per-anchor thresholds follow their generator
    np.testing.assert_allclose(
        np.unique(ret["matched_thresholds"]), [0.5, 0.6])

    rng = np.random.RandomState(0)
    B, V, P = 2, 32, 8
    batch = {
        "voxels": jnp.asarray(rng.randn(B, V, P, 4), jnp.float32),
        "num_points": jnp.asarray(
            rng.randint(1, P, (B, V)), jnp.int32),
        "coordinates": jnp.asarray(
            np.stack([np.zeros((B, V)),
                      rng.randint(0, grid[1], (B, V)),
                      rng.randint(0, grid[0], (B, V))], -1),
            jnp.int32),
        "anchors": jnp.asarray(np.tile(anchors_np[None], (B, 1, 1))),
        "labels": jnp.asarray(rng.randint(-1, 4, (B, A)), jnp.int32),
        "reg_targets": jnp.asarray(
            rng.randn(B, A, 7) * 0.1, jnp.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["voxels"], batch["num_points"],
        batch["coordinates"], train=False,
    )
    # 3-class head widths (6 anchors/loc)
    out = model.apply(variables, batch["voxels"], batch["num_points"],
                      batch["coordinates"], train=False)
    assert out["cls_preds"].shape[-1] == 6 * 3

    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=builders.build_optimizer(cfg.TRAIN_CONFIG.OPTIMIZER),
    )
    step, init_rm = make_detection_train_step(model, loss_cfg)
    state, metrics, _ = step(state, batch, init_rm())
    assert np.isfinite(float(metrics["loss"]))

    predict_step = make_predict_step(model, predict_cfg, coder)
    dets = predict_step(state, batch)
    post = predict_cfg.nms_post_max_size
    assert dets["box3d_lidar"].shape == (B, post, 7)
    assert dets["label_preds"].shape == (B, post)
    # class labels stay in range
    lp = np.asarray(dets["label_preds"])[np.asarray(dets["valid"])]
    assert lp.size == 0 or (0 <= lp.min() and lp.max() <= 2)
