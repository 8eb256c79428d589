"""Soft-NMS and multiclass NMS tests."""

import numpy as np

from papc_tpu.detect.nms_extra import (
    multiclass_nms,
    soft_nms,
    standard_nms_func,
)


def test_soft_nms_hard_mode_matches_greedy():
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],  # heavy overlap with box0
            [50, 50, 60, 60, 0.7],
        ],
        np.float32,
    )
    kept, n = soft_nms(boxes, Nt=0.3, method=0)
    assert n == 2
    np.testing.assert_allclose(kept[:, 4], [0.9, 0.7])


def test_soft_nms_gaussian_decays_not_drops():
    boxes = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],
            [50, 50, 60, 60, 0.7],
        ],
        np.float32,
    )
    kept, n = soft_nms(boxes, sigma=0.5, method=2, threshold=0.01)
    assert n == 3  # decayed, not removed
    assert kept[2, 4] < 0.8  # the overlapped box score fell (sorted pos)


def test_multiclass_nms_per_class():
    # two classes sharing class-agnostic boxes
    boxes = np.array(
        [
            [[0.0, 0, 4, 4, 0.0]],
            [[0.2, 0, 4, 4, 0.0]],
            [[20.0, 20, 4, 4, 0.0]],
        ],
        np.float32,
    )
    scores = np.array(
        [[0.9, 0.1], [0.8, 0.85], [0.2, 0.7]], np.float32
    )
    sel = multiclass_nms(
        standard_nms_func(rotated=True),
        boxes,
        scores,
        score_thresh=0.3,
        iou_threshold=0.5,
    )
    assert len(sel) == 2
    # class 0: boxes 0,1 overlap -> keep 0 only (0.9 > 0.8); box2 below thresh
    np.testing.assert_array_equal(np.sort(sel[0]), [0])
    # class 1: box1 (0.85) suppresses box0? box0 below 0.3 thresh; keep 1, 2
    np.testing.assert_array_equal(np.sort(sel[1]), [1, 2])


def test_multiclass_nms_empty_class():
    boxes = np.zeros((3, 1, 5), np.float32)
    scores = np.array([[0.9, 0.0], [0.8, 0.0], [0.1, 0.0]], np.float32)
    sel = multiclass_nms(
        standard_nms_func(rotated=True), boxes, scores, score_thresh=0.5
    )
    assert sel[1] is None


def test_predict_multiclass_two_class_end_to_end():
    """predict_multiclass (the wired consumer of multiclass_nms):
    two-class synthetic scene -> per-class selections, class labels,
    direction fix, static [B, post] padding."""
    from papc_tpu.detect.detector import PredictConfig, predict_multiclass

    cfg = PredictConfig(
        num_class=2,
        multiclass_nms=True,
        use_rotate_nms=True,
        use_direction_classifier=True,
        nms_post_max_size=4,
        nms_score_threshold=0.3,
        nms_iou_threshold=0.5,
    )
    # three boxes: 0 and 1 overlap heavily, 2 is far away
    boxes = np.array(
        [
            [
                [0.0, 0.0, -1, 4, 4, 2, 0.5],
                [0.2, 0.0, -1, 4, 4, 2, -0.5],
                [20.0, 20.0, -1, 4, 4, 2, 0.5],
            ]
        ],
        np.float32,
    )
    scores = np.array(
        [[[0.9, 0.1], [0.8, 0.85], [0.2, 0.7]]], np.float32
    )
    dirs = np.array([[0, 1, 1]], np.int32)
    out = predict_multiclass(boxes, scores, dirs, cfg)
    v = out["valid"][0]
    # class 0 keeps box 0; class 1 keeps boxes 1 and 2
    assert v.sum() == 3
    np.testing.assert_array_equal(out["label_preds"][0][v], [0, 1, 1])
    np.testing.assert_allclose(
        out["scores"][0][v], [0.9, 0.85, 0.7], rtol=1e-6
    )
    # direction fix: box0 yaw 0.5>0 dir 0 -> +pi; box1 yaw -0.5, dir 1 -> +pi
    got_yaws = out["box3d_lidar"][0][v][:, -1]
    np.testing.assert_allclose(
        got_yaws, [0.5 + np.pi, -0.5 + np.pi, 0.5], rtol=1e-6
    )
    # padding stays zero/invalid
    assert not out["valid"][0][3:].any()


def test_multiclass_nms_config_roundtrip(tmp_path):
    """The yaml key routes build_predict_config -> make_predict_step to
    the host multiclass path (reference PREDICT.multiclass_nms)."""
    import yaml

    from papc_tpu.detect import builders
    from papc_tpu.detect.config import (
        DEFAULT_CONFIG_PATH,
        cfg_from_yaml_file,
    )

    base = yaml.safe_load(open(DEFAULT_CONFIG_PATH))
    child = tmp_path / "mc.yaml"
    child.write_text(yaml.safe_dump(base))
    cfg = cfg_from_yaml_file(str(child))
    coder = builders.build_box_coder(cfg.BOX_CODER)
    ta = builders.build_target_assigner(cfg.TARGET_ASSIGNER, coder)
    pc = builders.build_predict_config(cfg, ta)
    assert pc.multiclass_nms is False  # default off, like the reference
    cfg.MODEL.POST_PROCESSING.multiclass_nms = True
    pc2 = builders.build_predict_config(cfg, ta)
    assert pc2.multiclass_nms is True
    # reference's other spelling is accepted too
    del cfg.MODEL.POST_PROCESSING["multiclass_nms"]
    cfg.MODEL.POST_PROCESSING.use_multi_class_nms = True
    assert builders.build_predict_config(cfg, ta).multiclass_nms is True
