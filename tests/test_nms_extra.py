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
