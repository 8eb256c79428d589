"""Target assignment tests (create_target_np + TargetAssigner)."""

import numpy as np

from papc_tpu.detect.anchors import AnchorGeneratorStride
from papc_tpu.detect.box_coder import GroundBox3dCoder
from papc_tpu.detect.similarity import (
    DistanceSimilarity,
    NearestIouSimilarity,
    RotateIouSimilarity,
)
from papc_tpu.detect.target import TargetAssigner, create_target_np


def make_assigner(similarity=None, positive_fraction=None):
    gen = AnchorGeneratorStride(
        sizes=[1.6, 3.9, 1.56],
        anchor_strides=[1.0, 1.0, 0.0],
        anchor_offsets=[0.5, 0.5, -1.0],
        rotations=[0, np.pi / 2],
        match_threshold=0.6,
        unmatch_threshold=0.45,
    )
    return TargetAssigner(
        box_coder=GroundBox3dCoder(),
        anchor_generators=[gen],
        region_similarity_calculator=similarity or NearestIouSimilarity(),
        positive_fraction=positive_fraction,
    )


def test_generate_anchors_shapes():
    assigner = make_assigner()
    ret = assigner.generate_anchors([1, 8, 8])
    assert ret["anchors"].shape == (1, 8, 8, 2, 7)
    assert ret["matched_thresholds"].shape == (128,)
    assert assigner.num_anchors_per_location == 2


def test_assign_perfect_match_is_positive():
    assigner = make_assigner()
    ret = assigner.generate_anchors([1, 8, 8])
    anchors = ret["anchors"].reshape(-1, 7)
    # GT exactly equal to one anchor -> that anchor positive, target 0
    gt = anchors[10:11].copy()
    out = assigner.assign(
        anchors, gt,
        matched_thresholds=ret["matched_thresholds"],
        unmatched_thresholds=ret["unmatched_thresholds"],
        gt_classes=np.array([1], np.int32),
        rng=np.random.RandomState(0),
    )
    assert out["labels"][10] == 1
    np.testing.assert_allclose(out["bbox_targets"][10], 0.0, atol=1e-6)
    assert out["bbox_outside_weights"][10] == 1.0
    # anchors far away are background
    assert out["labels"][100] == 0


def test_assign_no_gt_all_background():
    assigner = make_assigner()
    ret = assigner.generate_anchors([1, 4, 4])
    anchors = ret["anchors"].reshape(-1, 7)
    out = assigner.assign(
        anchors, np.zeros((0, 7), np.float32),
        matched_thresholds=ret["matched_thresholds"],
        unmatched_thresholds=ret["unmatched_thresholds"],
        rng=np.random.RandomState(0),
    )
    assert (out["labels"] == 0).all()
    assert (out["bbox_targets"] == 0).all()


def test_force_match_low_iou_gt():
    """Every GT gets at least one positive anchor even below threshold."""
    assigner = make_assigner()
    ret = assigner.generate_anchors([1, 8, 8])
    anchors = ret["anchors"].reshape(-1, 7)
    # a small GT with low IoU vs every anchor
    gt = np.array([[3.2, 3.2, -1.0, 0.5, 0.5, 0.5, 0.0]], np.float32)
    out = assigner.assign(
        anchors, gt,
        matched_thresholds=ret["matched_thresholds"],
        unmatched_thresholds=ret["unmatched_thresholds"],
        gt_classes=np.array([2], np.int32),
        rng=np.random.RandomState(0),
    )
    assert (out["labels"] == 2).sum() >= 1


def test_anchors_mask_prunes():
    assigner = make_assigner()
    ret = assigner.generate_anchors([1, 4, 4])
    anchors = ret["anchors"].reshape(-1, 7)
    mask = np.zeros(len(anchors), bool)
    mask[:8] = True
    gt = anchors[2:3].copy()
    out = assigner.assign(
        anchors, gt, anchors_mask=mask,
        matched_thresholds=ret["matched_thresholds"],
        unmatched_thresholds=ret["unmatched_thresholds"],
        rng=np.random.RandomState(0),
    )
    # pruned anchors come back as ignore (-1)
    assert (out["labels"][~mask] == -1).all()
    assert out["labels"][2] == 1


def test_positive_fraction_subsampling():
    rng = np.random.RandomState(0)
    anchors = np.tile(
        np.array([[0.0, 0, -1, 1.6, 3.9, 1.56, 0]], np.float32), (100, 1)
    )
    gt = anchors[:1].copy()

    out = create_target_np(
        anchors, gt,
        similarity_fn=lambda a, g: np.ones((len(a), len(g)), np.float32),
        box_encoding_fn=lambda b, a: np.zeros((len(b), 7), np.float32),
        matched_threshold=0.6,
        unmatched_threshold=0.45,
        positive_fraction=0.5,
        rpn_batch_size=20,
        rng=rng,
    )
    assert (out["labels"] > 0).sum() <= 10


def test_similarity_calculators_smoke():
    boxes = np.array(
        [[0.0, 0, 1.6, 3.9, 0.0], [5.0, 5, 1.6, 3.9, 0.5]], np.float32
    )
    for sim in (
        RotateIouSimilarity(),
        NearestIouSimilarity(),
        DistanceSimilarity(distance_norm=2.0),
    ):
        m = sim.compare(boxes, boxes)
        assert m.shape == (2, 2)
        assert m[0, 0] >= m[0, 1]


def test_multiclass_assign_per_generator_thresholds():
    """Three per-class generators (the 3-class experiment's layout):
    anchors concatenate with per-anchor thresholds, and a GT of each
    class turns its own class's exactly-matching anchor positive with
    the right label (1=Car, 2=Pedestrian, 3=Cyclist)."""
    gens = [
        AnchorGeneratorStride(
            sizes=[1.6, 3.9, 1.56], anchor_strides=[1.0, 1.0, 0.0],
            anchor_offsets=[0.5, 0.5, -1.0], rotations=[0, np.pi / 2],
            match_threshold=0.6, unmatch_threshold=0.45,
            class_id="Car",
        ),
        AnchorGeneratorStride(
            sizes=[0.6, 0.8, 1.73], anchor_strides=[1.0, 1.0, 0.0],
            anchor_offsets=[0.5, 0.5, -0.6], rotations=[0, np.pi / 2],
            match_threshold=0.5, unmatch_threshold=0.35,
            class_id="Pedestrian",
        ),
        AnchorGeneratorStride(
            sizes=[0.6, 1.76, 1.73], anchor_strides=[1.0, 1.0, 0.0],
            anchor_offsets=[0.5, 0.5, -0.6], rotations=[0, np.pi / 2],
            match_threshold=0.5, unmatch_threshold=0.35,
            class_id="Cyclist",
        ),
    ]
    assigner = TargetAssigner(
        box_coder=GroundBox3dCoder(),
        anchor_generators=gens,
        region_similarity_calculator=NearestIouSimilarity(),
    )
    fmap = [1, 4, 4]
    ret = assigner.generate_anchors(fmap)
    anchors = ret["anchors"].reshape(-1, 7)
    assert assigner.num_anchors_per_location == 6
    A = anchors.shape[0]
    assert A == 4 * 4 * 6
    # thresholds follow their generator through the concat
    mt = ret["matched_thresholds"]
    assert mt.shape == (A,)
    np.testing.assert_allclose(np.unique(mt), [0.5, 0.6])

    # one GT per class, each copied from an anchor OF THAT CLASS.
    # anchors layout: [y, x, 2(rot), 7] per generator, concatenated on
    # the anchor axis -> per-location blocks [car0 car90 ped0 ped90 ...]
    per_loc = anchors.reshape(-1, 6, 7)
    gt = np.stack(
        [per_loc[5, 0], per_loc[9, 2], per_loc[13, 4]]
    ).astype(np.float32)
    out = assigner.assign(
        anchors, gt,
        matched_thresholds=ret["matched_thresholds"],
        unmatched_thresholds=ret["unmatched_thresholds"],
        gt_classes=np.array([1, 2, 3], np.int32),
        rng=np.random.RandomState(0),
    )
    labels = out["labels"].reshape(-1, 6)
    assert labels[5, 0] == 1   # Car anchor matched the Car GT
    assert labels[9, 2] == 2   # Pedestrian anchor
    assert labels[13, 4] == 3  # Cyclist anchor
    # exact matches encode to zero targets
    tgt = out["bbox_targets"].reshape(-1, 6, 7)
    np.testing.assert_allclose(tgt[5, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(tgt[9, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(tgt[13, 4], 0.0, atol=1e-6)
