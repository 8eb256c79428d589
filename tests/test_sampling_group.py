"""Group sampling, global-rot placement, group noise, and frustum crop —
the GT-DB sampler paths beyond the shipped config (reference
``sample_ops.py:161-346``, ``preprocess.py:104-129,498-686``)."""

import numpy as np
import pytest

from papc_tpu.data.synthetic_kitti import default_calib
from papc_tpu.detect import box_np
from papc_tpu.detect.kitti.augment import (
    mask_points_in_corners,
    noise_per_object_,
    random_crop_frustum,
)
from papc_tpu.detect.kitti.sampling import DataBaseSamplerV2


def _pairwise_dist(a, b):
    return float(np.linalg.norm(a[:2] - b[:2]))


def test_group_noise_moves_group_rigidly(rng):
    # two boxes in one group + one lone box far away
    gt = np.array(
        [
            [10.0, 0.0, -1.5, 1.6, 3.9, 1.56, 0.3],
            [10.0, 5.0, -1.5, 1.6, 3.9, 1.56, 1.1],
            [40.0, -20.0, -1.5, 1.6, 3.9, 1.56, 0.0],
        ],
        np.float64,
    )
    group_ids = np.array([7, 7, 9])
    before = gt.copy()
    noise_per_object_(
        gt,
        None,
        np.ones(3, bool),
        rotation_perturb=[-0.8, 0.8],
        center_noise_std=[1.0, 1.0, 0.0],
        num_try=200,
        group_ids=group_ids,
        rng=rng,
    )
    # the two group members must move: same rot delta, rigid distance
    d_rot = gt[:, 6] - before[:, 6]
    assert d_rot[0] == pytest.approx(d_rot[1], abs=1e-9)
    assert _pairwise_dist(gt[0], gt[1]) == pytest.approx(
        _pairwise_dist(before[0], before[1]), abs=1e-6
    )
    # and at least one group actually moved (noise is large, 200 tries)
    assert np.abs(gt[:2] - before[:2]).max() > 1e-3


def test_global_rot_range_places_on_circle(rng):
    # reference sample_class_v2 semantics: rotation_perturb=0,
    # center_noise_std=0, only the circle angle changes
    gt = np.array([[10.0, 10.0, -1.5, 1.6, 3.9, 1.56, 0.5]], np.float64)
    r_before = np.hypot(gt[0, 0], gt[0, 1])
    yaw_before = gt[0, 6]
    grot_before = np.arctan2(gt[0, 0], gt[0, 1])
    noise_per_object_(
        gt,
        None,
        np.ones(1, bool),
        rotation_perturb=0,
        center_noise_std=0,
        global_random_rot_range=[0.78, 2.35],
        num_try=50,
        rng=rng,
    )
    r_after = np.hypot(gt[0, 0], gt[0, 1])
    grot_after = np.arctan2(gt[0, 0], gt[0, 1])
    assert r_after == pytest.approx(r_before, abs=1e-9)
    assert 0.78 - 1e-6 <= grot_after <= 2.35 + 1e-6
    # yaw tracks the circle displacement
    assert gt[0, 6] - yaw_before == pytest.approx(
        grot_after - grot_before, abs=1e-9
    )


def test_group_noise_respects_collisions(rng):
    # a giant box covers every reachable candidate position: no trial can
    # succeed, so the group must stay exactly in place
    group = np.array(
        [
            [0.0, 0.0, -1.5, 1.0, 1.0, 1.56, 0.0],
            [0.0, 2.0, -1.5, 1.0, 1.0, 1.56, 0.0],
        ]
    )
    blocker = np.array([[0.0, 1.0, -1.5, 40.0, 40.0, 1.56, 0.0]])
    gt = np.concatenate([group, blocker], axis=0)
    group_ids = np.array([0, 0, 1])
    before = gt.copy()
    noise_per_object_(
        gt,
        None,
        np.array([True, True, False]),
        rotation_perturb=[-0.2, 0.2],
        center_noise_std=[2.0, 2.0, 0.0],
        num_try=30,
        group_ids=group_ids,
        rng=rng,
    )
    np.testing.assert_allclose(gt[:2], before[:2])


def test_frustum_mask_matches_projection(rng):
    P2, rect, Tr = default_calib()
    pts = np.stack(
        [
            rng.uniform(5, 40, 500),
            rng.uniform(-10, 10, 500),
            rng.uniform(-2, 0.5, 500),
        ],
        axis=1,
    )
    # full-image frustum: mask == "projects inside the image"
    img_bbox = np.array([[0.0, 0.0, 1242.0, 375.0]])
    C, R, T = box_np.projection_matrix_to_CRT_kitti(P2)
    frustum = box_np.get_frustum_batch(img_bbox, C)
    frustum -= T
    frustum = np.einsum("ij,akj->aki", np.linalg.inv(R), frustum)
    frustum = box_np.camera_to_lidar(frustum, rect, Tr)
    mask = mask_points_in_corners(pts, frustum).reshape(-1)

    cam = box_np.lidar_to_camera(pts, rect, Tr)
    uv = box_np.project_to_image(cam, P2)
    expected = (
        (uv[:, 0] > 0) & (uv[:, 0] < 1242)
        & (uv[:, 1] > 0) & (uv[:, 1] < 375)
        & (cam[:, 2] > 0)
    )
    assert (mask == expected).mean() > 0.99  # boundary jitter only


def test_random_crop_frustum_shapes(rng):
    P2, rect, Tr = default_calib()
    bboxes = np.array(
        [[100.0, 100.0, 300.0, 250.0], [400.0, 120.0, 700.0, 300.0]]
    )
    frustums = random_crop_frustum(bboxes, rect, Tr, P2, rng=rng)
    assert frustums.shape == (2, 8, 3)
    assert np.isfinite(frustums).all()


def _write_db(tmp_path, rng, names):
    """Minimal on-disk GT database with group ids pairing objects."""
    db_infos = {n: [] for n in set(names)}
    for gid, name in enumerate(names):
        pts = rng.randn(20, 4).astype(np.float32) * 0.3
        path = tmp_path / f"obj_{gid}.bin"
        pts.tofile(str(path))
        box = np.array(
            [5.0 + 3 * gid, -3.0, -1.5, 1.6, 3.9, 1.56, 0.0], np.float32
        )
        db_infos[name].append(
            {
                "name": name,
                "path": path.name,
                "box3d_lidar": box,
                "difficulty": 0,
                "group_id": gid // 2,  # pair consecutive objects
                "num_points_in_gt": 20,
            }
        )
    return db_infos


def test_group_sampling_pastes_whole_groups(tmp_path, rng):
    names = ["Car", "Pedestrian"] * 4  # 4 groups of (Car, Pedestrian)
    db_infos = _write_db(tmp_path, rng, names)
    sampler = DataBaseSamplerV2(
        db_infos,
        groups=[{"Car": 3, "Pedestrian": 3}],
        rng=np.random.RandomState(0),
        log=lambda *a: None,
    )
    assert sampler.use_group_sampling
    gt_boxes = np.array([[30.0, 10.0, -1.5, 1.6, 3.9, 1.56, 0.0]])
    out = sampler.sample_all(
        str(tmp_path),
        gt_boxes,
        np.array(["Car"]),
        4,
        gt_group_ids=np.array([0]),
    )
    assert out is not None
    # whole groups only: every sampled group id appears exactly twice
    # (its Car and its Pedestrian), and ids don't clash with scene ids
    gids, counts = np.unique(out["group_ids"], return_counts=True)
    assert (counts == 2).all()
    assert (gids > 0).all()
    assert set(out["gt_names"]) == {"Car", "Pedestrian"}
    assert out["points"].shape[1] == 4
    # no collisions among placed boxes and scene boxes
    from papc_tpu.detect.kitti.augment import box_collision_test

    allb = np.concatenate([gt_boxes, out["gt_boxes"]])
    bv = box_np.center_to_corner_box2d(
        allb[:, :2], allb[:, 3:5], allb[:, 6]
    )
    coll = box_collision_test(bv, bv)
    np.fill_diagonal(coll, False)
    assert not coll.any()


def test_sampler_random_crop_truncates_points(tmp_path, rng):
    names = ["Car"] * 6
    db_infos = _write_db(tmp_path, rng, names)
    # single-class group -> classic per-class sampling path w/ crop
    P2, rect, Tr = default_calib()

    def run(crop):
        sampler = DataBaseSamplerV2(
            db_infos,
            groups=[{"Car": 6}],
            rng=np.random.RandomState(0),
            log=lambda *a: None,
        )
        return sampler.sample_all(
            str(tmp_path),
            np.zeros((0, 7)),
            np.array([], dtype=str),
            4,
            random_crop=crop,
            rect=rect,
            Trv2c=Tr,
            P2=P2,
        )

    full = run(False)
    cropped = run(True)
    assert full is not None and cropped is not None
    # crop only ever removes points (and never below the 15-point floor)
    assert len(cropped["points"]) <= len(full["points"])


def test_global_rot_sampler_keeps_radius(tmp_path, rng):
    names = ["Car"] * 4
    db_infos = _write_db(tmp_path, rng, names)
    sampler = DataBaseSamplerV2(
        db_infos,
        groups=[{"Car": 4}],
        global_rot_range=[0.3, 2.8],
        rng=np.random.RandomState(0),
        log=lambda *a: None,
    )
    assert sampler._enable_global_rot
    out = sampler.sample_all(
        str(tmp_path), np.zeros((0, 7)), np.array([], dtype=str), 4
    )
    assert out is not None
    orig = {
        tuple(np.round(i["box3d_lidar"][3:6], 3)): i
        for infos in db_infos.values()
        for i in infos
    }
    # every placed box keeps its original distance-to-origin and records
    # the applied rot_transform (points were rotated consistently)
    for b in out["gt_boxes"]:
        r = np.hypot(b[0], b[1])
        grot = np.arctan2(b[0], b[1])
        assert 0.3 - 1e-6 <= grot <= 2.8 + 1e-6
        # all db boxes sit at radius hypot(5+3g, 3); collect candidates
        radii = [
            np.hypot(i["box3d_lidar"][0], i["box3d_lidar"][1])
            for infos in db_infos.values()
            for i in infos
        ]
        assert min(abs(r - rr) for rr in radii) < 1e-5


class TestRotationConvention:
    def test_rotate_corners_batch_matches_rotation_2d(self):
        """Candidate-corner rotation must use the SAME convention as
        box_np.rotation_2d, so collision trials test the footprint that
        the accepted noise actually applies (regression: a transposed
        matrix rotated candidates by -angle)."""
        from papc_tpu.detect import box_np
        from papc_tpu.detect.kitti.augment import _rotate_corners_batch

        rs = np.random.RandomState(0)
        corners = rs.randn(5, 4, 2)
        angles = rs.uniform(-np.pi, np.pi, 5)
        got = _rotate_corners_batch(corners, angles)
        want = box_np.rotation_2d(corners, angles)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_noised_footprint_matches_applied_yaw(self):
        """End-to-end: after noise_per_object_ accepts a trial, the box's
        (center, dims, yaw) footprint must equal the candidate corners it
        collision-tested. With a single far-from-everything box every
        trial is accepted, so footprints must match at the FIRST trial's
        noise draw."""
        from papc_tpu.detect import box_np
        from papc_tpu.detect.kitti.augment import noise_per_object_

        box = np.array([[5.0, 3.0, 0.0, 1.6, 3.9, 1.5, 0.7]])
        boxes = box.copy()
        rng = np.random.RandomState(3)
        noise_per_object_(
            boxes, None, rotation_perturb=0.4, center_noise_std=0.5,
            num_try=10, rng=rng,
        )
        # replay the same draws
        rng2 = np.random.RandomState(3)
        loc = rng2.normal(scale=np.array([0.5] * 3), size=[1, 10, 3])
        rot = rng2.uniform(-0.4, 0.4, size=[1, 10])
        assert np.allclose(boxes[0, :3], box[0, :3] + loc[0, 0])
        assert np.allclose(boxes[0, 6], box[0, 6] + rot[0, 0])
        # the footprint at the applied pose equals what was tested:
        applied = box_np.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 3:5], boxes[:, 6]
        )
        base = box_np.center_to_corner_box2d(
            box[:, :2], box[:, 3:5], box[:, 6]
        ) - box[:, None, :2]
        from papc_tpu.detect.kitti.augment import _rotate_corners_batch

        cand = _rotate_corners_batch(
            base[:, None], rot[:, 0:1]
        )[0, 0] + (box[0, :2] + loc[0, 0, :2])
        np.testing.assert_allclose(applied[0], cand, atol=1e-9)

    def test_points_rotate_with_the_box(self):
        """The points inside a noised box must land where the yaw-derived
        footprint lands (regression: the inline point rotation was the
        transpose of the corner/yaw convention, so object clouds rotated
        opposite to their regression targets)."""
        from papc_tpu.detect import box_np
        from papc_tpu.detect.kitti.augment import noise_per_object_

        box = np.array([[10.0, 5.0, 0.0, 2.0, 4.0, 1.5, 0.3]])
        # a point glued to the box's local +x direction, mid-height
        local = np.array([0.8, 0.0])
        c0, s0 = np.cos(box[0, 6]), np.sin(box[0, 6])
        world = (local[None] @ np.array([[c0, -s0], [s0, c0]]))[0]
        pts = np.array([[box[0, 0] + world[0], box[0, 1] + world[1],
                         0.75, 0.5]])
        boxes = box.copy()
        rng = np.random.RandomState(11)
        noise_per_object_(
            boxes, pts, rotation_perturb=0.5, center_noise_std=0.3,
            num_try=5, rng=rng,
        )
        # expected: same local offset expressed at the NEW yaw + center
        c1, s1 = np.cos(boxes[0, 6]), np.sin(boxes[0, 6])
        want = (local[None] @ np.array([[c1, -s1], [s1, c1]]))[0]
        np.testing.assert_allclose(
            pts[0, :2], boxes[0, :2] + want, atol=1e-6
        )
        # and the point is still inside the moved box
        inside = box_np.points_in_rbbox(pts, boxes)
        assert inside[0, 0]


class TestNoiseSelectNative:
    def test_cc_trial_loop_matches_python(self, monkeypatch, rng):
        """The C++ sequential accept loop (cc.noise_select) must pick the
        SAME trials as the python chunked loop, both modes."""
        from papc_tpu import cc
        from papc_tpu.detect.kitti import augment

        def scene(seed):
            r = np.random.RandomState(seed)
            n = 8
            boxes = np.zeros((n, 7), np.float32)
            boxes[:, 0] = r.uniform(0, 18, n)
            boxes[:, 1] = r.uniform(-8, 8, n)
            boxes[:, 3] = 1.7
            boxes[:, 4] = 4.0
            boxes[:, 5] = 1.5
            boxes[:, 6] = r.uniform(-np.pi, np.pi, n)
            return boxes

        for seed in (0, 1, 2):
            for groups in (None, np.array([0, 0, 1, 1, 2, 2, 3, 3])):
                b1 = scene(seed)
                b2 = b1.copy()
                kw = dict(
                    rotation_perturb=0.3, center_noise_std=0.4,
                    num_try=30, group_ids=groups,
                )
                augment.noise_per_object_(
                    b1, None, rng=np.random.RandomState(7), **kw
                )
                monkeypatch.setattr(cc, "available", lambda: False)
                augment.noise_per_object_(
                    b2, None, rng=np.random.RandomState(7), **kw
                )
                monkeypatch.undo()
                np.testing.assert_allclose(b1, b2, atol=1e-6)
