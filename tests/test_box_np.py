"""Tests for the host-side detection box math (papc_tpu.detect.box_np)."""

import numpy as np
import pytest

from papc_tpu.detect import box_np as B


class TestCorners:
    def test_corners_2d_unit_box(self):
        c = B.corners_nd(np.array([[2.0, 4.0]]), origin=0.5)[0]
        # clockwise from min: (-1,-2), (-1,2), (1,2), (1,-2)
        np.testing.assert_allclose(
            c, [[-1, -2], [-1, 2], [1, 2], [1, -2]]
        )

    def test_center_to_corner_rotation_90(self):
        c = B.center_to_corner_box2d(
            np.array([[0.0, 0.0]]),
            np.array([[2.0, 4.0]]),
            np.array([np.pi / 2]),
        )[0]
        # rotating swaps extents: x extent becomes 4, y extent 2
        assert c[:, 0].max() == pytest.approx(2.0, abs=1e-6)
        assert c[:, 1].max() == pytest.approx(1.0, abs=1e-6)

    def test_standup(self):
        corners = B.center_to_corner_box2d(
            np.array([[1.0, 2.0]]), np.array([[2.0, 2.0]]),
            np.array([np.pi / 4]),
        )
        s = B.corner_to_standup_nd(corners)[0]
        half = np.sqrt(2.0)
        np.testing.assert_allclose(
            s, [1 - half, 2 - half, 1 + half, 2 + half], atol=1e-6
        )


class TestEncodeDecode:
    def test_roundtrip(self, rng):
        anchors = np.stack(
            [
                rng.uniform(-10, 10, 20),
                rng.uniform(-10, 10, 20),
                rng.uniform(-3, 1, 20),
                rng.uniform(1, 2, 20),
                rng.uniform(2, 5, 20),
                rng.uniform(1, 2, 20),
                rng.uniform(-np.pi, np.pi, 20),
            ],
            axis=1,
        )
        boxes = anchors + rng.uniform(-0.2, 0.2, anchors.shape)
        enc = B.second_box_encode(boxes, anchors)
        dec = B.second_box_decode(enc, anchors)
        np.testing.assert_allclose(dec, boxes, rtol=1e-5, atol=1e-6)

    def test_roundtrip_angle_vector(self, rng):
        anchors = np.tile(
            np.array([[0.0, 0, -1, 1.6, 3.9, 1.56, 0.0]]), (5, 1)
        )
        boxes = anchors.copy()
        boxes[:, 6] = rng.uniform(-1.2, 1.2, 5)
        enc = B.second_box_encode(boxes, anchors, encode_angle_to_vector=True)
        assert enc.shape[-1] == 8
        dec = B.second_box_decode(enc, anchors, encode_angle_to_vector=True)
        np.testing.assert_allclose(dec, boxes, rtol=1e-5, atol=1e-6)

    def test_identity_encode_is_zero(self):
        a = np.array([[1.0, 2, -1, 1.6, 3.9, 1.56, 0.3]])
        enc = B.second_box_encode(a.copy(), a)
        np.testing.assert_allclose(enc, 0.0, atol=1e-7)

    def test_bev_roundtrip(self, rng):
        anchors = np.stack(
            [
                rng.uniform(-10, 10, 10),
                rng.uniform(-10, 10, 10),
                rng.uniform(1, 2, 10),
                rng.uniform(2, 5, 10),
                rng.uniform(-np.pi, np.pi, 10),
            ],
            axis=1,
        )
        boxes = anchors + rng.uniform(-0.2, 0.2, anchors.shape)
        dec = B.bev_box_decode(B.bev_box_encode(boxes, anchors), anchors)
        np.testing.assert_allclose(dec, boxes, rtol=1e-5, atol=1e-6)


class TestIoU:
    def test_identical(self):
        b = np.array([[0.0, 0, 4, 4]])
        np.testing.assert_allclose(B.iou_2d(b, b), [[1.0]])

    def test_disjoint(self):
        a = np.array([[0.0, 0, 1, 1]])
        b = np.array([[5.0, 5, 6, 6]])
        np.testing.assert_allclose(B.iou_2d(a, b), [[0.0]])

    def test_half_overlap(self):
        a = np.array([[0.0, 0, 2, 2]])
        b = np.array([[1.0, 0, 3, 2]])
        np.testing.assert_allclose(B.iou_2d(a, b), [[2.0 / 6.0]])


class TestRotatedIoU:
    def test_identical_rotated(self):
        b = np.array([[0.0, 0, 2, 4, 0.7]])
        got = B.rotate_iou_cpu(b, b)
        np.testing.assert_allclose(got, [[1.0]], atol=1e-5)

    def test_disjoint(self):
        a = np.array([[0.0, 0, 2, 2, 0.3]])
        b = np.array([[10.0, 0, 2, 2, 0.9]])
        np.testing.assert_allclose(B.rotate_iou_cpu(a, b), [[0.0]])

    def test_axis_aligned_matches_iou2d(self, rng):
        # zero-rotation boxes must reproduce the axis-aligned result
        xy = rng.uniform(-3, 3, (8, 2))
        wl = rng.uniform(1, 3, (8, 2))
        rb = np.concatenate([xy, wl, np.zeros((8, 1))], axis=1)
        got = B.rotate_iou_cpu(rb, rb)
        minmax = np.concatenate([xy - wl / 2, xy + wl / 2], axis=1)
        want = B.iou_2d(minmax, minmax)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_45deg_square_analytic(self):
        # unit square vs itself rotated 45°: intersection is a regular
        # octagon with area 2*(sqrt(2)-1); union = 2 - inter
        a = np.array([[0.0, 0, 1, 1, 0.0]])
        b = np.array([[0.0, 0, 1, 1, np.pi / 4]])
        inter = 2 * (np.sqrt(2) - 1)
        want = inter / (2 - inter)
        np.testing.assert_allclose(B.rotate_iou_cpu(a, b), [[want]], atol=1e-5)

    def test_criterion_modes(self):
        # small box fully inside big box
        big = np.array([[0.0, 0, 4, 4, 0.2]])
        small = np.array([[0.0, 0, 2, 2, 0.2]])
        np.testing.assert_allclose(
            B.rotate_iou_cpu(big, small, criterion=1), [[1.0]], atol=1e-5
        )
        np.testing.assert_allclose(
            B.rotate_iou_cpu(big, small, criterion=0), [[4.0 / 16.0]],
            atol=1e-5,
        )


class TestAnchors:
    def test_stride_shape_and_values(self):
        a = B.create_anchors_3d_stride(
            [1, 4, 4],
            sizes=[1.6, 3.9, 1.56],
            anchor_strides=[0.5, 0.5, 0.0],
            anchor_offsets=[0.25, -1.0, -1.78],
            rotations=[0, np.pi / 2],
        )
        assert a.shape == (1, 4, 4, 1, 2, 7)
        # x varies along W axis
        np.testing.assert_allclose(
            a[0, 0, :, 0, 0, 0], [0.25, 0.75, 1.25, 1.75]
        )
        # y varies along H axis
        np.testing.assert_allclose(
            a[0, :, 0, 0, 0, 1], [-1.0, -0.5, 0.0, 0.5]
        )
        np.testing.assert_allclose(
            a[..., 3:6],
            np.broadcast_to([1.6, 3.9, 1.56], a[..., 3:6].shape),
            rtol=1e-6,
        )
        np.testing.assert_allclose(a[0, 0, 0, 0, :, 6], [0, np.pi / 2],
                                   rtol=1e-6)

    def test_range_endpoints(self):
        a = B.create_anchors_3d_range(
            [1, 3, 3], [0, 0, -1, 2, 4, -1],
            sizes=[1, 1, 1], rotations=[0],
        )
        assert a.shape == (1, 3, 3, 1, 1, 7)
        np.testing.assert_allclose(a[0, 0, :, 0, 0, 0], [0, 1, 2])
        np.testing.assert_allclose(a[0, :, 0, 0, 0, 1], [0, 2, 4])


class TestPointsInRbbox:
    def test_simple_box(self):
        box = np.array([[0.0, 0, 0, 2, 2, 2, 0.0]])  # bottom at z=0
        pts = np.array(
            [[0, 0, 1.0], [0, 0, 3.0], [0.9, 0.9, 0.1], [1.5, 0, 1.0]]
        )
        got = B.points_in_rbbox(pts, box)[:, 0]
        np.testing.assert_array_equal(got, [True, False, True, False])

    def test_rotated_box(self):
        box = np.array([[0.0, 0, 0, 1.0, 4.0, 1.0, np.pi / 2]])
        # after 90° yaw the long axis lies along x
        pts = np.array([[1.5, 0, 0.5], [0, 1.5, 0.5]])
        got = B.points_in_rbbox(pts, box)[:, 0]
        np.testing.assert_array_equal(got, [True, False])


class TestAnchorMaskSAT:
    def test_counts(self):
        coors = np.array([[0, 1, 1], [0, 1, 2], [0, 3, 3]])  # (z, y, x)
        dense = B.sparse_sum_for_anchors_mask(coors, (4, 4))
        assert dense.sum() == 3
        cumsum = np.cumsum(np.cumsum(dense, axis=0), axis=1)
        # anchor covering the whole grid should see all 3 points
        area = B.fused_get_anchors_area(
            cumsum,
            np.array([[0.0, 0.0, 4.0, 4.0]]),
            stride=(1.0, 1.0), offset=(0.0, 0.0), grid_size=(4, 4),
        )
        np.testing.assert_allclose(area, [3.0])


class TestCameraLidar:
    def test_roundtrip(self, rng):
        r_rect = np.eye(4)
        velo2cam = np.eye(4)
        velo2cam[:3, :3] = B.rotation_points_single_angle(
            np.eye(3), 0.3, axis=1
        ).T
        velo2cam[:3, 3] = [0.1, -0.2, 0.3]
        pts = rng.randn(10, 3)
        back = B.camera_to_lidar(
            B.lidar_to_camera(pts, r_rect, velo2cam), r_rect, velo2cam
        )
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_box_roundtrip(self, rng):
        r_rect = np.eye(4)
        velo2cam = np.eye(4)
        boxes = np.abs(rng.randn(5, 7)) + 0.5
        back = B.box_camera_to_lidar(
            B.box_lidar_to_camera(boxes, r_rect, velo2cam),
            r_rect, velo2cam,
        )
        np.testing.assert_allclose(back, boxes, atol=1e-9)


def test_limit_period():
    np.testing.assert_allclose(
        B.limit_period(np.array([0.1, np.pi + 0.1, -np.pi - 0.1])),
        [0.1, 0.1, -0.1],
        atol=1e-9,
    )


def test_rbbox2d_to_near_bbox():
    rb = np.array([[0.0, 0, 2, 4, 0.0], [0.0, 0, 2, 4, np.pi / 2]])
    out = B.rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(out[0], [-1, -2, 1, 2])
    np.testing.assert_allclose(out[1], [-2, -1, 2, 1])


def test_assign_label_to_voxel():
    """Axis-aligned case with an analytic oracle: a voxel is labeled 1
    iff its center is within box_extent/2 + voxel/2 of the box center
    per axis (reference dilates each box by one voxel)."""
    voxel_size = np.array([0.5, 0.5, 1.0])
    coors_range = [0, 0, 0, 8, 8, 4]
    # axis-aligned box: center xy (2, 2), z-bottom 0.9, dims 2.1^2 x 2, yaw 0
    dims = np.array([2.1, 2.1, 2.0])
    gt = np.array([[2.0, 2.0, 0.9, *dims, 0.0]])
    zz, yy, xx = np.meshgrid(
        np.arange(4), np.arange(16), np.arange(16), indexing="ij"
    )
    coors = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int64)
    out = B.assign_label_to_voxel(gt, coors, voxel_size, coors_range)

    centers = (
        coors[:, ::-1] * voxel_size
        + np.asarray(coors_range[:3])
        + voxel_size * 0.5
    )
    # reference-faithful growth: xy grows one voxel on the LOW side only
    # (center -voxel/2 with origin .5); z grows voxel/2 both ways
    lo = np.array(
        [
            2.0 - dims[0] / 2 - voxel_size[0],
            2.0 - dims[1] / 2 - voxel_size[1],
            0.9 - voxel_size[2] * 0.5,
        ]
    )
    hi = np.array(
        [2.0 + dims[0] / 2, 2.0 + dims[1] / 2, 0.9 + dims[2] + voxel_size[2] * 0.5]
    )
    expect = np.all((centers > lo) & (centers < hi), axis=1)
    assert out.dtype == np.int64
    assert expect.sum() > 0
    np.testing.assert_array_equal(out.astype(bool), expect)
