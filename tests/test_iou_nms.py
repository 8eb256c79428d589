"""Device rotated IoU + NMS vs the host (numpy) implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from papc_tpu.detect import box_np as B
from papc_tpu.ops.iou import box5_to_corners, iou_2d, rotate_iou
from papc_tpu.ops.nms import nms, rotate_nms


def random_rboxes(rng, n):
    return np.stack(
        [
            rng.uniform(-5, 5, n),
            rng.uniform(-5, 5, n),
            rng.uniform(1, 3, n),
            rng.uniform(1, 4, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


class TestDeviceIoU:
    def test_corners_match_host(self, rng):
        rb = random_rboxes(rng, 12)
        got = np.asarray(box5_to_corners(jnp.asarray(rb)))
        want = B.center_to_corner_box2d(rb[:, :2], rb[:, 2:4], rb[:, 4])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_axis_aligned_matches_iou2d(self, rng):
        rb = random_rboxes(rng, 10)
        rb[:, 4] = 0.0
        got = np.asarray(rotate_iou(jnp.asarray(rb), jnp.asarray(rb)))
        minmax = np.concatenate(
            [rb[:, :2] - rb[:, 2:4] / 2, rb[:, :2] + rb[:, 2:4] / 2], axis=1
        )
        want = np.asarray(iou_2d(jnp.asarray(minmax), jnp.asarray(minmax)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_matches_host_rotated(self, rng):
        a = random_rboxes(rng, 16)
        b = random_rboxes(rng, 9)
        got = np.asarray(rotate_iou(jnp.asarray(a), jnp.asarray(b)))
        want = B.rotate_iou_cpu(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_criterion_matches_host(self, rng):
        a = random_rboxes(rng, 8)
        b = random_rboxes(rng, 8)
        for crit in (0, 1):
            got = np.asarray(
                rotate_iou(jnp.asarray(a), jnp.asarray(b), criterion=crit)
            )
            want = B.rotate_iou_cpu(a, b, criterion=crit)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_jit(self, rng):
        a = jnp.asarray(random_rboxes(rng, 8))
        f = jax.jit(lambda x: rotate_iou(x, x))
        out = f(a)
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(out)), 1.0, atol=1e-4
        )


def nms_oracle(boxes4, thresh):
    """Greedy NMS reference (score-ordered input)."""
    n = len(boxes4)
    keep = np.ones(n, bool)
    iou = B.iou_2d(boxes4, boxes4)
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if iou[i, j] > thresh:
                keep[j] = False
    return keep


class TestNMS:
    def test_matches_oracle(self, rng):
        centers = rng.uniform(-5, 5, (32, 2))
        wh = rng.uniform(1, 3, (32, 2))
        boxes = np.concatenate(
            [centers - wh / 2, centers + wh / 2], axis=1
        ).astype(np.float32)
        got = np.asarray(nms(jnp.asarray(boxes), iou_threshold=0.3))
        want = nms_oracle(boxes, 0.3)
        np.testing.assert_array_equal(got, want)

    def test_duplicates_suppressed(self):
        box = np.array([0.0, 0, 2, 2], np.float32)
        boxes = np.tile(box, (5, 1))
        got = np.asarray(nms(jnp.asarray(boxes), iou_threshold=0.5))
        np.testing.assert_array_equal(got, [True] + [False] * 4)

    def test_valid_mask(self):
        box = np.array([0.0, 0, 2, 2], np.float32)
        boxes = np.tile(box, (4, 1))
        valid = jnp.asarray([False, True, True, False])
        got = np.asarray(
            nms(jnp.asarray(boxes), valid=valid, iou_threshold=0.5)
        )
        # first VALID box wins; invalid stay invalid
        np.testing.assert_array_equal(got, [False, True, False, False])

    def test_rotated_nms_suppresses_rotated_duplicates(self):
        rb = np.array(
            [
                [0.0, 0, 2, 4, 0.0],
                [0.05, 0, 2, 4, 0.05],  # nearly identical
                [10.0, 10, 2, 4, 1.0],  # far away
            ],
            np.float32,
        )
        got = np.asarray(rotate_nms(jnp.asarray(rb), iou_threshold=0.5))
        np.testing.assert_array_equal(got, [True, False, True])
