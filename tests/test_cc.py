"""Native extension (papc_cc) parity tests vs the numpy implementations."""

import numpy as np
import pytest

from papc_tpu import cc
from papc_tpu.detect import box_np
from papc_tpu.detect.kitti import augment
from papc_tpu.detect.voxelize_np import _points_to_voxel_np as np_points_to_voxel

pytestmark = pytest.mark.skipif(
    not cc.available(), reason="papc_cc build unavailable"
)


class TestVoxelize:
    def test_matches_numpy(self, rng):
        pts = rng.uniform(0, 4, (200, 4)).astype(np.float32)
        pts[:, 2] /= 2
        vsize = [0.5, 0.5, 1.0]
        prange = [0, 0, 0, 4, 4, 2]
        cv, ccoords, cn = cc.points_to_voxel(pts, vsize, prange, 8, 200)
        nv, ncoords, nn = np_points_to_voxel(pts, vsize, prange, 8, 200)
        np.testing.assert_array_equal(ccoords, ncoords)
        np.testing.assert_array_equal(cn, nn)
        np.testing.assert_allclose(cv, nv, atol=1e-6)

    def test_first_come_cap(self):
        pts = np.stack(
            [np.full(6, 0.1), np.full(6, 0.1), np.full(6, 0.5),
             np.arange(6, dtype=np.float32)], axis=1,
        ).astype(np.float32)
        v, c, n = cc.points_to_voxel(pts, [0.5, 0.5, 1], [0, 0, 0, 4, 4, 2],
                                     3, 10)
        np.testing.assert_array_equal(n, [3])
        np.testing.assert_allclose(v[0, :, 3], [0, 1, 2])

    def test_half_extent_grid_rounding(self, rng):
        """Grid dims with an exact .5 cell count (z extent 2.5, vz=1.0):
        numpy's half-to-even round gives 2 — the kernel must use the
        SAME dims as the scratch allocation (a C float round once gave
        3 and indexed past the tables)."""
        pts = rng.uniform(0, 4, (300, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(0, 2.5, 300)
        vsize = [0.5, 0.5, 1.0]
        prange = [0, 0, 0, 4, 4, 2.5]
        cv, ccoords, cn = cc.points_to_voxel(pts, vsize, prange, 8, 400)
        nv, ncoords, nn = np_points_to_voxel(pts, vsize, prange, 8, 400)
        np.testing.assert_array_equal(ccoords, ncoords)
        np.testing.assert_array_equal(cn, nn)
        np.testing.assert_allclose(cv, nv, atol=1e-6)
        # padded twin as well
        pv, pc, pn, k = cc.points_to_voxel_padded(pts, vsize, prange, 8, 400)
        np.testing.assert_array_equal(pc[:k], ncoords)

    def test_repeated_calls_match_oracle(self, rng):
        """The cached path reuses epoch-tagged scratch AND the write-set
        cleanup of the previous call's voxel slots; a long sequence of
        same-key calls with varying point sets (shrinking voxel counts
        included) must stay bit-equal to the stateless numpy oracle."""
        vsize = [0.5, 0.5, 1.0]
        prange = [0, 0, 0, 4, 4, 2]
        for n in (400, 50, 7, 300, 1, 120):
            pts = rng.uniform(0, 4, (n, 4)).astype(np.float32)
            pts[:, 2] /= 2
            cv, ccoords, cn = cc.points_to_voxel(pts, vsize, prange, 8, 200)
            nv, ncoords, nn = np_points_to_voxel(pts, vsize, prange, 8, 200)
            np.testing.assert_array_equal(ccoords, ncoords)
            np.testing.assert_array_equal(cn, nn)
            # the all-zero padded-slot invariant must be restored too
            np.testing.assert_allclose(cv, nv, atol=1e-6)

    def test_padded_repeated_and_threaded(self, rng):
        """points_to_voxel_padded shares only scratch tables; concurrent
        callers (train prefetch thread + main-thread eval prep) must not
        corrupt each other's first-come tables."""
        import threading

        vsize = [0.5, 0.5, 1.0]
        prange = [0, 0, 0, 4, 4, 2]
        frames = [
            rng.uniform(0, 4, (rng.randint(5, 400), 4)).astype(np.float32)
            for _ in range(24)
        ]
        for f in frames:
            f[:, 2] /= 2
        want = [np_points_to_voxel(f, vsize, prange, 8, 64) for f in frames]

        errors = []

        def worker(sl):
            try:
                for i in sl:
                    v, c, n, k = cc.points_to_voxel_padded(
                        frames[i], vsize, prange, 8, 64
                    )
                    wv, wc, wn = want[i]
                    np.testing.assert_array_equal(c[:k], wc)
                    np.testing.assert_array_equal(n[:k], wn)
                    np.testing.assert_allclose(v[:k], wv, atol=1e-6)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        ts = [
            threading.Thread(target=worker, args=(range(j, 24, 3),))
            for j in range(3)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors, errors


class TestRbboxIoU:
    def test_matches_numpy(self, rng):
        def rb(n):
            return np.stack(
                [rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                 rng.uniform(1, 3, n), rng.uniform(1, 4, n),
                 rng.uniform(-np.pi, np.pi, n)], axis=1,
            ).astype(np.float32)

        a, b = rb(20), rb(15)
        got = cc.rbbox_iou(a, b)
        want = box_np._rotate_iou_cpu_np(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_criteria(self, rng):
        big = np.array([[0.0, 0, 4, 4, 0.2]], np.float32)
        small = np.array([[0.0, 0, 2, 2, 0.2]], np.float32)
        np.testing.assert_allclose(
            cc.rbbox_iou(big, small, criterion=1), [[1.0]], atol=1e-5
        )
        np.testing.assert_allclose(
            cc.rbbox_iou(big, small, criterion=2), [[4.0]], atol=1e-4
        )


class TestNMS:
    def test_standup_matches(self, rng):
        centers = rng.uniform(-5, 5, (40, 2))
        wh = rng.uniform(1, 3, (40, 2))
        boxes = np.concatenate(
            [centers - wh / 2, centers + wh / 2], 1
        ).astype(np.float32)
        got = cc.nms(boxes, 0.3)
        # oracle
        iou = box_np.iou_2d(boxes, boxes)
        want = np.ones(len(boxes), bool)
        for i in range(len(boxes)):
            if not want[i]:
                continue
            for j in range(i + 1, len(boxes)):
                if iou[i, j] > 0.3:
                    want[j] = False
        np.testing.assert_array_equal(got, want)

    def test_rotated(self):
        rb = np.array(
            [[0.0, 0, 2, 4, 0.0], [0.05, 0, 2, 4, 0.05],
             [10.0, 10, 2, 4, 1.0]], np.float32,
        )
        np.testing.assert_array_equal(
            cc.rotate_nms(rb, 0.5), [True, False, True]
        )


class TestGeometry:
    def test_points_in_polygon(self, rng):
        boxes = np.array(
            [[0.0, 0, 0, 2, 2, 2, 0.3], [5.0, 5, 0, 1, 4, 1, -0.7]]
        )
        corners = box_np.center_to_corner_box3d(
            boxes[:, :3], boxes[:, 3:6], boxes[:, 6]
        )
        surfaces = box_np.corner_to_surfaces_3d(corners)
        pts = rng.uniform(-3, 8, (100, 3))
        got = cc.points_in_polygon3d(pts, surfaces)
        want = box_np._points_in_convex_polygon_3d_np(pts, surfaces)
        np.testing.assert_array_equal(got, want)

    def test_collision_matches(self, rng):
        def corners(n):
            xy = rng.uniform(-5, 5, (n, 2))
            wl = rng.uniform(1, 3, (n, 2))
            yaw = rng.uniform(-np.pi, np.pi, n)
            return box_np.center_to_corner_box2d(xy, wl, yaw).astype(
                np.float32
            )

        a, b = corners(15), corners(12)
        got = cc.box_collision_test(a, b)
        want = augment._box_collision_test_np(a, b)
        np.testing.assert_array_equal(got, want)


class TestKDBuild:
    def test_matches_python_recursion(self, rng):
        pts = rng.randn(128, 3).astype(np.float32)
        order, splits = cc.kd_build(pts)
        # python recursion oracle (same median-split-max-spread rule)
        N = len(pts)
        splits_py = [np.zeros(N >> l, np.int32) for l in range(7)]

        def rec(idx, pos):
            s = len(idx)
            if s == 1:
                return idx
            sub = pts[idx]
            axis = int(np.argmax(sub.max(0) - sub.min(0)))
            sidx = idx[np.argsort(sub[:, axis], kind="stable")]
            half = s // 2
            left = rec(sidx[:half], pos * 2)
            right = rec(sidx[half:], pos * 2 + 1)
            lvl = int(np.log2(s)) - 1
            splits_py[lvl][2 * pos] = axis
            splits_py[lvl][2 * pos + 1] = axis
            return np.concatenate([left, right])

        order_py = rec(np.arange(N), 0)
        np.testing.assert_array_equal(order, order_py)
        for a, b in zip(splits, splits_py):
            np.testing.assert_array_equal(a, b)

    def test_loader_uses_native(self, rng):
        from papc_tpu.data.kd import build_kd_tree

        pts = rng.randn(64, 3).astype(np.float32)
        labels = rng.randint(0, 5, 64)
        leaf, splits, leaf_labels = build_kd_tree(pts, labels)
        assert leaf.shape == (64, 3)
        assert len(splits) == 6
        # leaf ordering permutes labels consistently
        assert sorted(leaf_labels.tolist()) == sorted(labels.tolist())


def test_iou2d_matches_numpy(rng):
    from papc_tpu.detect.box_np import _iou_2d_np

    for eps in (0.0, 1.0):
        for _ in range(5):
            n, k = rng.randint(1, 60), rng.randint(1, 8)
            x1 = rng.uniform(0, 50, (n, 1)); y1 = rng.uniform(0, 50, (n, 1))
            boxes = np.concatenate(
                [x1, y1, x1 + rng.uniform(0.1, 10, (n, 1)),
                 y1 + rng.uniform(0.1, 10, (n, 1))], 1).astype(np.float32)
            x1 = rng.uniform(0, 50, (k, 1)); y1 = rng.uniform(0, 50, (k, 1))
            q = np.concatenate(
                [x1, y1, x1 + rng.uniform(0.1, 10, (k, 1)),
                 y1 + rng.uniform(0.1, 10, (k, 1))], 1).astype(np.float32)
            np.testing.assert_allclose(
                cc.iou2d(boxes, q, eps), _iou_2d_np(boxes, q, eps),
                rtol=1e-5, atol=1e-6,
            )

class TestFusedAssign:
    def test_iou2d_assign_matches_numpy(self, rng):
        def bv(n):
            x1 = rng.uniform(0, 50, n)
            y1 = rng.uniform(0, 50, n)
            return np.stack(
                [x1, y1, x1 + rng.uniform(1, 5, n),
                 y1 + rng.uniform(1, 5, n)], 1,
            ).astype(np.float32)

        a, g = bv(4000), bv(15)
        ra, rm, cm, force = cc.iou2d_assign(a, g)
        # exact vs the C++ matrix kernel (identical arithmetic)
        ov = cc.iou2d(a, g)
        np.testing.assert_array_equal(ra, ov.argmax(1))
        np.testing.assert_allclose(rm, ov.max(1))
        np.testing.assert_allclose(cm, ov.max(0))
        gm = np.where(ov.max(0) == 0, -1.0, ov.max(0))
        np.testing.assert_array_equal(
            np.sort(force), np.unique(np.where(ov == gm)[0])
        )
        # and vs the independent NUMPY oracle (CLAUDE.md convention —
        # catches a shared-arithmetic bug in the C++ helpers); float32
        # vs double intermediates -> tolerance, value-level argmax check
        ov_np = box_np._iou_2d_np(a, g)
        np.testing.assert_allclose(rm, ov_np.max(1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cm, ov_np.max(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            ov_np[np.arange(len(a)), ra], ov_np.max(1),
            rtol=1e-5, atol=1e-6,
        )

    def test_forced_threaded_path_matches_single(self, rng):
        """The multi-thread branch never auto-activates on a 1-core CI
        box — force it and require bit-equality with the single-thread
        path (col-max merge + ordered force-list concat are exact)."""
        def bv(n):
            x1 = rng.uniform(0, 50, n)
            y1 = rng.uniform(0, 50, n)
            return np.stack(
                [x1, y1, x1 + rng.uniform(1, 5, n),
                 y1 + rng.uniform(1, 5, n)], 1,
            ).astype(np.float32)

        a, g = bv(20000), bv(13)
        base = cc.iou2d_assign(a, g, num_threads=1)
        for nt in (2, 5):
            got = cc.iou2d_assign(a, g, num_threads=nt)
            for x, y in zip(base, got):
                np.testing.assert_array_equal(x, y)

    def test_iou2d_assign_empty(self):
        ra, rm, cm, force = cc.iou2d_assign(
            np.zeros((0, 4), np.float32), np.zeros((3, 4), np.float32)
        )
        assert len(ra) == 0 and len(force) == 0 and len(cm) == 3


class TestAnchorsAreaSAT:
    def test_matches_numpy_chain(self, rng):
        from papc_tpu.detect import box_np

        ny, nx = 64, 48
        V = 500
        coors = np.stack(
            [np.zeros(V), rng.randint(0, ny, V), rng.randint(0, nx, V)],
            1,
        ).astype(np.int32)
        N = 3000
        bv = np.stack(
            [rng.uniform(0, 7, N), rng.uniform(-5, 5, N)], 1
        )
        bv = np.concatenate(
            [bv, bv + rng.uniform(0.5, 2, (N, 2))], 1
        ).astype(np.float32)
        vs, off, gs = [0.16, 0.16, 4], [0, -5.12, -3], [nx, ny, 1]
        idx = box_np.precompute_anchor_area_indices(bv, vs, off, gs)
        dm = box_np.sparse_sum_for_anchors_mask(coors, (ny, nx))
        dm = dm.cumsum(0).cumsum(1)
        want = box_np.fused_get_anchors_area(
            dm, bv, vs, off, gs, indices=idx
        )
        got = cc.anchors_area(coors, ny, nx, idx)
        np.testing.assert_array_equal(got, want.astype(np.float32))

