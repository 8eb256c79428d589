"""Native KITTI eval statistics vs the python implementation."""

import numpy as np
import pytest

from papc_tpu import cc
from papc_tpu.eval.kitti_eval import compute_statistics

pytestmark = pytest.mark.skipif(
    not cc.available(), reason="papc_cc build unavailable"
)


def random_frame(rng, n_gt=6, n_dt=9, n_dc=2):
    def bbox(n):
        x1 = rng.uniform(0, 800, n)
        y1 = rng.uniform(0, 200, n)
        return np.stack(
            [x1, y1, x1 + rng.uniform(30, 120, n),
             y1 + rng.uniform(30, 120, n)], axis=1,
        )

    gt_datas = np.concatenate(
        [bbox(n_gt), rng.uniform(-np.pi, np.pi, (n_gt, 1))], axis=1
    )
    dt_datas = np.concatenate(
        [bbox(n_dt), rng.uniform(-np.pi, np.pi, (n_dt, 1)),
         rng.uniform(0, 1, (n_dt, 1))], axis=1,
    )
    overlaps = rng.uniform(0, 1, (n_dt, n_gt))
    ignored_gt = rng.choice([-1, 0, 1], n_gt)
    ignored_det = rng.choice([-1, 0, 1], n_dt)
    dc = bbox(n_dc)
    return overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc


@pytest.mark.parametrize("metric", [0, 1])
@pytest.mark.parametrize("compute_aos", [False, True])
def test_fused_statistics_matches_python(rng, metric, compute_aos):
    thresholds = np.array([0.0, 0.3, 0.6, 0.9])
    for trial in range(10):
        frame = random_frame(rng)
        pr_cc = np.zeros((len(thresholds), 4), np.float64)
        cc.kitti_eval_fused_statistics(
            *frame, metric, 0.5, thresholds, compute_aos, pr_cc
        )
        pr_py = np.zeros((len(thresholds), 4), np.float64)
        for t, thresh in enumerate(thresholds):
            tp, fp, fn, sim, _ = compute_statistics(
                *frame, metric, 0.5, thresh=thresh,
                compute_fp=True, compute_aos=compute_aos,
            )
            pr_py[t, 0] += tp
            pr_py[t, 1] += fp
            pr_py[t, 2] += fn
            if sim != -1:
                pr_py[t, 3] += sim
        np.testing.assert_allclose(pr_cc, pr_py, atol=1e-9)


@pytest.mark.skipif(not cc.available(), reason="papc_cc not built")
def test_d3_box_overlap_cc_matches_numpy(rng):
    """C++ fused 3D overlap vs the vectorized numpy twin, all criteria."""
    from papc_tpu.eval.kitti_eval import _d3_box_overlap_np

    def rand7(n):
        return np.concatenate(
            [rng.randn(n, 3) * 4, rng.rand(n, 3) * 3 + 0.3,
             rng.rand(n, 1) * 6 - 3],
            axis=1,
        )

    for criterion in (-1, 0, 1):
        b, q = rand7(50), rand7(40)
        got = cc.d3_box_overlap(b, q, criterion)
        want = _d3_box_overlap_np(b, q, criterion)
        np.testing.assert_allclose(got, want, atol=2e-4)
    # degenerate sizes
    assert cc.d3_box_overlap(rand7(0), rand7(3)).shape == (0, 3)
    assert cc.d3_box_overlap(rand7(3), rand7(0)).shape == (3, 0)


def test_batched_intersection_area_matches_scalar_clip(rng):
    """Vectorized Sutherland–Hodgman twin vs the per-pair scalar clip."""
    from papc_tpu.detect import box_np

    c1 = box_np.center_to_corner_box2d(
        rng.randn(64, 2) * 3, rng.rand(64, 2) * 3 + 0.2,
        rng.rand(64) * 6 - 3,
    )
    c2 = box_np.center_to_corner_box2d(
        rng.randn(64, 2) * 3, rng.rand(64, 2) * 3 + 0.2,
        rng.rand(64) * 6 - 3,
    )
    vec = box_np.batched_intersection_area(c1, c2)
    ref = np.array(
        [box_np._polygon_clip(a, b) for a, b in zip(c1, c2)]
    )
    np.testing.assert_allclose(vec, ref, atol=1e-9)


def test_frame_overlaps_chunking_matches_per_frame(rng):
    """Part-concatenated overlap blocks == direct per-frame overlaps."""
    from papc_tpu.eval.kitti_eval import (
        _frame_overlaps, _metric_boxes, bev_box_overlap,
        d3_box_overlap, image_box_overlap,
    )

    def rand_anno(n):
        return {
            "name": np.array(["Car"] * n),
            "bbox": rng.rand(n, 4) * 100,
            "location": rng.randn(n, 3) * 5,
            "dimensions": rng.rand(n, 3) * 3 + 0.3,
            "rotation_y": rng.rand(n) * 6 - 3,
        }

    gts = [rand_anno(int(k)) for k in rng.randint(0, 7, size=9)]
    dts = [rand_anno(int(k)) for k in rng.randint(0, 7, size=9)]
    fns = {0: image_box_overlap,
           1: lambda d, g: bev_box_overlap(d, g).astype(np.float64),
           2: lambda d, g: d3_box_overlap(d, g).astype(np.float64)}
    for metric in (0, 1, 2):
        got = _frame_overlaps(gts, dts, metric, frames_per_part=4)
        for o, gt, dt in zip(got, gts, dts):
            want = fns[metric](
                _metric_boxes(dt, metric), _metric_boxes(gt, metric)
            )
            assert o.shape == want.shape
            np.testing.assert_allclose(o, want, atol=1e-6)


@pytest.mark.parametrize("compute_aos", [False, True])
def test_fused_statistics_batch_matches_per_frame(rng, compute_aos):
    """One-call batched driver == per-frame calls, incl. empty frames."""
    thresholds = np.array([0.0, 0.3, 0.6, 0.9])
    sizes = [(6, 9, 2), (0, 4, 0), (5, 0, 1), (0, 0, 0), (8, 8, 3)]
    frames = [
        random_frame(rng, n_gt=g, n_dt=d, n_dc=c) for g, d, c in sizes
    ]
    pr_ref = np.zeros((len(thresholds), 4), np.float64)
    for frame in frames:
        cc.kitti_eval_fused_statistics(
            *frame, 0, 0.5, thresholds, compute_aos, pr_ref
        )
    pr_batch = np.zeros((len(thresholds), 4), np.float64)
    cc.kitti_eval_fused_statistics_batch(
        [f[0] for f in frames], [f[1] for f in frames],
        [f[2] for f in frames], [f[3] for f in frames],
        [f[4] for f in frames], [f[5] for f in frames],
        0, 0.5, thresholds, compute_aos, pr_batch,
    )
    np.testing.assert_allclose(pr_batch, pr_ref, atol=1e-9)
    # and threaded partials merge exactly (force nt>1 via num_threads)
    pr_threaded = np.zeros((len(thresholds), 4), np.float64)
    many = frames * 20  # 100 frames > the nt=1 small-batch cutoff
    cc.kitti_eval_fused_statistics_batch(
        [f[0] for f in many], [f[1] for f in many],
        [f[2] for f in many], [f[3] for f in many],
        [f[4] for f in many], [f[5] for f in many],
        0, 0.5, thresholds, compute_aos, pr_threaded, num_threads=4,
    )
    np.testing.assert_allclose(pr_threaded, pr_ref * 20, atol=1e-7)


def test_collect_thresholds_batch_matches_per_frame(rng):
    sizes = [(6, 9), (0, 4), (5, 0), (0, 0), (8, 8)]
    frames = [random_frame(rng, n_gt=g, n_dt=d) for g, d in sizes]
    ref = []
    for f in frames:
        ref += cc.kitti_eval_collect_thresholds(
            f[0], f[2][:, -1], f[3], f[4], 0.5
        ).tolist()
    got = cc.kitti_eval_collect_thresholds_batch(
        [f[0] for f in frames], [f[2][:, -1] for f in frames],
        [f[3] for f in frames], [f[4] for f in frames], 0.5,
    )
    np.testing.assert_allclose(got, np.asarray(ref), atol=0)
