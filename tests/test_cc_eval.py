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
