"""Host-only official-KITTI-eval wall time at val-split scale.

Synthesizes 3769 frames (~15 det / ~7 gt per frame by default; pass a
det range for the realistic ~30-50 pre-NMS-output load) and times
``get_official_eval_result`` end to end (bbox+bev+3d+AOS, both overlap
settings), reporting peak RSS — the r4 per-frame overlap cache
(eval/kitti_eval.py) is memory we must bound, not just time. Pure host
benchmark — no device. Usage:

    python experiments/bench_official_eval.py [n_frames] [dt_lo dt_hi]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from papc_tpu.eval.kitti_eval import get_official_eval_result


def synth_annos(rng, n_frames, dt_lo=8, dt_hi=22):
    gts, dts = [], []
    for _ in range(n_frames):
        n_gt = int(rng.integers(3, 12))
        n_dt = int(rng.integers(dt_lo, dt_hi))
        names = rng.choice(
            ["Car", "Van", "Pedestrian", "DontCare"],
            size=n_gt, p=[0.6, 0.15, 0.15, 0.1],
        )
        x1 = rng.uniform(0, 1100, n_gt)
        y1 = rng.uniform(0, 300, n_gt)
        bbox = np.stack(
            [x1, y1, x1 + rng.uniform(25, 150, n_gt),
             y1 + rng.uniform(25, 150, n_gt)], axis=1,
        )
        loc = np.stack(
            [rng.uniform(-30, 30, n_gt), rng.uniform(-1, 3, n_gt),
             rng.uniform(5, 70, n_gt)], axis=1,
        )
        dims = rng.uniform(0.5, 4.5, (n_gt, 3))
        rot = rng.uniform(-np.pi, np.pi, n_gt)
        gts.append({
            "name": names,
            "truncated": rng.uniform(0, 0.6, n_gt),
            "occluded": rng.integers(0, 4, n_gt),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": bbox,
            "location": loc,
            "dimensions": dims,
            "rotation_y": rot,
        })
        # detections: jittered copies of some gts + random spurious
        n_copy = min(n_gt, n_dt)
        sel = rng.permutation(n_gt)[:n_copy]
        pad = n_dt - n_copy
        dbbox = np.concatenate(
            [bbox[sel] + rng.normal(0, 6, (n_copy, 4)),
             np.stack([x1[:1]] * 4, axis=1).repeat(pad, 0)
             + rng.uniform(0, 400, (pad, 4))],
        )
        dloc = np.concatenate(
            [loc[sel] + rng.normal(0, 0.4, (n_copy, 3)),
             rng.uniform(-30, 30, (pad, 3))],
        )
        ddims = np.concatenate(
            [dims[sel] * rng.uniform(0.9, 1.1, (n_copy, 3)),
             rng.uniform(0.5, 4.5, (pad, 3))],
        )
        drot = np.concatenate(
            [rot[sel] + rng.normal(0, 0.2, n_copy),
             rng.uniform(-np.pi, np.pi, pad)],
        )
        dts.append({
            "name": rng.choice(["Car", "Pedestrian"], n_dt, p=[0.8, 0.2]),
            "truncated": np.zeros(n_dt),
            "occluded": np.zeros(n_dt, np.int64),
            "alpha": rng.uniform(-np.pi, np.pi, n_dt),
            "bbox": dbbox,
            "location": dloc,
            "dimensions": ddims,
            "rotation_y": drot,
            "score": rng.uniform(0, 1, n_dt),
        })
    return gts, dts


def main():
    import resource

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3769
    dt_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 22
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    gts, dts = synth_annos(rng, n_frames, dt_lo, dt_hi)
    n_det = sum(len(d["score"]) for d in dts)
    print(
        f"synth {n_frames} frames, {n_det / n_frames:.1f} det/frame: "
        f"{time.perf_counter() - t0:.2f} s"
    )
    for trial in range(3):
        t0 = time.perf_counter()
        result = get_official_eval_result(
            gts, dts, current_classes=[0]
        )
        dt = time.perf_counter() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f"trial {trial}: {dt:.2f} s ({dt / n_frames * 1e3:.2f} "
              f"ms/frame), peak RSS {rss:.2f} GB")
    print(result)


if __name__ == "__main__":
    main()
