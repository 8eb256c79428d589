"""Synthetic miniature KITTI dataset for tests, smokes and benches.

Writes a directory tree with the exact layout the KITTI pipeline consumes
(``training/velodyne/*.bin``, ``label_2/*.txt``, ``calib/*.txt``,
``image_2/*.png``, imageset splits) with geometrically consistent scenes:
car-like boxes populated with point clusters over a ground plane, labels
derived by the exact inverse of the pipeline's camera→lidar transform.
"""

from __future__ import annotations

import pathlib

import numpy as np

from papc_tpu.detect import box_np
from papc_tpu.detect.kitti.common import kitti_result_line

IMG_H, IMG_W = 375, 1242


def default_calib():
    P = np.zeros((4, 4))
    P[0] = [700.0, 0.0, IMG_W / 2, 0.0]
    P[1] = [0.0, 700.0, IMG_H / 2, 0.0]
    P[2] = [0.0, 0.0, 1.0, 0.0]
    P[3, 3] = 1.0
    rect = np.eye(4)
    Tr = np.zeros((4, 4))
    # velodyne (x fwd, y left, z up) -> camera (x right, y down, z fwd)
    Tr[0, 1] = -1.0
    Tr[1, 2] = -1.0
    Tr[2, 0] = 1.0
    Tr[1, 3] = 1.7  # sensor height above camera
    Tr[3, 3] = 1.0
    return P, rect, Tr


def _calib_text(P, rect, Tr):
    def row(name, mat, n):
        vals = " ".join(f"{v:.12e}" for v in mat[:n].reshape(-1))
        return f"{name}: {vals}"

    lines = [
        row("P0", P, 3),
        row("P1", P, 3),
        row("P2", P, 3),
        row("P3", P, 3),
        row("R0_rect", rect[:3, :3], 3),
        row("Tr_velo_to_cam", Tr, 3),
        row("Tr_imu_to_velo", np.eye(4), 3),
    ]
    return "\n".join(lines) + "\n"


def make_scene(
    rng,
    num_cars=3,
    n_background=2000,
    x_range=(8.0, 50.0),
    y_range=(-15.0, 15.0),
    car_points=(80, 200),
):
    """Random lidar-frame scene. Returns (points [N,4], gt_boxes [M,7])."""
    boxes = []
    for _ in range(num_cars):
        x = rng.uniform(*x_range)
        y = rng.uniform(*y_range)
        z = rng.uniform(-1.8, -1.4)  # bottom near ground
        w, l, h = 1.6, 3.9, 1.56
        yaw = rng.uniform(-np.pi, np.pi)
        boxes.append([x, y, z, w, l, h, yaw])
    gt_boxes = np.asarray(boxes, np.float32)

    pts = []
    # ground plane
    g = np.stack(
        [
            rng.uniform(0, 69.0, n_background),
            rng.uniform(-39.0, 39.0, n_background),
            rng.normal(-1.75, 0.03, n_background),
            rng.uniform(0, 1, n_background),
        ],
        axis=1,
    )
    pts.append(g)
    # car point clusters (uniform inside each box, rotated+translated).
    # Rotation MUST use the pipeline's yaw convention
    # (rotation_points_single_angle's row-vector form) or the labels are
    # inconsistent with the points for diagonal cars — the capture rate
    # of points_in_rbbox on its own boxes is the invariant.
    for b in gt_boxes:
        n = int(rng.randint(*car_points))
        local = np.stack(
            [
                rng.uniform(-b[3] / 2 + 0.03, b[3] / 2 - 0.03, n),
                rng.uniform(-b[4] / 2 + 0.03, b[4] / 2 - 0.03, n),
                rng.uniform(0.05, b[5] - 0.05, n),
            ],
            axis=1,
        )
        xyz = box_np.rotation_points_single_angle(
            local, b[6], axis=2
        ) + b[:3]
        refl = rng.uniform(0, 1, n)
        pts.append(
            np.concatenate([xyz, refl[:, None]], axis=1)
        )
    return np.concatenate(pts).astype(np.float32), gt_boxes


def write_kitti(
    path: str,
    n_train: int = 8,
    n_val: int = 4,
    seed: int = 0,
    num_cars: int = 3,
    x_range=(8.0, 50.0),
    y_range=(-15.0, 15.0),
    car_points=(80, 200),
) -> str:
    """Create a miniature KITTI tree under ``path``."""
    rng = np.random.RandomState(seed)
    root = pathlib.Path(path)
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
        (root / "testing" / sub).mkdir(parents=True, exist_ok=True)
    P, rect, Tr = default_calib()
    calib_text = _calib_text(P, rect, Tr)

    # only the image SHAPE matters to the pipeline (frustum culling)
    from PIL import Image

    img = Image.new("RGB", (IMG_W, IMG_H))

    ids = list(range(n_train + n_val))
    for idx in ids:
        stem = f"{idx:06d}"
        points, gt_lidar = make_scene(
            rng, num_cars=num_cars, x_range=x_range, y_range=y_range,
            car_points=car_points,
        )
        points.tofile(str(root / "training" / "velodyne" / f"{stem}.bin"))
        (root / "training" / "calib" / f"{stem}.txt").write_text(calib_text)
        img.save(str(root / "training" / "image_2" / f"{stem}.png"))
        # labels: exact inverse of the pipeline's camera->lidar path
        cam = box_np.box_lidar_to_camera(gt_lidar, rect, Tr)
        corners = box_np.center_to_corner_box3d(
            cam[:, :3], cam[:, 3:6], cam[:, 6],
            origin=(0.5, 1.0, 0.5), axis=1,
        )
        img_pts = box_np.project_to_image(corners, P)
        bbox = np.concatenate(
            [img_pts.min(1), img_pts.max(1)], axis=1
        )
        bbox[:, [0, 2]] = np.clip(bbox[:, [0, 2]], 0, IMG_W - 1)
        bbox[:, [1, 3]] = np.clip(bbox[:, [1, 3]], 50, IMG_H - 1)
        lines = []
        for i in range(len(cam)):
            l_, h_, w_ = cam[i, 3], cam[i, 4], cam[i, 5]
            lines.append(
                kitti_result_line(
                    {
                        "name": "Car",
                        "truncated": 0.0,
                        "occluded": 0,
                        "alpha": 0.0,
                        "bbox": bbox[i],
                        # label-file dims order is h, w, l (the parser
                        # permutes back to lhw)
                        "dimensions": [h_, w_, l_],
                        "location": cam[i, :3],
                        "rotation_y": cam[i, 6],
                    }
                )
            )
        (root / "training" / "label_2" / f"{stem}.txt").write_text(
            "\n".join(lines) + "\n"
        )

    sets = root / "ImageSets"
    sets.mkdir(exist_ok=True)
    train_ids = ids[:n_train]
    val_ids = ids[n_train:]
    (sets / "train.txt").write_text(
        "\n".join(f"{i:06d}" for i in train_ids) + "\n"
    )
    (sets / "val.txt").write_text(
        "\n".join(f"{i:06d}" for i in val_ids) + "\n"
    )
    (sets / "test.txt").write_text("")
    return str(root)
