"""Ground-truth database sampling (paste augmentation).

Reference parity: ``libs/ops/sample_ops.py::DataBaseSamplerV2`` —
per-class sampling up to ``name_to_max_num``, collision-tested placement
against the current scene boxes, crops' points translated to the sampled
pose. Group sampling and the random-frustum-crop path are omitted (the
shipped config uses neither — ``yaml:176-190``); ``rot_transform`` is
honored when present for artifact compatibility.
"""

from __future__ import annotations

import copy
import pathlib

import numpy as np

from papc_tpu.detect import box_np
from papc_tpu.detect.kitti.augment import BatchSampler, box_collision_test


class DataBaseSamplerV2:
    def __init__(
        self,
        db_infos: dict,
        groups: list,
        db_prepor=None,
        rate: float = 1.0,
        global_rot_range=None,
        rng: np.random.RandomState | None = None,
        log=print,
    ):
        for k, v in db_infos.items():
            log(f"load {len(v)} {k} database infos")
        if db_prepor is not None:
            db_infos = db_prepor(db_infos)
            log("After filter database:")
            for k, v in db_infos.items():
                log(f"load {len(v)} {k} database infos")

        self.db_infos = db_infos
        self._rate = rate
        self._rng = rng or np.random.RandomState()
        self._sample_classes = []
        self._sample_max_nums = []
        for group_info in groups:
            self._sample_classes += list(group_info.keys())
            self._sample_max_nums += list(group_info.values())
        self._sampler_dict = {
            k: BatchSampler(v, k, rng=self._rng)
            for k, v in db_infos.items()
        }

    def reseed(self, seed: int):
        """Deterministically reseed the draw streams (used by the
        multiprocess loader so DB-paste augmentation is a pure function
        of (base_seed, epoch, idx) — any worker count reproduces it).
        Only the classes actually sampled are rebuilt."""
        self._rng = np.random.RandomState(seed)
        for k in self._sample_classes:
            if k in self.db_infos:
                self._sampler_dict[k] = BatchSampler(
                    self.db_infos[k], k, rng=self._rng
                )

    def sample_all(
        self,
        root_path: str,
        gt_boxes: np.ndarray,
        gt_names: np.ndarray,
        num_point_features: int,
    ):
        """Fill the scene up to per-class quotas. Returns None when no
        sample survives collision testing, else a dict with ``gt_names``,
        ``difficulty``, ``gt_boxes``, ``points``, ``gt_masks``."""
        sample_num_per_class = []
        for class_name, max_num in zip(
            self._sample_classes, self._sample_max_nums
        ):
            n = int(max_num - np.sum(gt_names == class_name))
            sample_num_per_class.append(
                int(np.round(self._rate * n))
            )

        sampled, sampled_gt_boxes = [], []
        avoid = gt_boxes
        for class_name, n in zip(
            self._sample_classes, sample_num_per_class
        ):
            if n > 0:
                cls_sampled = self.sample_class(class_name, n, avoid)
                sampled += cls_sampled
                if cls_sampled:
                    boxes = np.stack(
                        [s["box3d_lidar"] for s in cls_sampled]
                    )
                    sampled_gt_boxes.append(boxes)
                    avoid = np.concatenate([avoid, boxes], axis=0)

        if not sampled:
            return None
        sampled_gt_boxes = np.concatenate(sampled_gt_boxes, axis=0)
        points_list = []
        for info in sampled:
            pts = np.fromfile(
                str(pathlib.Path(root_path) / info["path"]),
                dtype=np.float32,
            ).reshape(-1, num_point_features)
            if "rot_transform" in info:
                pts[:, :3] = box_np.rotation_points_single_angle(
                    pts[:, :3], info["rot_transform"], axis=2
                )
            pts[:, :3] += info["box3d_lidar"][:3]
            points_list.append(pts)
        return {
            "gt_names": np.array([s["name"] for s in sampled]),
            "difficulty": np.array([s["difficulty"] for s in sampled]),
            "gt_boxes": sampled_gt_boxes,
            "points": np.concatenate(points_list, axis=0),
            "gt_masks": np.ones((len(sampled),), dtype=bool),
            "group_ids": np.arange(
                len(gt_boxes), len(gt_boxes) + len(sampled)
            ),
        }

    def sample_class(self, name, num, gt_boxes):
        """Collision-tested candidate placement
        (reference ``sample_class_v2`` :234-281)."""
        sampled = copy.deepcopy(self._sampler_dict[name].sample(num))
        if not sampled:
            return []
        num_gt = len(gt_boxes)
        gt_bv = box_np.center_to_corner_box2d(
            gt_boxes[:, 0:2], gt_boxes[:, 3:5], gt_boxes[:, 6]
        )
        sp_boxes = np.stack([s["box3d_lidar"] for s in sampled])
        sp_bv = box_np.center_to_corner_box2d(
            sp_boxes[:, 0:2], sp_boxes[:, 3:5], sp_boxes[:, 6]
        )
        total_bv = np.concatenate([gt_bv, sp_bv], axis=0)
        coll = box_collision_test(total_bv, total_bv)
        np.fill_diagonal(coll, False)
        valid = []
        for i in range(num_gt, num_gt + len(sampled)):
            if coll[i].any():
                coll[i] = False
                coll[:, i] = False
            else:
                valid.append(sampled[i - num_gt])
        return valid
