"""Model registry: (model_name, mode) → Flax module + input kind.

Mirrors the reference trainer's ``init_model`` dispatch table
(``PAPC/train.py:8-60``): the same 13 model/mode combos, same default
hyperparameters. ``input_kind`` tells the data layer which loader family
feeds the model ('points' = ShapeNet clouds, 'kd' = kd-tree leaves +
split dims, 'voxel' = 32^3 occupancy grids), matching the reference's
``DataLoader`` dispatch (``PAPC/datasets/dataloader.py:5-40``).
"""

from __future__ import annotations

import dataclasses

from flax import linen as nn

from papc_tpu.models import classify, segment


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    model: nn.Module
    input_kind: str  # 'points' | 'kd' | 'voxel'
    mode: str  # 'clas' | 'seg'


def init_model(
    model_name: str = "pointnet_basic",
    mode: str = "clas",
    num_classes: int = 16,
    num_parts: int = 50,
    max_point: int = 1024,
) -> ModelSpec:
    if mode == "clas":
        table = {
            "voxnet": (classify.VoxNet(num_classes=num_classes), "voxel"),
            "kdnet": (classify.KDNet(num_classes=num_classes), "kd"),
            "pointnet_basic": (
                classify.PointNetBasicClas(
                    num_classes=num_classes, max_points=max_point
                ),
                "points",
            ),
            "pointnet": (
                classify.PointNetClas(
                    num_classes=num_classes, max_point=max_point
                ),
                "points",
            ),
            # the reference ships (but never exports) a Conv2D-flavored
            # PointNet with a LogSoftmax head; here it is a first-class
            # registry entry (pointnet_Conv2D.py)
            "pointnet_conv2d": (
                classify.PointNetConv2DClas(
                    num_classes=num_classes, max_point=max_point
                ),
                "points",
            ),
            "vfe": (
                classify.VFEClas(
                    num_classes=num_classes, max_points=max_point
                ),
                "points",
            ),
            "pointnet2_ssg": (
                classify.PointNet2SSGClas(num_classes=num_classes),
                "points",
            ),
            "pointnet2_msg": (
                classify.PointNet2MSGClas(num_classes=num_classes),
                "points",
            ),
        }
    elif mode == "seg":
        table = {
            "kdunet": (segment.KDUNet(num_classes=num_parts), "kd"),
            "pointnet_basic": (
                segment.PointNetBasicSeg(
                    num_classes=num_parts, max_points=max_point
                ),
                "points",
            ),
            "pointnet": (
                segment.PointNetSeg(
                    num_classes=num_parts, max_point=max_point
                ),
                "points",
            ),
            "vfe": (
                segment.VFESeg(
                    num_classes=num_parts, max_points=max_point
                ),
                "points",
            ),
            "pointnet2_ssg": (
                segment.PointNet2SSGSeg(
                    num_classes=num_classes, num_parts=num_parts
                ),
                "points",
            ),
            "pointnet2_msg": (
                segment.PointNet2MSGSeg(
                    num_classes=num_classes, num_parts=num_parts
                ),
                "points",
            ),
        }
    elif mode == "detect":
        raise SystemExit(
            "Error: use papc_tpu.models.detect / the detection CLI for "
            "detection models"
        )
    else:
        raise SystemExit('Error: mode should be "clas", "detect" or "seg"')

    if model_name not in table:
        raise SystemExit("Error: model is incorrect")
    model, kind = table[model_name]
    return ModelSpec(model=model, input_kind=kind, mode=mode)
