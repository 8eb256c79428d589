from papc_tpu.models.segment.kdunet import KDUNet
from papc_tpu.models.segment.pointnet import PointNetSeg
from papc_tpu.models.segment.pointnet2 import (
    PointNet2MSGSeg,
    PointNet2SSGSeg,
)
from papc_tpu.models.segment.pointnet_basic import PointNetBasicSeg
from papc_tpu.models.segment.vfe import VFESeg

__all__ = [
    "KDUNet",
    "PointNetBasicSeg",
    "PointNetSeg",
    "VFESeg",
    "PointNet2SSGSeg",
    "PointNet2MSGSeg",
]
