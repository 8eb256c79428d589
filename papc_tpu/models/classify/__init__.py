from papc_tpu.models.classify.kdnet import KDNet
from papc_tpu.models.classify.pointnet import (
    PointNetClas,
    PointNetConv2DClas,
)
from papc_tpu.models.classify.pointnet2 import (
    PointNet2MSGClas,
    PointNet2SSGClas,
)
from papc_tpu.models.classify.pointnet_basic import PointNetBasicClas
from papc_tpu.models.classify.vfe import VFEClas
from papc_tpu.models.classify.voxnet import VoxNet

__all__ = [
    "VoxNet",
    "KDNet",
    "PointNetBasicClas",
    "PointNetClas",
    "PointNetConv2DClas",
    "VFEClas",
    "PointNet2SSGClas",
    "PointNet2MSGClas",
]
