"""papc_tpu.data — dataset loaders and offline tools."""

from papc_tpu.data.dispatch import make_dataloader
from papc_tpu.data.shapenet import Batch, ShapeNetLoader

__all__ = ["make_dataloader", "ShapeNetLoader", "Batch"]
