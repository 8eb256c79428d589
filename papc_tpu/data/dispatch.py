"""Loader dispatch: (mode, model_name) → loader, mirroring the
reference's ``PAPC/datasets/dataloader.py:5-40`` table."""

from __future__ import annotations

from papc_tpu.data.kd import KDLoader
from papc_tpu.data.shapenet import ShapeNetLoader
from papc_tpu.data.voxel import VoxelLoader

_KD_MODELS = {"kdnet", "kdunet"}
_VOX_MODELS = {"voxnet"}
_POINT_MODELS = {
    "pointnet_basic",
    "pointnet",
    "vfe",
    "pointnet2_ssg",
    "pointnet2_msg",
}


def make_dataloader(
    model_name: str,
    max_point: int,
    batchsize: int,
    path: str = "./data/",
    mode1: str = "clas",
    mode2: str = "train",
    seed: int = 0,
):
    if mode1 not in ("clas", "seg"):
        raise SystemExit('Error: mode should be "clas", "detect" or "seg"')
    if model_name in _VOX_MODELS:
        return VoxelLoader(path, mode2, max_point, batchsize, seed=seed)
    if model_name in _KD_MODELS:
        return KDLoader(
            path, mode2, max_point, batchsize,
            with_pid=(mode1 == "seg"), seed=seed,
        )
    if model_name in _POINT_MODELS:
        return ShapeNetLoader(
            path, mode2, max_point, batchsize,
            with_pid=(mode1 == "seg"), seed=seed,
        )
    raise SystemExit("Error: model is incorrect")
