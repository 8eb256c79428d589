"""Multiprocess loader: picklability + worker-count-invariant samples."""

import pathlib

import numpy as np
import pytest

from papc_tpu.data.synthetic_kitti import write_kitti
from papc_tpu.data.workers import SamplePool
from papc_tpu.detect.anchors import AnchorGeneratorStride
from papc_tpu.detect.box_coder import GroundBox3dCoder
from papc_tpu.detect.kitti.create_data import (
    create_groundtruth_database,
    create_kitti_info_file,
    create_reduced_point_cloud,
)
from papc_tpu.detect.kitti.preprocess import KittiDataset, prep_pointcloud
from papc_tpu.detect.kitti.sampling import DataBaseSamplerV2
from papc_tpu.detect.similarity import NearestIouSimilarity
from papc_tpu.detect.target import TargetAssigner
from papc_tpu.detect.voxelize_np import VoxelGenerator

PC_RANGE = [0, -39.68, -3, 69.12, 39.68, 1]
VOXEL_SIZE = [1.08, 1.24, 4.0]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import functools
    import pickle

    root = tmp_path_factory.mktemp("kitti_workers")
    write_kitti(str(root), n_train=4, n_val=1, num_cars=2)
    create_kitti_info_file(
        str(root), imageset_dir=str(pathlib.Path(root) / "ImageSets")
    )
    create_reduced_point_cloud(str(root))
    create_groundtruth_database(str(root), used_classes=["Car"])

    voxel_gen = VoxelGenerator(VOXEL_SIZE, PC_RANGE, 20, 500)
    gen = AnchorGeneratorStride(
        sizes=[1.6, 3.9, 1.56],
        anchor_strides=[2.16, 2.48, 0.0],
        anchor_offsets=[1.08, -38.44, -1.78],
        rotations=[0, np.pi / 2],
        match_threshold=0.6,
        unmatch_threshold=0.45,
    )
    assigner = TargetAssigner(
        GroundBox3dCoder(), [gen], NearestIouSimilarity()
    )
    with open(root / "kitti_dbinfos_train.pkl", "rb") as f:
        db_infos = pickle.load(f)
    db_sampler = DataBaseSamplerV2(
        db_infos, [{"Car": 6}], log=lambda *a: None
    )
    prep_func = functools.partial(
        prep_pointcloud,
        root_path=str(root),
        voxel_generator=voxel_gen,
        target_assigner=assigner,
        db_sampler=db_sampler,
        max_voxels=500,
        training=True,
    )
    grid = voxel_gen.grid_size
    ds = KittiDataset(
        str(root / "kitti_infos_train.pkl"),
        str(root),
        4,
        assigner,
        [1, grid[1] // 2, grid[0] // 2],
        prep_func,
        base_seed=7,
        db_sampler=db_sampler,
    )
    ds.enable_per_item_sampler_seeding(True)
    return ds


def _fetch_inprocess(ds, epoch, indices):
    ds.set_epoch(epoch)
    return [ds[i] for i in indices]


def test_worker_counts_agree_with_inprocess(dataset):
    indices = [0, 1, 2, 3]
    ref = _fetch_inprocess(dataset, epoch=3, indices=indices)
    for workers in (1, 2):
        with SamplePool(dataset, workers) as pool:
            got = list(pool.imap(3, indices))
        for r, g in zip(ref, got):
            for key in ("voxels", "labels", "reg_targets"):
                np.testing.assert_array_equal(
                    r[key], g[key], err_msg=f"{workers=} {key}"
                )


def test_epochs_differ(dataset):
    a = _fetch_inprocess(dataset, epoch=1, indices=[0])[0]
    b = _fetch_inprocess(dataset, epoch=2, indices=[0])[0]
    # augmentation noise must change between epochs
    assert not np.array_equal(a["voxels"], b["voxels"])
