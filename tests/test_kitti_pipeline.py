"""End-to-end KITTI data pipeline tests on a synthetic mini dataset:
create_data artifacts → gt database → prep_pointcloud → collated batch."""

import pathlib
import pickle

import numpy as np
import pytest

from papc_tpu.data.synthetic_kitti import write_kitti
from papc_tpu.detect.anchors import AnchorGeneratorStride
from papc_tpu.detect.box_coder import GroundBox3dCoder
from papc_tpu.detect.kitti.create_data import (
    create_groundtruth_database,
    create_kitti_info_file,
    create_reduced_point_cloud,
)
from papc_tpu.detect.kitti.preprocess import (
    KittiDataset,
    collate_batch,
    prep_pointcloud,
)
from papc_tpu.detect.kitti.sampling import DataBaseSamplerV2
from papc_tpu.detect.similarity import NearestIouSimilarity
from papc_tpu.detect.target import TargetAssigner
from papc_tpu.detect.voxelize_np import VoxelGenerator

PC_RANGE = [0, -39.68, -3, 69.12, 39.68, 1]
VOXEL_SIZE = [0.64, 0.64, 4.0]  # coarse grid for speed: 108 x 124
MAX_VOXELS = 2000


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    write_kitti(str(root), n_train=4, n_val=2, num_cars=3)
    create_kitti_info_file(
        str(root), imageset_dir=str(pathlib.Path(root) / "ImageSets")
    )
    create_reduced_point_cloud(str(root))
    create_groundtruth_database(str(root), used_classes=["Car"])
    return root


@pytest.fixture(scope="module")
def pipeline(kitti_root):
    voxel_gen = VoxelGenerator(VOXEL_SIZE, PC_RANGE, 35, MAX_VOXELS)
    gen = AnchorGeneratorStride(
        sizes=[1.6, 3.9, 1.56],
        anchor_strides=[1.28, 1.28, 0.0],
        anchor_offsets=[0.64, -39.04, -1.78],
        rotations=[0, np.pi / 2],
        match_threshold=0.6,
        unmatch_threshold=0.45,
    )
    assigner = TargetAssigner(
        GroundBox3dCoder(), [gen], NearestIouSimilarity()
    )
    return voxel_gen, assigner


def test_artifacts_exist(kitti_root):
    assert (kitti_root / "kitti_infos_train.pkl").exists()
    assert (kitti_root / "kitti_infos_val.pkl").exists()
    assert (kitti_root / "kitti_dbinfos_train.pkl").exists()
    assert (kitti_root / "training" / "velodyne_reduced").is_dir()
    with open(kitti_root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 4
    anno = infos[0]["annos"]
    assert (anno["name"] == "Car").all()
    # synthetic car clusters produce many points per GT
    assert (anno["num_points_in_gt"] > 20).all()


def test_gt_database_points_centered(kitti_root):
    with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Car"]) == 12  # 4 frames x 3 cars
    info = db["Car"][0]
    pts = np.fromfile(
        str(kitti_root / info["path"]), np.float32
    ).reshape(-1, 4)
    assert len(pts) == info["num_points_in_gt"]
    # crop is centered at the box origin
    assert np.abs(pts[:, :2].mean(0)).max() < 3.0


def test_dataset_prep_and_collate(kitti_root, pipeline):
    voxel_gen, assigner = pipeline
    grid = voxel_gen.grid_size
    fmap = [1, grid[1] // 2, grid[0] // 2]

    def prep_func(input_dict, anchor_cache=None, rng=None):
        return prep_pointcloud(
            input_dict,
            str(kitti_root),
            voxel_gen,
            assigner,
            max_voxels=MAX_VOXELS,
            training=True,
            anchor_cache=anchor_cache,
            rng=rng or np.random.RandomState(0),
        )

    ds = KittiDataset(
        str(kitti_root / "kitti_infos_train.pkl"),
        str(kitti_root),
        4,
        assigner,
        fmap,
        prep_func,
    )
    assert len(ds) == 4
    ex = ds[0]
    V = MAX_VOXELS
    assert ex["voxels"].shape == (V, 35, 4)
    assert ex["coordinates"].shape == (V, 3)
    A = np.prod(fmap) * 2
    assert ex["anchors"].shape == (A, 7)
    assert ex["labels"].shape == (A,)
    assert ex["reg_targets"].shape == (A, 7)
    # synthetic cars must yield at least one positive anchor
    assert (ex["labels"] > 0).sum() >= 1
    assert ex["anchors_mask"].sum() > 0

    batch = collate_batch([ds[0], ds[1]])
    assert batch["voxels"].shape == (2, V, 35, 4)
    assert batch["labels"].shape == (2, A)


def test_db_sampler_fills_scene(kitti_root):
    with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    sampler = DataBaseSamplerV2(
        db, [{"Car": 8}], rng=np.random.RandomState(0),
        log=lambda *a: None,
    )
    gt_boxes = np.array(
        [[10.0, 0, -1.7, 1.6, 3.9, 1.56, 0.0]], np.float32
    )
    out = sampler.sample_all(
        str(kitti_root), gt_boxes, np.array(["Car"]), 4
    )
    assert out is not None
    assert len(out["gt_boxes"]) >= 1
    assert out["points"].shape[1] == 4
    # sampled boxes must not collide with the existing gt
    from papc_tpu.detect import box_np
    from papc_tpu.detect.kitti.augment import box_collision_test

    all_boxes = np.concatenate([gt_boxes, out["gt_boxes"]])
    bv = box_np.center_to_corner_box2d(
        all_boxes[:, :2], all_boxes[:, 3:5], all_boxes[:, 6]
    )
    coll = box_collision_test(bv, bv)
    np.fill_diagonal(coll, False)
    assert not coll.any()


def test_eval_mode_prep_has_no_targets(kitti_root, pipeline):
    voxel_gen, assigner = pipeline
    grid = voxel_gen.grid_size
    fmap = [1, grid[1] // 2, grid[0] // 2]

    def prep_func(input_dict, anchor_cache=None, rng=None):
        return prep_pointcloud(
            input_dict,
            str(kitti_root),
            voxel_gen,
            assigner,
            max_voxels=MAX_VOXELS,
            training=False,
            anchor_cache=anchor_cache,
            rng=rng,
        )

    ds = KittiDataset(
        str(kitti_root / "kitti_infos_val.pkl"),
        str(kitti_root),
        4,
        assigner,
        fmap,
        prep_func,
    )
    ex = ds[0]
    assert "labels" not in ex
    assert "anchors" in ex


def test_synthetic_scene_labels_contain_their_points():
    """Yaw-convention invariant of the synthetic generator: every car
    cluster must fall inside its labeled box (a sign flip here silently
    poisons rotation learning — the labels stay self-consistent for the
    eval but disagree with the geometry the network sees)."""
    from papc_tpu.data.synthetic_kitti import make_scene
    from papc_tpu.detect import box_np

    rng = np.random.RandomState(3)
    pts, boxes = make_scene(rng, num_cars=6, n_background=0)
    captured = box_np.points_in_rbbox(pts, boxes).any(axis=1)
    assert captured.mean() == 1.0
