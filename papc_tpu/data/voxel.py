"""Voxel-occupancy data path for VoxNet.

Reference parity: ``PAPC/datasets/voxloader.py`` +
``tools/build_VoxData.py`` — 32^3 occupancy grids. The reference
pre-rasterizes ModelNet ``.txt`` clouds into ``.npy`` files and reads a
``train.txt`` list; both that offline path (:func:`build_voxel_dataset`)
and a direct rasterize-from-ShapeNet-h5 loader (:class:`VoxelLoader`) are
provided so VoxNet trains from the same h5 pipeline as the rest of the
zoo.
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

from papc_tpu.data.shapenet import load_split

GRID = 32

# ModelNet-10 category map (reference tools/build_VoxData.py:4-39)
CATEGORY = {
    "bathtub": 0, "bed": 1, "chair": 2, "door": 3, "dresser": 4,
    "airplane": 5, "piano": 6, "sofa": 7, "person": 8, "cup": 9,
}
CATEGORY_LIST = list(CATEGORY)


def rasterize(points: np.ndarray, grid: int = GRID) -> np.ndarray:
    """Rasterize a normalized cloud (coords in [-1, 1]) into a binary
    ``[grid, grid, grid]`` occupancy array — reference
    ``build_VoxData.py:55-60`` (``int(x*15.5+15.5)`` mapping)."""
    half = (grid - 1) / 2.0
    ijk = (points[:, :3] * half + half).astype(np.int64)
    ijk = np.clip(ijk, 0, grid - 1)
    arr = np.zeros((grid, grid, grid), dtype=np.float32)
    arr[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = 1.0
    return arr


def build_voxel_dataset(modelnet_dir: str, out_dir: str):
    """Offline tool: rasterize ModelNet ``.txt`` clouds into ``.npy``
    grids + train/test list files (reference ``build_VoxData.py:41-78``,
    same 1-in-60 test split)."""
    os.makedirs(out_dir, exist_ok=True)
    f_train = open(os.path.join(out_dir, "train.txt"), "w")
    f_test = open(os.path.join(out_dir, "test.txt"), "w")
    for name in CATEGORY_LIST:
        src = os.path.join(modelnet_dir, name)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(out_dir, name)
        os.makedirs(dst, exist_ok=True)
        for count, fname in enumerate(sorted(os.listdir(src))):
            pts = np.loadtxt(
                os.path.join(src, fname), delimiter=",", usecols=(0, 1, 2)
            )
            arr = rasterize(pts.astype(np.float32))
            out = os.path.join(dst, fname.split(".")[0] + ".npy")
            np.save(out, arr)
            line = f"{out} {name}\n"
            (f_test if count % 60 == 0 else f_train).write(line)
    f_train.close()
    f_test.close()


class VoxBatch(NamedTuple):
    voxels: np.ndarray  # [B, 32, 32, 32, 1]
    label: np.ndarray  # [B]
    pid: None
    mask: np.ndarray  # [B]


class VoxelLoader:
    """Rasterizes ShapeNet h5 clouds into occupancy grids at load time."""

    def __init__(
        self,
        path: str,
        mode: str = "train",
        max_point: int = 1024,
        batchsize: int = 32,
        seed: int = 0,
    ):
        self.mode = mode
        self.batchsize = batchsize
        self._rng = np.random.RandomState(seed)
        data, label = load_split(path, mode, max_point)
        # normalize each cloud into [-1, 1] before rasterizing
        n = len(data)
        self.voxels = np.zeros((n, GRID, GRID, GRID, 1), dtype=np.float32)
        for i in range(n):
            pts = data[i]
            pts = pts - pts.mean(0)
            scale = np.abs(pts).max() + 1e-6
            self.voxels[i, ..., 0] = rasterize(pts / scale)
        self.label = label

    def __len__(self) -> int:
        return -(-len(self.voxels) // self.batchsize)

    @property
    def num_samples(self) -> int:
        return len(self.voxels)

    def __call__(self) -> Iterator[VoxBatch]:
        n = len(self.voxels)
        order = np.arange(n)
        if self.mode == "train":
            self._rng.shuffle(order)
        bs = self.batchsize
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            valid = len(idx)
            if valid < bs:
                idx = np.resize(idx, bs)
                mask = np.zeros(bs, dtype=bool)
                mask[:valid] = True
            else:
                mask = np.ones(bs, dtype=bool)
            yield VoxBatch(
                voxels=self.voxels[idx],
                label=self.label[idx],
                pid=None,
                mask=mask,
            )


class VoxelFileLoader:
    """Reads the reference's ``train.txt``/``test.txt`` + ``.npy`` format
    (``voxloader.py:5-39``)."""

    def __init__(self, data_dir: str, mode: str = "train",
                 batchsize: int = 64, seed: int = 0):
        self.mode = mode
        self.batchsize = batchsize
        self._rng = np.random.RandomState(seed)
        list_file = os.path.join(
            data_dir, "train.txt" if mode == "train" else "test.txt"
        )
        voxels, labels = [], []
        with open(list_file) as f:
            for line in f:
                p, name = line.rsplit(" ", 1)
                voxels.append(np.load(p))
                labels.append(CATEGORY[name.strip()])
        self.voxels = np.asarray(voxels, np.float32)[..., None]
        self.label = np.asarray(labels, np.int32)

    def __call__(self) -> Iterator[VoxBatch]:
        n = len(self.voxels)
        order = np.arange(n)
        if self.mode == "train":
            self._rng.shuffle(order)
        bs = self.batchsize
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            valid = len(idx)
            if valid < bs:
                idx = np.resize(idx, bs)
                mask = np.zeros(bs, dtype=bool)
                mask[:valid] = True
            else:
                mask = np.ones(bs, dtype=bool)
            yield VoxBatch(self.voxels[idx], self.label[idx], None, mask)
