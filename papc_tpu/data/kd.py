"""Balanced kd-tree construction + loaders for KDNet / KDUNet.

Reference parity: ``PAPC/datasets/kdloader.py`` +
``PAPC/datasets/tools/build_KDTree.py`` — per-cloud balanced kd-tree,
per-level split axes, leaf-ordered points. The reference walks scipy
cKDTree internals and yields batch-size-1 samples; here the tree is built
directly (median split on the max-spread axis — the same heuristic
scipy's ``balanced_tree`` uses) and samples batch properly.

Layout contract with the models (``papc_tpu/models/classify/kdnet.py``):
``split_dims[l]`` has ``N >> l`` entries; positions ``2i, 2i+1`` at model
level ``l`` carry the split axis of the tree node whose two size-``2^l``
children they are.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import numpy as np

from papc_tpu.data.shapenet import load_split


def build_kd_tree(points: np.ndarray, labels: np.ndarray | None = None):
    """Build a balanced kd-tree over ``points`` [N, 3], N a power of two.

    Returns ``(leaf_points [N,3], split_dims, leaf_labels)`` where
    ``split_dims[l]`` is ``[N >> l]`` int8 split axes (doubled per node —
    the model contract) and ``leaf_labels`` reorders ``labels`` (or None).
    """
    N = len(points)
    depth = int(np.log2(N))
    assert 2**depth == N, f"kd tree needs power-of-two N, got {N}"
    # native fast path (papc_cc, ~40x the python recursion)
    try:
        from papc_tpu import cc

        if cc.available():
            order, splits = cc.kd_build(np.asarray(points, np.float32))
            leaf_points = points[order]
            leaf_labels = labels[order] if labels is not None else None
            return leaf_points, splits, leaf_labels
    except Exception:
        pass
    splits = [np.zeros(N >> l, dtype=np.int32) for l in range(depth)]

    def rec(idx: np.ndarray, pos: int) -> np.ndarray:
        s = len(idx)
        if s == 1:
            return idx
        pts = points[idx]
        axis = int(np.argmax(pts.max(0) - pts.min(0)))
        order = np.argsort(pts[:, axis], kind="stable")
        sidx = idx[order]
        half = s // 2
        left = rec(sidx[:half], pos * 2)
        right = rec(sidx[half:], pos * 2 + 1)
        lvl = int(np.log2(s)) - 1  # model level merging this node's children
        splits[lvl][2 * pos] = axis
        splits[lvl][2 * pos + 1] = axis
        return np.concatenate([left, right])

    leaf_idx = rec(np.arange(N), 0)
    leaf_points = points[leaf_idx]
    leaf_labels = labels[leaf_idx] if labels is not None else None
    return leaf_points, splits, leaf_labels


class KDBatch(NamedTuple):
    points: np.ndarray  # [B, N, 3] leaf-ordered
    split_dims: tuple  # tuple of [B, N >> l] int32, l = 0..depth-1
    label: np.ndarray  # [B] int32
    pid: np.ndarray | None  # [B, N] int32 leaf-ordered part labels
    mask: np.ndarray  # [B] bool


class KDLoader:
    """Loads a ShapeNet split and pre-builds kd-trees for every cloud."""

    def __init__(
        self,
        path: str,
        mode: str = "train",
        max_point: int = 1024,
        batchsize: int = 32,
        with_pid: bool = False,
        seed: int = 0,
    ):
        self.mode = mode
        self.batchsize = batchsize
        self._rng = np.random.RandomState(seed)
        if with_pid:
            data, label, pid = load_split(path, mode, max_point, True)
        else:
            data, label = load_split(path, mode, max_point)
            pid = None
        n = len(data)
        depth = int(np.log2(max_point))
        self.points = np.zeros_like(data)
        self.splits = [
            np.zeros((n, max_point >> l), dtype=np.int32)
            for l in range(depth)
        ]
        self.pid = None if pid is None else np.zeros_like(pid)
        self.label = label
        for i in range(n):
            lp, sp, ll = build_kd_tree(
                data[i], None if pid is None else pid[i]
            )
            self.points[i] = lp
            for l in range(depth):
                self.splits[l][i] = sp[l]
            if ll is not None:
                self.pid[i] = ll

    def __len__(self) -> int:
        return -(-len(self.points) // self.batchsize)

    @property
    def num_samples(self) -> int:
        return len(self.points)

    def __call__(self) -> Iterator[KDBatch]:
        n = len(self.points)
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
            yield KDBatch(
                points=self.points[idx],
                split_dims=tuple(s[idx] for s in self.splits),
                label=self.label[idx],
                pid=None if self.pid is None else self.pid[idx],
                mask=mask,
            )
