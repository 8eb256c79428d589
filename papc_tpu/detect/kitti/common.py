"""KITTI dataset I/O: paths, calib, label parsing, annotation utilities.

Reference parity: ``data/kitti_common.py`` — same info-dict schema
(``image_idx``, ``velodyne_path``, ``img_path``, ``img_shape``,
``calib/P0..P3``, ``calib/R0_rect``, ``calib/Tr_velo_to_cam``, ``annos``),
same label-file format, same difficulty rules, same result-line format —
so artifacts interoperate with SECOND-lineage tooling.
"""

from __future__ import annotations

import concurrent.futures as futures
import pathlib
import re
from collections import OrderedDict

import numpy as np


def get_image_index_str(img_idx: int) -> str:
    return f"{img_idx:06d}"


def _info_path(idx, prefix, info_type, suffix, training, relative_path,
               exist_check=True):
    img_idx_str = get_image_index_str(idx) + suffix
    prefix = pathlib.Path(prefix)
    split = "training" if training else "testing"
    file_path = pathlib.Path(split) / info_type / img_idx_str
    if exist_check and not (prefix / file_path).exists():
        raise ValueError(f"file not exist: {file_path}")
    return str(file_path) if relative_path else str(prefix / file_path)


def get_image_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _info_path(idx, prefix, "image_2", ".png", training,
                      relative_path, exist_check)


def get_label_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _info_path(idx, prefix, "label_2", ".txt", training,
                      relative_path, exist_check)


def get_velodyne_path(idx, prefix, training=True, relative_path=True,
                      exist_check=True):
    return _info_path(idx, prefix, "velodyne", ".bin", training,
                      relative_path, exist_check)


def get_calib_path(idx, prefix, training=True, relative_path=True,
                   exist_check=True):
    return _info_path(idx, prefix, "calib", ".txt", training,
                      relative_path, exist_check)


def _extend_matrix(mat):
    return np.concatenate([mat, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def read_calib(calib_path, extend_matrix=True):
    """Parse a KITTI calib file into the info-dict calib entries."""
    with open(calib_path) as f:
        lines = f.readlines()
    out = {}
    for i, name in enumerate(["P0", "P1", "P2", "P3"]):
        P = np.array(
            [float(v) for v in lines[i].split(" ")[1:13]]
        ).reshape(3, 4)
        out[f"calib/{name}"] = _extend_matrix(P) if extend_matrix else P
    R0 = np.array(
        [float(v) for v in lines[4].split(" ")[1:10]]
    ).reshape(3, 3)
    if extend_matrix:
        rect = np.zeros((4, 4), R0.dtype)
        rect[3, 3] = 1.0
        rect[:3, :3] = R0
    else:
        rect = R0
    out["calib/R0_rect"] = rect
    Tr = np.array(
        [float(v) for v in lines[5].split(" ")[1:13]]
    ).reshape(3, 4)
    Tr_imu = np.array(
        [float(v) for v in lines[6].split(" ")[1:13]]
    ).reshape(3, 4)
    if extend_matrix:
        Tr = _extend_matrix(Tr)
        Tr_imu = _extend_matrix(Tr_imu)
    out["calib/Tr_velo_to_cam"] = Tr
    out["calib/Tr_imu_to_velo"] = Tr_imu
    return out


def get_label_anno(label_path):
    """Parse one KITTI label file (reference :560-601). dimensions are
    converted hwl → lhw(camera)."""
    with open(label_path) as f:
        content = [line.strip().split(" ") for line in f.readlines()]
    annotations = {}
    num_objects = len([x[0] for x in content if x[0] != "DontCare"])
    annotations["name"] = np.array([x[0] for x in content])
    num_gt = len(annotations["name"])
    annotations["truncated"] = np.array([float(x[1]) for x in content])
    annotations["occluded"] = np.array([int(x[2]) for x in content])
    annotations["alpha"] = np.array([float(x[3]) for x in content])
    annotations["bbox"] = np.array(
        [[float(v) for v in x[4:8]] for x in content]
    ).reshape(-1, 4)
    annotations["dimensions"] = np.array(
        [[float(v) for v in x[8:11]] for x in content]
    ).reshape(-1, 3)[:, [2, 0, 1]]
    annotations["location"] = np.array(
        [[float(v) for v in x[11:14]] for x in content]
    ).reshape(-1, 3)
    annotations["rotation_y"] = np.array(
        [float(x[14]) for x in content]
    ).reshape(-1)
    if len(content) != 0 and len(content[0]) == 16:
        annotations["score"] = np.array([float(x[15]) for x in content])
    else:
        annotations["score"] = np.zeros((annotations["bbox"].shape[0],))
    index = list(range(num_objects)) + [-1] * (num_gt - num_objects)
    annotations["index"] = np.array(index, dtype=np.int32)
    annotations["group_ids"] = np.arange(num_gt, dtype=np.int32)
    return annotations


def get_label_annos(label_folder, image_ids=None):
    if image_ids is None:
        prog = re.compile(r"^\d{6}.txt$")
        paths = filter(
            lambda f: prog.match(f.name),
            pathlib.Path(label_folder).glob("*.txt"),
        )
        image_ids = sorted(int(p.stem) for p in paths)
    if not isinstance(image_ids, list):
        image_ids = list(range(image_ids))
    annos = []
    folder = pathlib.Path(label_folder)
    for idx in image_ids:
        anno = get_label_anno(folder / (get_image_index_str(idx) + ".txt"))
        n = anno["name"].shape[0]
        anno["image_idx"] = np.array([idx] * n, dtype=np.int64)
        annos.append(anno)
    return annos


def get_kitti_image_info(
    path,
    training=True,
    label_info=True,
    velodyne=False,
    calib=False,
    image_ids=7481,
    extend_matrix=True,
    num_worker=8,
    relative_path=True,
    with_imageshape=True,
):
    """Build the per-frame info dicts (reference :124-230)."""
    root_path = pathlib.Path(path)
    if not isinstance(image_ids, list):
        image_ids = list(range(image_ids))

    def map_func(idx):
        info = {"image_idx": idx, "pointcloud_num_features": 4}
        if velodyne:
            info["velodyne_path"] = get_velodyne_path(
                idx, path, training, relative_path
            )
        info["img_path"] = get_image_path(idx, path, training, relative_path)
        if with_imageshape:
            img_path = info["img_path"]
            if relative_path:
                img_path = str(root_path / img_path)
            from PIL import Image

            with Image.open(img_path) as im:
                w, h = im.size
            info["img_shape"] = np.array([h, w], dtype=np.int32)
        if label_info:
            label_path = get_label_path(idx, path, training, relative_path)
            if relative_path:
                label_path = str(root_path / label_path)
            info["annos"] = get_label_anno(label_path)
            add_difficulty_to_annos(info)
        if calib:
            info.update(
                read_calib(
                    get_calib_path(idx, path, training, relative_path=False),
                    extend_matrix,
                )
            )
        return info

    with futures.ThreadPoolExecutor(num_worker) as executor:
        return list(executor.map(map_func, image_ids))


# difficulty rules (reference :476-520)
_MIN_HEIGHT = [40, 25, 25]
_MAX_OCCLUSION = [0, 1, 2]
_MAX_TRUNCATION = [0.15, 0.3, 0.5]


def add_difficulty_to_annos(info):
    annos = info["annos"]
    bbox = annos["bbox"]
    height = bbox[:, 3] - bbox[:, 1]
    occlusion = annos["occluded"]
    truncation = annos["truncated"]
    n = len(height)
    easy = np.ones(n, bool)
    moderate = np.ones(n, bool)
    hard = np.ones(n, bool)
    for i, (h, o, t) in enumerate(zip(height, occlusion, truncation)):
        if o > _MAX_OCCLUSION[0] or h <= _MIN_HEIGHT[0] or t > _MAX_TRUNCATION[0]:
            easy[i] = False
        if o > _MAX_OCCLUSION[1] or h <= _MIN_HEIGHT[1] or t > _MAX_TRUNCATION[1]:
            moderate[i] = False
        if o > _MAX_OCCLUSION[2] or h <= _MIN_HEIGHT[2] or t > _MAX_TRUNCATION[2]:
            hard[i] = False
    is_moderate = np.logical_xor(easy, moderate)
    is_hard = np.logical_xor(hard, moderate)
    diff = np.full(n, -1, np.int32)
    diff[is_hard] = 2
    diff[is_moderate] = 1
    diff[easy] = 0
    annos["difficulty"] = diff
    return diff


def filter_kitti_anno(
    image_anno, used_classes, used_difficulty=None, dontcare_iou=None
):
    if not isinstance(used_classes, (list, tuple)):
        used_classes = [used_classes]
    keep = [
        i for i, x in enumerate(image_anno["name"]) if x in used_classes
    ]
    img_filtered = {
        key: image_anno[key][keep] for key in image_anno.keys()
    }
    if used_difficulty is not None:
        keep = [
            i
            for i, x in enumerate(img_filtered["difficulty"])
            if x in used_difficulty
        ]
        img_filtered = {
            key: img_filtered[key][keep] for key in img_filtered.keys()
        }
    return img_filtered


def filter_annos_low_score(image_annos, thresh):
    new = []
    for anno in image_annos:
        keep = np.where(anno["score"] >= thresh)[0]
        new.append({key: anno[key][keep] for key in anno.keys()})
    return new


def kitti_result_line(result_dict, precision=4):
    """Format one detection as a KITTI result-file line
    (reference :414-459)."""
    prec_float = "{" + f":.{precision}f" + "}"
    defaults = OrderedDict(
        [
            ("name", None),
            ("truncated", -1),
            ("occluded", -1),
            ("alpha", -10),
            ("bbox", None),
            ("dimensions", [-1, -1, -1]),
            ("location", [-1000, -1000, -1000]),
            ("rotation_y", -10),
            ("score", 0.0),
        ]
    )
    res = OrderedDict((k, None) for k in defaults)
    for key, val in result_dict.items():
        if defaults[key] is None and val is None:
            raise ValueError(f"you must specify a value for {key}")
        res[key] = val
    line = []
    for key, val in res.items():
        if key == "name":
            line.append(val)
        elif key in ("truncated", "alpha", "rotation_y", "score"):
            line.append(
                prec_float.format(val) if val is not None
                else str(defaults[key])
            )
        elif key == "occluded":
            line.append(
                f"{val}" if val is not None else str(defaults[key])
            )
        else:  # bbox / dimensions / location
            vals = val if val is not None else defaults[key]
            line += [prec_float.format(v) for v in vals]
    return " ".join(line)


def anno_to_rbboxes(anno):
    return np.concatenate(
        [
            anno["location"],
            anno["dimensions"],
            anno["rotation_y"][..., None],
        ],
        axis=1,
    )


def empty_result_anno():
    return {
        "name": np.array([]),
        "truncated": np.array([]),
        "occluded": np.array([]),
        "alpha": np.array([]),
        "bbox": np.zeros([0, 4]),
        "dimensions": np.zeros([0, 3]),
        "location": np.zeros([0, 3]),
        "rotation_y": np.array([]),
        "score": np.array([]),
    }


def get_start_result_anno():
    return {
        "name": [],
        "truncated": [],
        "occluded": [],
        "alpha": [],
        "bbox": [],
        "dimensions": [],
        "location": [],
        "rotation_y": [],
        "score": [],
    }
