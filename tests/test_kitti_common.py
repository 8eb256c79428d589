"""Golden tests for the KITTI label/calib/result-line I/O.

The expected values below were captured from the round-3 implementation
(itself validated against the reference's ``data/kitti_common.py``
schema), so the field-table rewrite — and any future change — must stay
byte-identical to SECOND-lineage tooling.
"""

import numpy as np
import pytest

from papc_tpu.detect.kitti import common

LABEL = (
    "Car 0.10 0 -1.58 587.01 173.33 614.12 200.12 "
    "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n"
    "Pedestrian 0.00 2 0.41 423.17 173.67 433.17 224.03 "
    "1.60 0.38 0.30 -5.87 1.63 23.11 0.03\n"
    "DontCare -1 -1 -10 503.89 169.71 590.61 190.13 "
    "-1 -1 -1 -1000 -1000 -1000 -10\n"
)

CALIB = (
    "P0: 1 0 2 0 0 1 3 0 0 0 1 0\n"
    "P1: 1 0 2 -4 0 1 3 0 0 0 1 0\n"
    "P2: 1 0 2 5 0 1 3 0.5 0 0 1 0.25\n"
    "P3: 1 0 2 -3 0 1 3 2 0 0 1 0.5\n"
    "R0_rect: 1 0.1 0 -0.1 1 0 0 0 1\n"
    "Tr_velo_to_cam: 0 -1 0 -0.04 0 0 -1 -0.07 1 0 0 -0.27\n"
    "Tr_imu_to_velo: 1 0 0 -0.8 0 1 0 0.3 0 0 1 -0.79\n"
)


@pytest.fixture()
def label_path(tmp_path):
    p = tmp_path / "000007.txt"
    p.write_text(LABEL)
    return str(p)


def test_get_label_anno_golden(label_path):
    a = common.get_label_anno(label_path)
    assert a["name"].tolist() == ["Car", "Pedestrian", "DontCare"]
    assert a["truncated"].tolist() == [0.10, 0.00, -1.0]
    assert a["occluded"].tolist() == [0, 2, -1]
    assert a["occluded"].dtype == np.int64
    assert a["alpha"].tolist() == [-1.58, 0.41, -10.0]
    assert a["bbox"].shape == (3, 4)
    assert a["bbox"][0].tolist() == [587.01, 173.33, 614.12, 200.12]
    # stored h,w,l -> l,h,w
    assert a["dimensions"][0].tolist() == [3.64, 1.65, 1.67]
    assert a["location"][1].tolist() == [-5.87, 1.63, 23.11]
    assert a["rotation_y"].tolist() == [-1.59, 0.03, -10.0]
    # no 16th column -> zero scores
    assert a["score"].tolist() == [0.0, 0.0, 0.0]
    # DontCare rows (trailing) get index -1
    assert a["index"].tolist() == [0, 1, -1]
    assert a["index"].dtype == np.int32
    assert a["group_ids"].tolist() == [0, 1, 2]


def test_get_label_anno_with_scores(tmp_path):
    p = tmp_path / "000001.txt"
    p.write_text(
        "\n".join(
            line + " 0.9312" for line in LABEL.strip().split("\n")
        )
        + "\n"
    )
    a = common.get_label_anno(str(p))
    assert a["score"].tolist() == [0.9312] * 3
    assert a["rotation_y"].tolist() == [-1.59, 0.03, -10.0]


def test_get_label_anno_empty(tmp_path):
    p = tmp_path / "000002.txt"
    p.write_text("")
    a = common.get_label_anno(str(p))
    assert a["name"].shape == (0,)
    assert a["bbox"].shape == (0, 4)
    assert a["dimensions"].shape == (0, 3)
    assert a["index"].shape == (0,)


def test_difficulty_golden(label_path):
    # Car: h=26.79 occ=0 tr=0.1 -> fails easy (h<=40), passes moderate
    # Pedestrian: h=50.36 occ=2 tr=0 -> fails easy+moderate (occ), hard
    # DontCare: h=20.42 -> fails all
    info = {"annos": common.get_label_anno(label_path)}
    diff = common.add_difficulty_to_annos(info)
    assert diff.tolist() == [1, 2, -1]
    assert info["annos"]["difficulty"] is diff


def test_read_calib_golden(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB)
    c = common.read_calib(str(p))
    assert c["calib/P2"].shape == (4, 4)
    assert c["calib/P2"][:3].tolist() == [
        [1, 0, 2, 5], [0, 1, 3, 0.5], [0, 0, 1, 0.25]
    ]
    assert c["calib/P2"][3].tolist() == [0, 0, 0, 1]
    assert c["calib/R0_rect"].shape == (4, 4)
    assert c["calib/R0_rect"][3, 3] == 1.0
    assert c["calib/R0_rect"][:3, :3].tolist() == [
        [1, 0.1, 0], [-0.1, 1, 0], [0, 0, 1]
    ]
    raw = common.read_calib(str(p), extend_matrix=False)
    assert raw["calib/P0"].shape == (3, 4)
    assert raw["calib/R0_rect"].shape == (3, 3)


def test_kitti_result_line_golden():
    line = common.kitti_result_line(
        dict(
            name="Car", alpha=-1.2, bbox=[1.5, 2, 3, 4.123456],
            dimensions=[1.5, 1.6, 3.9], location=[1, 2, 3],
            rotation_y=0.31, score=0.88,
        )
    )
    assert line == (
        "Car -1 -1 -1.2000 1.5000 2.0000 3.0000 4.1235 "
        "1.5000 1.6000 3.9000 1.0000 2.0000 3.0000 0.3100 0.8800"
    )
    # absent scalar floats fall back to str(default); vectors get
    # precision-formatted defaults
    line2 = common.kitti_result_line(
        dict(name="Cyclist", bbox=[0, 0, 1, 1], truncated=0.5,
             occluded=2),
        precision=2,
    )
    assert line2 == (
        "Cyclist 0.50 2 -10 0.00 0.00 1.00 1.00 "
        "-1.00 -1.00 -1.00 -1000.00 -1000.00 -1000.00 -10 0.0"
    )


def test_kitti_result_line_errors():
    with pytest.raises(ValueError):
        common.kitti_result_line({"name": "Car"})  # bbox required
    with pytest.raises(KeyError):
        common.kitti_result_line({"bogus": 1})


def test_empty_and_start_annos():
    e = common.empty_result_anno()
    assert e["bbox"].shape == (0, 4)
    assert e["dimensions"].shape == (0, 3)
    assert e["location"].shape == (0, 3)
    assert e["name"].shape == (0,)
    s = common.get_start_result_anno()
    assert set(s) == set(e)
    assert all(v == [] for v in s.values())


def test_filter_kitti_anno(label_path):
    a = common.get_label_anno(label_path)
    a["image_idx"] = np.array([7, 7, 7])
    f = common.filter_kitti_anno(a, ["Car"])
    assert f["name"].tolist() == ["Car"]
    assert f["image_idx"].tolist() == [7]


def test_anno_to_rbboxes(label_path):
    a = common.get_label_anno(label_path)
    rb = common.anno_to_rbboxes(a)
    assert rb.shape == (3, 7)
    assert rb[0].tolist() == [-0.65, 1.71, 46.70, 3.64, 1.65, 1.67, -1.59]
