"""DrivingStereo manifest builder (rag_tpu.data.manifests) — list format
and split protocol match the reference's shipped lists
(src/filenames/drivingstereo/*.txt: 400/100 per scene, 4 columns)."""

import os

import numpy as np
import pytest

from rag_tpu.data.manifests import (
    SCENES,
    build_drivingstereo_manifests,
    scene_lists,
)
from rag_tpu.data.stereo_dataset import load_file_list


def _fake_root(tmp_path, n_per_scene=12):
    root = tmp_path / "ds"
    for scene in SCENES:
        for sub in ("left-image-half-size", "right-image-half-size",
                    "disparity-map-half-size"):
            (root / scene / sub).mkdir(parents=True)
        for i in range(n_per_scene):
            stem = f"2018-10-31-06-55-01_frame-{i:03d}"
            (root / scene / "left-image-half-size" / f"{stem}.jpg").touch()
            (root / scene / "right-image-half-size" / f"{stem}.jpg").touch()
            (root / scene / "disparity-map-half-size" / f"{stem}.png").touch()
    # one incomplete triplet (no disparity) that must be skipped
    (root / "cloudy" / "left-image-half-size" / "orphan.jpg").touch()
    (root / "cloudy" / "right-image-half-size" / "orphan.jpg").touch()
    return str(root)


def test_build_and_counts(tmp_path):
    root = _fake_root(tmp_path)
    out = str(tmp_path / "filenames")
    written = build_drivingstereo_manifests(root, out, train_per_scene=8,
                                            test_per_scene=4, seed=0)
    assert len(written) == 2 * len(SCENES) + 2
    for scene in SCENES:
        rows = load_file_list(written[f"drivingstereo_{scene}_train.txt"])
        assert len(rows) == 8
        assert all(len(r) == 4 for r in rows)           # 4-column format
        assert all(r[2] == r[3] for r in rows)          # disp duplicated
        assert all(f"/{scene}/" in r[0] for r in rows)
        assert not any("orphan" in r[0] for r in rows)
        test_rows = load_file_list(written[f"drivingstereo_{scene}_test.txt"])
        assert len(test_rows) == 4
        # train/test disjoint
        assert not {r[0] for r in rows} & {r[0] for r in test_rows}
    # _all_ unions
    assert len(load_file_list(written["drivingstereo_all_train.txt"])) == 32
    assert len(load_file_list(written["drivingstereo_all_test.txt"])) == 16


def test_split_deterministic(tmp_path):
    root = _fake_root(tmp_path)
    a = build_drivingstereo_manifests(root, str(tmp_path / "a"), 8, 4, seed=7)
    b = build_drivingstereo_manifests(root, str(tmp_path / "b"), 8, 4, seed=7)
    for name in a:
        assert open(a[name]).read() == open(b[name]).read()


def test_too_few_frames_raises(tmp_path):
    root = _fake_root(tmp_path, n_per_scene=5)
    with pytest.raises(ValueError, match="complete triplets"):
        build_drivingstereo_manifests(root, str(tmp_path / "o"), 8, 4)


def test_scene_lists_task_order(tmp_path):
    tr, te = scene_lists("/x")
    assert [os.path.basename(p) for p in tr] == [
        f"drivingstereo_{s}_train.txt"
        for s in ("cloudy", "foggy", "rainy", "sunny")]
    assert len(te) == 4


# -- cross-domain builders (VERDICT r2 #5/#10: the src_self 4-KRCD layouts,
#    src_self/filenames/cross_dataset) --------------------------------------


def _touch(*parts):
    path = os.path.join(*parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").close()
    return path


def test_cityscapes_builder(tmp_path):
    from rag_tpu.data.manifests import build_cityscapes_manifests

    root = str(tmp_path / "cs")
    for i in range(10):
        stem = f"bremen_{i:06d}_000019"
        _touch(root, "leftImg8bit", "train", "bremen",
               stem + "_leftImg8bit.png")
        _touch(root, "rightImg8bit", "train", "bremen",
               stem + "_rightImg8bit.png")
        _touch(root, "disparity", "train", "bremen", stem + "_disparity.png")
    # one incomplete frame must be skipped
    _touch(root, "leftImg8bit", "train", "bremen",
           "bremen_999999_000019_leftImg8bit.png")
    written = build_cityscapes_manifests(root, str(tmp_path / "out"),
                                         train_n=7, test_n=3, seed=0)
    assert set(written) == {"bremen_train.txt", "bremen_test.txt"}
    train = open(written["bremen_train.txt"]).read().strip().splitlines()
    test = open(written["bremen_test.txt"]).read().strip().splitlines()
    assert len(train) == 7 and len(test) == 3
    for ln in train + test:
        cols = ln.split()
        assert len(cols) == 3
        assert "_leftImg8bit.png" in cols[0]
        assert "_rightImg8bit.png" in cols[1]
        assert "_disparity.png" in cols[2]
        assert all(os.path.exists(c) for c in cols)
    # no overlap between splits
    assert not set(train) & set(test)


def test_kitti_raw_builder(tmp_path):
    from rag_tpu.data.manifests import build_kitti_raw_manifests

    root = str(tmp_path / "kraw")
    drive = "2011_09_28_drive_0016_sync"
    for split, frames in (("train", (135, 158)), ("val", (15,))):
        for fr in frames:
            fn = f"{fr:010d}.png"
            _touch(root, "labels", "data_depth_annotated", split, drive,
                   "proj_disp", "groundtruth", fn)
            _touch(root, "images", "2011_09_28", drive, "image_02", "data", fn)
            _touch(root, "images", "2011_09_28", drive, "image_03", "data", fn)
    written = build_kitti_raw_manifests(root, str(tmp_path / "out"))
    assert set(written) == {"campus_train.txt", "campus_val.txt"}
    train = open(written["campus_train.txt"]).read().strip().splitlines()
    val = open(written["campus_val.txt"]).read().strip().splitlines()
    assert len(train) == 2 and len(val) == 1
    cols = train[0].split()
    assert "image_02" in cols[0] and "image_03" in cols[1]
    assert "proj_disp/groundtruth" in cols[2]


def test_kitti_stereo_builder(tmp_path):
    from rag_tpu.data.manifests import build_kitti_stereo_manifests

    r12 = str(tmp_path / "KITTI2012")
    r15 = str(tmp_path / "KITTI2015")
    for i in range(4):
        fn = f"{i:06d}_10.png"
        _touch(r12, "training", "colored_0", fn)
        _touch(r12, "training", "colored_1", fn)
        _touch(r12, "training", "disp_occ", fn)
        _touch(r15, "training", "image_2", fn)
        _touch(r15, "training", "image_3", fn)
        _touch(r15, "training", "disp_occ_0", fn)
    # non-GT frames (_11) must be excluded
    _touch(r12, "training", "colored_0", "000000_11.png")
    written = build_kitti_stereo_manifests(str(tmp_path / "out"),
                                           root2012=r12, root2015=r15,
                                           train_n=6, val_n=2, seed=0)
    train = open(written["kitti1215_train.txt"]).read().strip().splitlines()
    val = open(written["kitti1215_val.txt"]).read().strip().splitlines()
    assert len(train) == 6 and len(val) == 2
    both = train + val
    assert any("colored_0" in ln for ln in both)
    assert any("image_2" in ln for ln in both)
    assert all("_10.png" in ln.split()[0] for ln in both)
