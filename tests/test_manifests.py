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
