"""DrivingStereo manifest builder: per-scene filename lists.

The reference ships only pre-built lists with absolute paths into the
authors' machines (src/filenames/drivingstereo/*.txt — 400 train / 100
test per weather scene, 4 columns "left right disp disp_R" with the
disparity path duplicated). The data itself is not distributable, so this
module rebuilds equivalent manifests from any local DrivingStereo
"different weathers" download:

    root/{scene}/left-image-half-size/<stem>.jpg
    root/{scene}/right-image-half-size/<stem>.jpg
    root/{scene}/disparity-map-half-size/<stem>.png

Scene task order follows the code, cloudy -> foggy -> rainy -> sunny
(src/run.py:155-158 — note BASELINE.json's prose order is wrong, see
SURVEY.md §0). Output file names mirror the reference's exactly, so a
config pointing at the reference's filenames directory and one pointing
at a generated directory are interchangeable.

Usage:
    python -m rag_tpu.data.manifests /data/DrivingStereo out/filenames \
        --train 400 --test 100 --seed 0
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# task order: src/run.py:155-158
SCENES = ("cloudy", "foggy", "rainy", "sunny")

LEFT_DIR = "left-image-half-size"
RIGHT_DIR = "right-image-half-size"
DISP_DIR = "disparity-map-half-size"
IMG_EXTS = (".jpg", ".png", ".jpeg")


def _scan_scene(root: str, scene: str) -> List[Dict[str, str]]:
    """All complete (left, right, disp) triplets of one scene, sorted by
    frame stem (deterministic)."""
    ldir = os.path.join(root, scene, LEFT_DIR)
    rdir = os.path.join(root, scene, RIGHT_DIR)
    ddir = os.path.join(root, scene, DISP_DIR)
    if not os.path.isdir(ldir):
        raise FileNotFoundError(f"no {LEFT_DIR} under {root}/{scene}")
    triplets = []
    for fn in sorted(os.listdir(ldir)):
        stem, ext = os.path.splitext(fn)
        if ext.lower() not in IMG_EXTS:
            continue
        right = None
        for e in IMG_EXTS:
            if os.path.exists(os.path.join(rdir, stem + e)):
                right = os.path.join(rdir, stem + e)
                break
        disp = os.path.join(ddir, stem + ".png")
        if right is None or not os.path.exists(disp):
            continue  # incomplete triplet
        triplets.append({"left": os.path.join(ldir, fn), "right": right,
                         "disp": disp})
    return triplets


def _format_line(t: Dict[str, str]) -> str:
    # 4-column reference format; disp_R column duplicates disp (the
    # reference lists do the same and nothing reads column 4)
    return f"{t['left']} {t['right']} {t['disp']} {t['disp']}"


def build_drivingstereo_manifests(
    root: str,
    out_dir: str,
    train_per_scene: int = 400,
    test_per_scene: int = 100,
    seed: Optional[int] = 0,
    scenes: Sequence[str] = SCENES,
) -> Dict[str, str]:
    """Write drivingstereo_{scene}_{train,test}.txt (+ _all_ unions).

    seed: seeded shuffle before the split (None = keep sorted order).
    Returns {list_name: path}. Raises if a scene has fewer frames than
    train+test."""
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}
    all_train: List[str] = []
    all_test: List[str] = []
    for scene in scenes:
        triplets = _scan_scene(root, scene)
        need = train_per_scene + test_per_scene
        if len(triplets) < need:
            raise ValueError(
                f"scene {scene}: {len(triplets)} complete triplets < "
                f"{need} (train {train_per_scene} + test {test_per_scene})")
        idx = np.arange(len(triplets))
        if seed is not None:
            idx = np.random.default_rng(seed + hash(scene) % 1000).permutation(idx)
        train = [_format_line(triplets[i]) for i in idx[:train_per_scene]]
        test = [_format_line(triplets[i])
                for i in idx[train_per_scene:train_per_scene + test_per_scene]]
        for split, lines in (("train", train), ("test", test)):
            name = f"drivingstereo_{scene}_{split}.txt"
            path = os.path.join(out_dir, name)
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
            written[name] = path
        all_train += train
        all_test += test
    for split, lines in (("train", all_train), ("test", all_test)):
        name = f"drivingstereo_all_{split}.txt"
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        written[name] = path
    return written


def scene_lists(filenames_dir: str, scenes: Sequence[str] = SCENES):
    """(train_lists, test_lists) in task order, for cli --data-dir use."""
    tr = [os.path.join(filenames_dir, f"drivingstereo_{s}_train.txt")
          for s in scenes]
    te = [os.path.join(filenames_dir, f"drivingstereo_{s}_test.txt")
          for s in scenes]
    return tr, te


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="DrivingStereo 'different weathers' root")
    p.add_argument("out_dir", help="directory for the generated lists")
    p.add_argument("--train", type=int, default=400)
    p.add_argument("--test", type=int, default=100)
    p.add_argument("--seed", type=int, default=0,
                   help="split shuffle seed; --seed -1 keeps sorted order")
    args = p.parse_args(argv)
    seed = None if args.seed < 0 else args.seed
    written = build_drivingstereo_manifests(
        args.root, args.out_dir, args.train, args.test, seed)
    for name, path in sorted(written.items()):
        with open(path) as f:
            n = sum(1 for _ in f)
        print(f"{name}: {n} lines -> {path}")


if __name__ == "__main__":
    main()
