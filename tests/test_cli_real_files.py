"""Real-file end-to-end CLI seam (VERDICT r2 #7): synthesize an on-disk PNG
dataset, run one full task through ``rag_tpu.cli`` with filename lists and a
checkpoint dir, then evaluate the written checkpoint with
``--eval-only --eval-lists``. This is the seam where the round-2 canonical
run died (filename lists -> loader (native when built) -> driver -> stage
checkpoints -> result.json -> checkpoint restore)."""

import json
import os

import numpy as np
import pytest


def _write_scene(scene_dir, n=6, h=48, w=96, shift=4):
    """True-disparity stereo pairs on disk: right = left rolled by `shift`,
    disparity = shift everywhere. Returns the written list lines."""
    from PIL import Image

    os.makedirs(scene_dir, exist_ok=True)
    rng = np.random.default_rng(hash(scene_dir) % 2**31)
    lines = []
    for i in range(n):
        # smooth-ish random texture so the crop windows carry signal
        base = rng.integers(0, 256, (h, w // 4, 3), np.uint8)
        left = np.repeat(base, 4, axis=1)[:, :w]
        right = np.roll(left, -shift, axis=1)
        disp = np.full((h, w), shift * 256, np.uint16)  # PNG/256 encoding
        lp = os.path.join(scene_dir, f"left_{i}.png")
        rp = os.path.join(scene_dir, f"right_{i}.png")
        dp = os.path.join(scene_dir, f"disp_{i}.png")
        Image.fromarray(left, "RGB").save(lp)
        Image.fromarray(right, "RGB").save(rp)
        Image.fromarray(disp, "I;16").save(dp)
        # 4-column reference layout (disp_R duplicates disp)
        lines.append(f"{lp} {rp} {dp} {dp}")
    return lines


@pytest.mark.slow
def test_cli_real_file_end_to_end(tmp_path):
    from rag_tpu import cli

    train_lines = _write_scene(str(tmp_path / "scene0"), n=6)
    test_lines = _write_scene(str(tmp_path / "scene0_test"), n=2)
    train_list = str(tmp_path / "train.txt")
    test_list = str(tmp_path / "test.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(test_list, "w") as f:
        f.write("\n".join(test_lines) + "\n")

    out = str(tmp_path / "logs")
    ckpt = str(tmp_path / "ckpt")
    matrix = cli.main([
        "--train-lists", train_list, "--test-lists", test_list,
        "--num-tasks", "1", "--seed", "0", "--id", "realfile",
        "--output", out, "--checkpoint-dir", ckpt,
        "--c_epochs", "1", "--c_batch", "2",
        "--epochs", "1", "--batch", "2",
        "--train-crop", "48", "96", "--eval-pad", "48", "96",
        "--maxdisp", "24",
    ])
    assert np.isfinite(matrix.m["EPE"][0, 0])

    # artifacts: result.json + per-task checkpoint + consumed stage files
    result_path = os.path.join(out, "drivingstereo_rag_0_realfile",
                               "result.json")
    with open(result_path) as f:
        result = json.load(f)
    assert np.isfinite(result["mean_D1"])
    assert os.path.exists(os.path.join(ckpt, "manifest_task0.json"))
    assert not os.path.exists(os.path.join(ckpt, "cellsearch_t0.npz"))
    assert not os.path.exists(os.path.join(ckpt, "finetune_t0.npz"))

    # the genotype stage artifact persists (resume consumes it)
    assert os.path.exists(os.path.join(ckpt, "genotype_t0.json"))

    # --eval-only on the written checkpoint, through real files again
    results = cli.main([
        "--eval-only", "--checkpoint-dir", ckpt,
        "--eval-lists", test_list, "--eval-pad", "48", "96",
        "--maxdisp", "24",
    ])
    assert test_list in results
    assert np.isfinite(results[test_list]["EPE"])
