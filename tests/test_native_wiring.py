"""Native C++ data plane wired into StereoDataset (VERDICT missing #7):
training batches stream through NativeStereoLoader when available, and a
driver fine-tune runs end-to-end over the C++ loader."""

import numpy as np
import pytest

from rag_tpu.data.stereo_dataset import StereoDataset


def _write_scene(tmp_path, n=4, w=96, h=48, disp=12.0):
    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        lp, rp, dp = (str(tmp_path / f"{k}{i}.png") for k in "lrd")
        for p in (lp, rp):
            Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8),
                            "RGB").save(p)
        Image.fromarray(np.full((h, w), disp * 256.0).astype(np.uint16),
                        mode="I;16").save(dp)
        lines.append(f"{lp} {rp} {dp}")
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lst


@pytest.fixture(scope="module")
def native_ok():
    from rag_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")
    return True


def test_training_batches_go_native(tmp_path, native_ok):
    lst = _write_scene(tmp_path)
    ds = StereoDataset(lst, training=True, crop=(48, 24))
    got = list(ds.batches(2, True, seed=0))
    assert ds.used_native, "training batches did not route through the C++ loader"
    assert len(got) == 2
    for b in got:
        assert b["left"].shape == (2, 24, 48, 3)
        assert b["disparity"].shape == (2, 24, 48)
        np.testing.assert_allclose(b["disparity"], 12.0, atol=0.01)
        # ImageNet-normalized: roughly zero-centered, not raw [0,1]
        assert b["left"].min() < -0.5


def test_eval_batches_stay_python(tmp_path, native_ok):
    lst = _write_scene(tmp_path)
    ds = StereoDataset(lst, training=False, pad=(96, 48))
    list(ds.batches(1, False, drop_last=False))
    assert not ds.used_native


def test_index_subset_stays_python(tmp_path, native_ok):
    lst = _write_scene(tmp_path)
    ds = StereoDataset(lst, training=True, crop=(48, 24))
    list(ds.batches(2, True, indices=[0, 1]))
    assert not ds.used_native


def test_env_flag_disables(tmp_path, native_ok, monkeypatch):
    monkeypatch.setenv("RAG_TPU_NATIVE_IO", "0")
    lst = _write_scene(tmp_path)
    ds = StereoDataset(lst, training=True, crop=(48, 24))
    list(ds.batches(2, True))
    assert not ds.used_native


def test_driver_finetune_over_native_loader(tmp_path, native_ok):
    """A real train stage consumes the C++ loader end-to-end."""
    import jax

    from rag_tpu.continual.driver import (
        ContinualDriver,
        ExperimentConfig,
        TrainConfig,
    )
    from rag_tpu.models.growable import GrowableStereoNet
    from rag_tpu.search.genotype import default_genotype

    lst = _write_scene(tmp_path, n=4, w=96, h=48)
    train = StereoDataset(lst, training=True, crop=(48, 24))
    valid = StereoDataset(lst, training=False, pad=(96, 48))
    cfg = ExperimentConfig(train=TrainConfig(epochs=1, batch=2),
                           num_tasks=1, skip_cell_search=True)
    d = ContinualDriver(cfg, log=None)
    d.net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
    d.fine_tune(0, train, valid)
    assert train.used_native
