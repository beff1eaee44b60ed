"""Round-2 behavior: normalized-space color transfer, src_self dataset
deltas, op-search reference semantics (best-by-valid restore + persistent
momentum), mid-stage resume for op search and fine-tune, threaded maxdisp,
seeded search split."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from rag_tpu.continual.driver import (
    ContinualDriver,
    ExperimentConfig,
    TrainConfig,
)
from rag_tpu.data.readers import (
    denormalize_imagenet,
    normalize_imagenet,
    resize_bilinear,
)
from rag_tpu.data.stereo_dataset import StereoDataset, split_half
from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.data.transfer import ColorTransferDataset, transfer_color
from rag_tpu.models.growable import GrowableStereoNet
from rag_tpu.search.genotype import default_genotype
from rag_tpu.search.growth import (
    OpSearch,
    OpSearchConfig,
    _extract_momentum,
    _inject_momentum,
)
from rag_tpu.search.mdenas import CellSearchConfig


# ---------------------------------------------------------------------------
# Color transfer in normalized space (VERDICT weak #3)
# ---------------------------------------------------------------------------


class _RawProxy:
    """Proxy dataset yielding a fixed batch (raw or normalized)."""

    def __init__(self, left, right, normalized):
        self.left = normalize_imagenet(left) if normalized else left
        self.right = normalize_imagenet(right) if normalized else right

    def __len__(self):
        return len(self.left)

    def batches(self, batch_size, shuffle, seed=0, indices=None,
                drop_last=True):
        yield {
            "left": self.left.astype(np.float32),
            "right": self.right.astype(np.float32),
            "disparity": np.ones(self.left.shape[:3], np.float32),
        }


class TestNormalizedColorTransfer:
    def test_normalized_matches_raw_transfer(self):
        """Transfer on ImageNet-normalized batches == transfer on the raw
        [0,1] images then normalization (the reference order,
        sceneflow_driving_dataset.py:86-93)."""
        rng = np.random.default_rng(0)
        raw_l = np.clip(rng.normal(0.3, 0.1, (3, 8, 8, 3)), 0, 1)
        raw_r = np.clip(rng.normal(0.35, 0.1, (3, 8, 8, 3)), 0, 1)
        real = np.clip(rng.normal(0.7, 0.2, (2, 8, 8, 3)), 0, 1)

        # normalized pipeline (what the driver feeds)
        ds_n = ColorTransferDataset(
            _RawProxy(raw_l, raw_r, normalized=True),
            normalize_imagenet(real).astype(np.float32), normalized=True)
        out_n = next(ds_n.batches(3, False))

        # reference pipeline: transfer raw, normalize afterwards
        for i in range(3):
            ref_img = real[i % len(real)]
            want = normalize_imagenet(transfer_color(raw_l[i], ref_img))
            np.testing.assert_allclose(out_n["left"][i], want, atol=1e-5)

    def test_normalized_output_not_clipped_flat(self):
        """Clipping normalized tensors to [0,1] (the round-1 bug) destroys
        variance; the fixed path must preserve it."""
        rng = np.random.default_rng(1)
        raw = np.clip(rng.normal(0.5, 0.2, (2, 16, 16, 3)), 0, 1)
        real = np.clip(rng.normal(0.5, 0.25, (2, 16, 16, 3)), 0, 1)
        ds = ColorTransferDataset(
            _RawProxy(raw, raw, normalized=True),
            normalize_imagenet(real).astype(np.float32), normalized=True)
        out = next(ds.batches(2, False))
        # normalized outputs extend well outside [0,1]
        assert out["left"].min() < -0.5 and out["left"].max() > 1.2
        assert out["left"].std() > 0.3


# ---------------------------------------------------------------------------
# src_self dataset deltas: Cityscapes resize rule + selfsup eval pad
# ---------------------------------------------------------------------------


def _write_stereo_files(tmp_path, w, h, disp_value=64.0):
    from PIL import Image

    rng = np.random.default_rng(0)
    lp, rp, dp = (str(tmp_path / n) for n in ("l.png", "r.png", "d.png"))
    for p in (lp, rp):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8),
                        "RGB").save(p)
    Image.fromarray((np.full((h, w), disp_value * 256.0)).astype(np.uint16),
                    mode="I;16").save(dp)
    lst = str(tmp_path / "list.txt")
    with open(lst, "w") as f:
        f.write(f"{lp} {rp} {dp}\n")
    return lst


class TestSrcSelfDeltas:
    def test_wide_frame_resized_and_disp_halved(self, tmp_path):
        lst = _write_stereo_files(tmp_path, w=1900, h=512, disp_value=64.0)
        ds = StereoDataset(lst, training=False, pad=(1248, 576),
                           resize_wide=True)
        s = ds.get(0)
        # resized to 1024x512 then padded to 1248x576
        assert s["left"].shape == (576, 1248, 3)
        assert s["top_pad"] == 576 - 512 and s["right_pad"] == 1248 - 1024
        # disparity halved by the resize rule (inspect unpadded region)
        inner = s["disparity"][s["top_pad"]:, :1024]
        np.testing.assert_allclose(inner, 32.0, atol=0.5)

    def test_narrow_frame_untouched(self, tmp_path):
        lst = _write_stereo_files(tmp_path, w=960, h=480, disp_value=64.0)
        ds = StereoDataset(lst, training=False, resize_wide=True)
        s = ds.get(0)
        assert s["left"].shape == (480, 960, 3)
        np.testing.assert_allclose(s["disparity"], 64.0, atol=1e-3)

    def test_resize_bilinear_identity(self):
        img = np.random.default_rng(0).normal(size=(6, 8, 3)).astype(np.float32)
        np.testing.assert_allclose(resize_bilinear(img, 6, 8), img, atol=1e-6)


def test_split_half_seeded():
    a_tr, a_va = split_half(10, seed=3)
    b_tr, b_va = split_half(10, seed=3)
    assert a_tr == b_tr and a_va == b_va
    assert sorted(a_tr + a_va) == list(range(10))
    assert len(a_tr) == 5
    # random (not the first-half split) for some seed
    assert any(split_half(10, seed=s)[0] != list(range(5)) for s in range(5))
    # legacy deterministic split preserved
    assert split_half(10)[0] == list(range(5))


# ---------------------------------------------------------------------------
# threaded maxdisp (VERDICT weak #5: dead flag made real)
# ---------------------------------------------------------------------------


def test_maxdisp_threads_through_forward():
    from rag_tpu.models.stereo import build_head_specs, build_site_specs, \
        init_sites, stereo_forward

    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    k = jax.random.PRNGKey(0)
    params, stats = init_sites(k, specs)
    left = np.zeros((1, 24, 48, 3), np.float32)
    right = np.zeros((1, 24, 48, 3), np.float32)
    d96, _ = stereo_forward(specs, params, stats, left, right, maxdisp=96)
    d192, _ = stereo_forward(specs, params, stats, left, right, maxdisp=192)
    assert d96.shape == d192.shape == (1, 24, 48)
    # a smaller disparity range bounds the regression output below 96
    assert float(np.max(np.asarray(d96))) < 96.0


# ---------------------------------------------------------------------------
# Op-search reference semantics (VERDICT missing #4 / weak #4)
# ---------------------------------------------------------------------------


def _tiny_grown_net():
    net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
    net.expand(jax.random.PRNGKey(1), 1, default_genotype())
    return net


def _new_unit_params(net, t=1):
    from rag_tpu.models.stereo import HEAD_NAMES, SITE_NAMES

    out = {}
    for s in SITE_NAMES:
        out[s] = net.units[s][len(net.units[s]) - 1].params
    for h in HEAD_NAMES:
        out[h] = net.heads[h][t].params
    return out


class TestOpSearchSemantics:
    def test_momentum_inject_extract_roundtrip(self):
        from rag_tpu.train.trainer import make_optimizer

        params = {"a": {"w": np.ones((2, 2), np.float32)},
                  "b": {"w": np.ones((3,), np.float32)}}
        opt = make_optimizer(0.0, 5.0)
        state = opt.init(params)
        store = {"a": {"w": np.full((2, 2), 7.0, np.float32)}}
        state = _inject_momentum(state, store, ["a"])
        got = _extract_momentum(state, ["a", "b"])
        np.testing.assert_allclose(got["a"]["w"], 7.0)
        np.testing.assert_allclose(got["b"]["w"], 0.0)

    @pytest.mark.slow
    def test_momentum_persists_across_epochs(self):
        """After a multi-epoch search, heads (always trainable) carry
        non-zero momentum — the reference's single-optimizer semantics."""
        net = _tiny_grown_net()
        data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
        search = OpSearch(net, OpSearchConfig(epochs=2, batch=2, o_size=1,
                                              seed=0), log=None)
        captured = {}
        orig = _extract_momentum

        def spy(opt_state, names):
            out = orig(opt_state, names)
            captured.update(out)
            return out

        import rag_tpu.search.growth as growth_mod

        growth_mod._extract_momentum, bak = spy, growth_mod._extract_momentum
        try:
            search.search(1, data)
        finally:
            growth_mod._extract_momentum = bak
        head_mom = captured["last_3_3d"]
        total = sum(float(np.abs(np.asarray(l)).sum())
                    for l in jax.tree_util.tree_leaves(head_mom))
        assert total > 0

    @pytest.mark.slow
    def test_best_by_valid_restored(self):
        """After search() the registry holds the best-epoch snapshot, not
        the last-epoch weights (rag.py:336-338)."""
        net = _tiny_grown_net()
        data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
        search = OpSearch(net, OpSearchConfig(epochs=3, batch=2, o_size=1,
                                              seed=0), log=None)
        snaps = []
        orig_snapshot = OpSearch._snapshot

        def spy(self, t):
            snap = orig_snapshot(self, t)
            snaps.append(snap)
            return snap

        OpSearch._snapshot, bak = spy, OpSearch._snapshot
        try:
            search.search(1, data)
        finally:
            OpSearch._snapshot = bak
        assert snaps, "no best snapshot was ever taken"
        best = snaps[-1]
        live = _new_unit_params(net)
        for name, (p, _) in best.items():
            for la, lb in zip(jax.tree_util.tree_leaves(p),
                              jax.tree_util.tree_leaves(live[name])):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    @pytest.mark.slow
    def test_op_search_mid_resume_equivalence(self, tmp_path):
        """Kill after 2/4 epochs + resume == uninterrupted 4-epoch run
        (same p, same new-unit weights)."""
        data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
        cfg = OpSearchConfig(epochs=4, batch=2, o_size=1, seed=0)

        net_a = _tiny_grown_net()
        OpSearch(net_a, cfg, log=None).search(1, data)

        net_b = _tiny_grown_net()
        ckpt = str(tmp_path / "op.npz")
        OpSearch(net_b, cfg, log=None).search(
            1, data, checkpoint_path=ckpt, checkpoint_every=2, stop_after=2)
        assert os.path.exists(ckpt)
        OpSearch(net_b, cfg, log=None).search(
            1, data, checkpoint_path=ckpt, checkpoint_every=2, resume=True)

        for pa, pb in zip(net_a.p, net_b.p):
            np.testing.assert_allclose(pa, pb, atol=1e-12)
        pa, pb = _new_unit_params(net_a), _new_unit_params(net_b)
        for name in pa:
            for la, lb in zip(jax.tree_util.tree_leaves(pa[name]),
                              jax.tree_util.tree_leaves(pb[name])):
                np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                           atol=1e-6)


# ---------------------------------------------------------------------------
# fine-tune mid-stage resume (VERDICT missing #6)
# ---------------------------------------------------------------------------


def _mk_driver(tmp_path, epochs=4):
    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=epochs, batch=2),
        num_tasks=1, seed=0, skip_cell_search=True,
    )
    d = ContinualDriver(cfg, log=None, checkpoint_dir=str(tmp_path))
    d.net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
    return d


@pytest.mark.slow
def test_finetune_mid_resume_equivalence(tmp_path):
    data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
    valid = SyntheticStereoDataset(4, 24, 48, seed=1, max_disp=12.0)

    d_a = _mk_driver(tmp_path / "a")
    d_a.stage_checkpoint_every = 0  # uninterrupted, no stage files
    d_a.fine_tune(0, data, valid)

    d_b = _mk_driver(tmp_path / "b")
    d_b.stage_checkpoint_every = 2
    d_b._finetune_stop_after = 2
    d_b.fine_tune(0, data, valid)       # killed after epoch 2's checkpoint
    assert os.path.exists(tmp_path / "b" / "finetune_t0.npz")

    d_c = _mk_driver(tmp_path / "b", epochs=4)
    d_c.stage_checkpoint_every = 2
    d_c.net = d_b.net                   # same registry, resumes stage file
    d_c.fine_tune(0, data, valid)
    assert not os.path.exists(tmp_path / "b" / "finetune_t0.npz")

    pa = d_a.net.units["stem_2d0"][0].params
    pb = d_c.net.units["stem_2d0"][0].params
    for la, lb in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
