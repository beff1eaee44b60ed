"""Self-supervised variant: color transfer, pretrain + photometric driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.continual.self_supervised import SelfSupConfig, SelfSupContinualDriver
from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.data.transfer import ColorTransferDataset, transfer_color
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig
from rag_tpu.continual.driver import TrainConfig


class TestColorTransfer:
    def test_stats_move_toward_source(self):
        rng = np.random.default_rng(0)
        target = np.clip(rng.normal(0.3, 0.05, (16, 16, 3)), 0, 1)
        source = np.clip(rng.normal(0.7, 0.15, (16, 16, 3)), 0, 1)
        out = transfer_color(target, source)
        # means move to the source's means
        np.testing.assert_allclose(out.mean((0, 1)), source.mean((0, 1)),
                                   atol=0.1)
        assert out.min() >= 0 and out.max() <= 1

    def test_dataset_wrapper(self):
        proxy = SyntheticStereoDataset(8, 16, 32, seed=0)
        real = np.clip(np.random.default_rng(1).normal(0.5, 0.2, (4, 16, 32, 3)),
                       0, 1).astype(np.float32)
        ds = ColorTransferDataset(proxy, real, normalized=False)
        b = next(ds.batches(4, True, seed=0))
        assert b["left"].shape == (4, 16, 32, 3)
        assert b["left"].min() >= 0 and b["left"].max() <= 1
        # disparity untouched
        assert (b["disparity"] >= 0).all()


@pytest.mark.slow
def test_selfsup_finetune_kill_and_resume(tmp_path):
    """Elastic parity (VERDICT r2 #5): the photometric fine-tune now rides
    the shared stage-checkpoint machinery — a kill mid-fine-tune resumes
    at the checkpointed epoch, and the pretrain warm-up is skipped on
    resume (its output would be overwritten by the restored state)."""
    cfg = SelfSupConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=3, batch=2),
        num_tasks=1, seed=0, skip_cell_search=True,
        pretrain_epochs=1, pretrain_batch=2,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    d1 = SelfSupContinualDriver(cfg, pretrain_data=mk(99),
                                proxy_search_data=mk(98), log=None,
                                checkpoint_dir=str(tmp_path))
    d1.stage_checkpoint_every = 1
    d1._finetune_stop_after = 2  # die after epoch 1's checkpoint
    d1.train_task(0, mk(10), mk(20))
    assert (tmp_path / "finetune_t0.npz").exists()

    d2 = SelfSupContinualDriver(cfg, pretrain_data=mk(99),
                                proxy_search_data=mk(98), log=None,
                                checkpoint_dir=str(tmp_path))
    d2.net = d1.net
    logs = []
    d2.log = logs.append
    assert not d2._should_pretrain(0)  # pretrain skipped on resume
    d2.fine_tune(0, mk(10), mk(20))
    assert any("resumed at epoch 2" in m for m in logs)
    assert not (tmp_path / "finetune_t0.npz").exists()  # consumed


@pytest.mark.slow
def test_selfsup_two_task_run():
    cfg = SelfSupConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=1, batch=2),
        num_tasks=2, seed=0,
        pretrain_epochs=1, pretrain_batch=2,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    driver = SelfSupContinualDriver(
        cfg, pretrain_data=mk(99), proxy_search_data=mk(98), log=None)
    train = [mk(10), mk(11)]
    valid = [mk(20), mk(21)]
    test = [mk(30), mk(31)]
    matrix = driver.run(train, valid, test)
    assert len(driver.net.archis) == 2
    for t in range(2):
        for u in range(t + 1):
            assert np.isfinite(matrix.m["EPE"][t, u])


def test_scan_warp_matches_gather_warp():
    """The TPU (gather-free) warp formulation is the same math as the
    reference-shaped gather warp: hat-weighted shift sum == bilinear
    lerp, identical validity mask, matching disparity gradients."""
    import numpy as np

    from rag_tpu.train.losses import (
        warp_by_disparity,
        warp_by_disparity_scan,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 8, 32, 3)), jnp.float32)
    disp = jnp.asarray(rng.uniform(0, 12.0, (2, 8, 32)), jnp.float32)
    a, va = warp_by_disparity(img, disp)
    b, vb = warp_by_disparity_scan(img, disp)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # integer disparities hit the lerp ends exactly
    di = jnp.asarray(rng.integers(0, 12, (2, 8, 32)), jnp.float32)
    ai, _ = warp_by_disparity(img, di)
    bi, _ = warp_by_disparity_scan(img, di)
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))
    g1 = jax.grad(lambda d: (warp_by_disparity(img, d)[0] ** 2).sum())(disp)
    g2 = jax.grad(
        lambda d: (warp_by_disparity_scan(img, d)[0] ** 2).sum())(disp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.slow
def test_photometric_improves_after_adequate_pretrain():
    """Selfsup convergence canary (round 5). The photometric loss has a
    trivial minimum at constant disparity; a weak supervised pretrain
    leaves the model outside the photometric basin and the fine-tune
    collapses there (observed on-chip: 9-epoch pretrain -> D1 pinned at
    89% with disp std 0.35 px). With an adequate pretrain the photometric
    fine-tune must IMPROVE scene EPE and keep the prediction non-degenerate."""
    from rag_tpu.models.stereo import (
        build_head_specs,
        build_site_specs,
        init_sites,
        stereo_forward,
    )
    from rag_tpu.search.genotype import default_genotype
    from rag_tpu.train.trainer import (
        make_eval_step,
        make_optimizer,
        make_selfsup_train_step,
        make_train_step,
    )
    from rag_tpu.data.synthetic import WEATHER_STYLES

    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    opt = make_optimizer(3e-4, 5.0)
    sup = make_train_step(specs, frozenset(specs), opt, maxdisp=48)
    pho = make_selfsup_train_step(specs, frozenset(specs), opt, maxdisp=48)
    ev = make_eval_step(specs, maxdisp=48)

    scene = SyntheticStereoDataset(16, 48, 96, seed=10, max_disp=14.0,
                                   style=WEATHER_STYLES[0])
    pre = SyntheticStereoDataset(16, 48, 96, seed=777, max_disp=28.8)
    sb = list(scene.batches(4, shuffle=True, seed=0))
    pb = list(pre.batches(4, shuffle=True, seed=0))
    t = sb[0]

    params, stats = init_sites(jax.random.PRNGKey(0), specs)
    p, s, o = params, stats, opt.init(params)
    for e in range(15):
        for b in pb:
            p, s, o, _ = sup(p, s, o, 1e-3, b["left"], b["right"],
                             b["disparity"])
    epe_pre = float(ev(p, s, t["left"], t["right"], t["disparity"])["EPE"])

    o = opt.init(p)
    for e in range(20):
        for b in sb:
            p, s, o, _ = pho(p, s, o, 1e-3, b["left"], b["right"],
                             b["disparity"])
    epe_post = float(ev(p, s, t["left"], t["right"], t["disparity"])["EPE"])
    assert epe_post < epe_pre, (epe_pre, epe_post)  # calibrated 9.2 -> ~5.1
    # non-degenerate: the constant-disparity collapse has per-pixel std
    # well under 1 px; a working model tracks real disparity variation
    disp, _ = stereo_forward(specs, p, s, jnp.asarray(t["left"]),
                             jnp.asarray(t["right"]), maxdisp=48)
    assert float(jnp.std(disp)) > 1.0
