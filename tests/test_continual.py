"""Integration: the full continual pipeline (search -> grow -> select ->
fine-tune -> forgetting matrix) on synthetic micro-stereograms, plus a
learning-dynamics check on the fixed flagship model."""

import dataclasses

import jax
import numpy as np
import pytest

from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig, TrainConfig
from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig


def _datasets(num_tasks, n=4, h=24, w=48):
    mk = lambda seed: SyntheticStereoDataset(n, h, w, seed=seed, max_disp=12.0)
    train = [mk(10 + t) for t in range(num_tasks)]
    valid = [mk(20 + t) for t in range(num_tasks)]
    test = [mk(30 + t) for t in range(num_tasks)]
    return train, valid, test


@pytest.mark.slow
def test_two_task_continual_run():
    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=2, batch=2, seed=0),
        op=OpSearchConfig(epochs=2, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=2, batch=2),
        num_tasks=2,
        seed=0,
    )
    driver = ContinualDriver(cfg, log=None)
    train, valid, test = _datasets(2)
    matrix = driver.run(train, valid, test)

    # structural invariants
    assert len(driver.net.archis) == 2
    assert len(driver.net.genotypes) == 2
    assert len(driver.net.heads["last_3_3d"]) == 2
    # forgetting matrix filled on the lower triangle
    for t in range(2):
        for u in range(t + 1):
            assert np.isfinite(matrix.m["EPE"][t, u])
            assert matrix.m["EPE"][t, u] > 0
    assert np.isfinite(matrix.mean_final("D1"))
    # model grew or reused — either way sizes are consistent
    for s, units in driver.net.units.items():
        assert 1 <= len(units) <= 2


@pytest.mark.slow
def test_driver_converges_on_learnable_scene():
    """Convergence canary (VERDICT r4 #7): the full driver fine-tune must
    reach an ABSOLUTE accuracy bar on a learnable synthetic scene — a
    regression in loss masking, BN freezing, or the lr schedule would
    otherwise only surface in the next multi-hour chip run.

    Calibrated on CPU (round 5): 40 epochs / 16 pairs / 48x96 / maxdisp
    48 reaches valid EPE ~3.8 px and D1 ~53% (from ~7 px / ~90%
    untrained); thresholds carry ~30% margin. The converged on-chip
    anchor is canonical_learn_r4 (mean D1 1.99% at full scale)."""
    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=40, batch=4, lr=0.001),
        num_tasks=1, seed=0, skip_cell_search=True, maxdisp=48,
    )
    mk = lambda s, n: SyntheticStereoDataset(n, 48, 96, seed=s,
                                             max_disp=14.0)
    driver = ContinualDriver(cfg, log=None)
    matrix = driver.run([mk(10, 16)], [mk(20, 8)], [mk(30, 8)])
    epe, d1 = matrix.m["EPE"][0, 0], matrix.m["D1"][0, 0]
    assert epe < 5.5, f"convergence regression: test EPE {epe:.2f} >= 5.5"
    assert d1 < 0.75, f"convergence regression: test D1 {d1:.3f} >= 0.75"


@pytest.mark.slow
def test_fixed_model_learns_synthetic():
    """EPE must drop when training the flagship on one synthetic scene —
    the integration oracle from SURVEY.md §7.6."""
    from rag_tpu.models.stereo import (
        build_head_specs, build_site_specs, init_sites,
    )
    from rag_tpu.search.genotype import default_genotype
    from rag_tpu.train.trainer import (
        make_eval_step, make_optimizer, make_train_step,
    )

    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(0), specs)
    opt = make_optimizer(3e-4, 5.0)
    opt_state = opt.init(params)
    train_step = make_train_step(specs, frozenset(specs), opt)
    eval_step = make_eval_step(specs)

    data = SyntheticStereoDataset(64, 24, 48, seed=0, max_disp=12.0)
    batches = list(data.batches(4, shuffle=True, seed=0))

    b0 = batches[0]
    before = eval_step(params, stats, b0["left"], b0["right"], b0["disparity"])
    for epoch in range(3):
        for b in batches:
            params, stats, opt_state, _ = train_step(
                params, stats, opt_state, 0.003,
                b["left"], b["right"], b["disparity"])
    after = eval_step(params, stats, b0["left"], b0["right"], b0["disparity"])
    assert float(after["EPE"]) < float(before["EPE"]), (
        float(before["EPE"]), float(after["EPE"]))
    assert float(after["loss"]) < float(before["loss"])
