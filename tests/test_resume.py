"""Checkpoint/resume through the driver: interrupt after task 0, resume,
finish task 1, and verify the state is continuous."""

import numpy as np
import pytest

from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig, TrainConfig
from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig


@pytest.mark.slow
def test_driver_resume(tmp_path):
    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=1, batch=2),
        num_tasks=2, seed=0, skip_cell_search=True,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    train, valid, test = ([mk(10), mk(11)], [mk(20), mk(21)], [mk(30), mk(31)])

    # phase 1: run with num_tasks=1 (simulates an interruption after task 0)
    cfg1 = ExperimentConfig(
        cell=cfg.cell, op=cfg.op, train=cfg.train, num_tasks=1, seed=0,
        skip_cell_search=True)
    d1 = ContinualDriver(cfg1, log=None, checkpoint_dir=str(tmp_path))
    d1.run(train[:1], valid[:1], test[:1])
    epe_00 = d1.matrix.m["EPE"][0, 0]
    assert epe_00 > 0

    # phase 2: resume the 2-task experiment from the task-0 checkpoint
    d2 = ContinualDriver(cfg, log=None, checkpoint_dir=str(tmp_path))
    matrix = d2.run(train, valid, test, resume=True)
    assert len(d2.net.archis) == 2
    # task-0 row was restored, not recomputed from scratch
    np.testing.assert_allclose(matrix.m["EPE"][0, 0], epe_00)
    assert np.isfinite(matrix.m["EPE"][1, 1])
    assert np.isfinite(matrix.m["EPE"][1, 0])


@pytest.mark.slow
def test_cell_search_mid_resume_is_continuation_equivalent(tmp_path):
    """Interrupted + resumed search is BIT-IDENTICAL to uninterrupted: the
    checkpoint carries the rng bit state and the best-by-valid snapshot
    (VERDICT r2 weak #2), so the resumed run replays the exact op-sample
    sequence and returns the exact same genotype and probabilities."""
    from rag_tpu.data.synthetic import SyntheticStereoDataset
    from rag_tpu.search.mdenas import CellSearch, CellSearchConfig

    data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
    ckpt = str(tmp_path / "search.npz")

    # uninterrupted 3-epoch run: the ground truth
    cs0 = CellSearch(CellSearchConfig(epochs=3, batch=2, seed=0), log=None)
    g0 = cs0.search(data, task=0)

    # interrupted after epoch 1's checkpoint write (same 3-epoch config —
    # the cosine lr schedule depends on total epochs, so a shorter run is
    # NOT an interruption of the longer one)
    cs1 = CellSearch(CellSearchConfig(epochs=3, batch=2, seed=0), log=None)
    cs1.search(data, task=0, checkpoint_path=ckpt, checkpoint_every=2,
               stop_after=2)
    assert (tmp_path / "search.npz").exists()

    # resume into the 3-epoch run: epoch 2 continues from the checkpoint
    cs2 = CellSearch(CellSearchConfig(epochs=3, batch=2, seed=0), log=None)
    g2 = cs2.search(data, task=0, checkpoint_path=ckpt, resume=True)

    assert g2 == g0
    for k in ("normal", "reduce"):
        np.testing.assert_array_equal(cs2.p[k], cs0.p[k])
    # the restored-then-finished params match the uninterrupted run's
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(cs0.params),
                    jax.tree_util.tree_leaves(cs2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_op_search_mid_resume_is_continuation_equivalent(tmp_path):
    """Same property for the op-level growth search: kill after epoch k
    (fault-injection stop_after), resume, and land bit-identical p /
    selected architecture to an uninterrupted run."""
    import jax

    from rag_tpu.data.synthetic import SyntheticStereoDataset
    from rag_tpu.models.growable import GrowableStereoNet
    from rag_tpu.search.genotype import default_genotype
    from rag_tpu.search.growth import OpSearch, OpSearchConfig

    data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
    cfg = OpSearchConfig(epochs=3, batch=2, o_size=1, seed=0)
    g = default_genotype()

    def fresh_net():
        net = GrowableStereoNet(jax.random.PRNGKey(0), g)
        net.expand(jax.random.PRNGKey(1), 1, g)
        return net

    # uninterrupted
    net0 = fresh_net()
    OpSearch(net0, cfg, log=None).search(1, data)
    arch0 = net0.select(1)

    # interrupted at epoch 2 (checkpoint written at end of epoch 1), resumed
    ckpt = str(tmp_path / "opsearch.npz")
    net1 = fresh_net()
    OpSearch(net1, cfg, log=None).search(
        1, data, checkpoint_path=ckpt, checkpoint_every=2, stop_after=2)
    assert (tmp_path / "opsearch.npz").exists()
    net2 = fresh_net()
    OpSearch(net2, cfg, log=None).search(
        1, data, checkpoint_path=ckpt, resume=True)
    arch2 = net2.select(1)

    assert arch2 == arch0
    for p0, p2 in zip(net0.p or [], net2.p or []):
        np.testing.assert_array_equal(p0, p2)


def test_stage_checkpoint_survives_missing_dir(tmp_path):
    """Regression for the round-2 canonical_r2b crash: save_state into a
    directory that does not exist (e.g. vanished mid-run) must recreate it
    instead of dying with FileNotFoundError."""
    import jax

    from rag_tpu.models.growable import GrowableStereoNet
    from rag_tpu.search.genotype import default_genotype
    from rag_tpu.search.growth import OpSearch, OpSearchConfig
    from rag_tpu.search.mdenas import CellSearch, CellSearchConfig

    missing = tmp_path / "gone" / "deeper"
    cs = CellSearch(CellSearchConfig(epochs=1, batch=2, seed=0), log=None)
    rng = np.random.default_rng(0)
    h = {k: np.zeros_like(cs.p[k]) for k in cs.p}
    cs.save_state(str(missing / "cell.npz"), 0, h, h, rng, np.inf, None, None)
    assert (missing / "cell.npz").exists()

    g = default_genotype()
    net = GrowableStereoNet(jax.random.PRNGKey(0), g)
    net.expand(jax.random.PRNGKey(1), 1, g)
    os_ = OpSearch(net, OpSearchConfig(epochs=1, batch=2, seed=0), log=None)
    h_e = [np.zeros(len(p), np.int64) for p in net.p]
    h_a = [np.zeros(len(p), np.float64) for p in net.p]
    os_.save_state(str(missing / "op" / "op.npz"), 1, 0, h_e, h_a, {}, None,
                   np.inf, rng=rng)
    assert (missing / "op" / "op.npz").exists()
