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


class _RecordingWriter:
    """MetricWriter stand-in that captures (tag, step, values) tuples."""

    def __init__(self):
        self.records = []

    def scalars(self, tag, values, step=0):
        self.records.append((tag, step, dict(values)))

    def text(self, tag, value, step=0):
        self.records.append((tag, step, value))


def _test_records(writer):
    return [r for r in writer.records if r[0] == "test"]


@pytest.mark.slow
def test_trained_stage_resume_adds_zero_test_records(tmp_path):
    """A kill-resume cycle around a COMPLETED task must add zero new
    tag=='test' records and must not redo the fine-tune (VERDICT r4 weak
    #4: post-wedge slices re-evaluated finished forgetting rows, and a
    kill between fine-tune completion and the task_done save redid the
    whole 60-epoch stage from scratch)."""
    import json
    import jax

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=2, batch=2),
        num_tasks=1, seed=0, skip_cell_search=True,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    train, valid, test = [mk(10)], [mk(20)], [mk(30)]

    d1 = ContinualDriver(cfg, log=None, checkpoint_dir=str(tmp_path))
    d1.run(train, valid, test)
    epe_00 = d1.matrix.m["EPE"][0, 0]
    p_ref = [np.asarray(l) for l in jax.tree_util.tree_leaves(
        d1.net.units["stem_2d0"][0].params)]

    # simulate a kill between the last forgetting-row eval and the
    # task_done save: rewind the manifest stage to "trained" (the
    # eval_rows persisted with it stay intact)
    mpath = tmp_path / "manifest_task0.json"
    manifest = json.loads(mpath.read_text())
    assert manifest["extra"]["stage"] == "task_done"
    assert "0" in manifest["extra"]["eval_rows"]["0"]
    manifest["extra"]["stage"] = "trained"
    mpath.write_text(json.dumps(manifest))

    logs, writer = [], _RecordingWriter()
    d2 = ContinualDriver(cfg, writer=writer, log=logs.append,
                         checkpoint_dir=str(tmp_path))
    matrix = d2.run(train, valid, test, resume=True)
    assert any("resumed post-fine-tune; evaluation only" in m for m in logs)
    assert any("cached from resumed checkpoint" in m for m in logs)
    assert _test_records(writer) == []  # zero new test records
    np.testing.assert_array_equal(matrix.m["EPE"][0, 0], epe_00)
    # fine-tune was not redone: weights bit-identical to the first run
    for a, b in zip(p_ref, jax.tree_util.tree_leaves(
            d2.net.units["stem_2d0"][0].params)):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.slow
def test_trained_stage_resume_runs_only_missing_evals(tmp_path):
    """Kill mid-forgetting-row: resume re-runs only the evals that had not
    yet been persisted, and the fine-tune stage is still skipped."""
    import json
    import jax

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=2, batch=2),
        num_tasks=2, seed=0, skip_cell_search=True,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    train = [mk(10), mk(11)]
    valid = [mk(20), mk(21)]
    test = [mk(30), mk(31)]

    d1 = ContinualDriver(cfg, log=None, checkpoint_dir=str(tmp_path))
    d1.run(train, valid, test)
    m_ref = {k: v.copy() for k, v in d1.matrix.m.items()}
    p_ref = [np.asarray(l) for l in jax.tree_util.tree_leaves(
        d1.net.units["stem_2d0"][0].params)]

    # simulate a kill after task 1's (u=0) eval but before (u=1): stage
    # back to "trained" with only the first eval of row 1 persisted
    mpath = tmp_path / "manifest_task1.json"
    manifest = json.loads(mpath.read_text())
    manifest["extra"]["stage"] = "trained"
    row1 = manifest["extra"]["eval_rows"]["1"]
    del row1["1"]
    manifest["extra"]["matrix"] = {
        k: (np.asarray(v) * [[1, 1], [1, 0]]).tolist()
        for k, v in manifest["extra"]["matrix"].items()}
    mpath.write_text(json.dumps(manifest))

    logs, writer = [], _RecordingWriter()
    d2 = ContinualDriver(cfg, writer=writer, log=logs.append,
                         checkpoint_dir=str(tmp_path))
    matrix = d2.run(train, valid, test, resume=True)
    recs = _test_records(writer)
    assert len(recs) == 1 and "task1_D1" in recs[0][2]  # only (1,1) re-ran
    for k, v in m_ref.items():
        np.testing.assert_array_equal(matrix.m[k], v)
    for a, b in zip(p_ref, jax.tree_util.tree_leaves(
            d2.net.units["stem_2d0"][0].params)):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.slow
def test_stale_router_retrained_on_resume(tmp_path):
    """ADVICE r4: a kill during the FINAL task's router stage used to
    resume at start==num_tasks, skip train_router entirely, and report
    routed numbers from the previous task's router.npz. The persisted
    trained_task marker now triggers a catch-up retrain."""
    from rag_tpu.continual.state import load_router, save_router

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=1, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=1, batch=2),
        num_tasks=2, seed=0, skip_cell_search=True, use_router=True,
        router_epochs=1,
    )
    mk = lambda s: SyntheticStereoDataset(4, 24, 48, seed=s, max_disp=12.0)
    train = [mk(10), mk(11)]
    valid = [mk(20), mk(21)]
    test = [mk(30), mk(31)]

    d1 = ContinualDriver(cfg, log=None, checkpoint_dir=str(tmp_path))
    d1.run(train, valid, test)
    assert d1.router.trained_task == 1
    r = load_router(str(tmp_path))
    assert r.trained_task == 1

    # simulate the kill: router.npz predates task 1's task_done
    r.trained_task = 0
    save_router(str(tmp_path), r)

    logs = []
    d2 = ContinualDriver(cfg, log=logs.append, checkpoint_dir=str(tmp_path))
    d2.run(train, valid, test, resume=True)
    assert any("re-training" in m for m in logs)
    assert d2.router.trained_task == 1
    assert d2.router_eval is not None
    assert load_router(str(tmp_path)).trained_task == 1


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
