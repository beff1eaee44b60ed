"""Depth-variant continual integration: 2-task growth run on synthetic
depth data, driven through the same grow/select machinery."""

import numpy as np
import pytest

from rag_tpu.continual.depth_driver import (
    DepthContinualDriver,
    SyntheticDepthDataset,
)
from rag_tpu.continual.driver import ExperimentConfig, TrainConfig
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig


@pytest.mark.slow
def test_depth_two_task_run():
    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        op=OpSearchConfig(epochs=2, batch=2, o_size=1, seed=0),
        train=TrainConfig(epochs=1, batch=2),
        num_tasks=2, seed=0, skip_cell_search=True,
    )
    mk = lambda s: SyntheticDepthDataset(4, 24, 48, seed=s)
    driver = DepthContinualDriver(cfg, log=None)
    matrix = driver.run([mk(10), mk(11)], [mk(20), mk(21)],
                        [mk(30), mk(31)])
    assert len(driver.net.archis) == 2
    for t in range(2):
        for u in range(t + 1):
            assert np.isfinite(matrix.m["silog"][t, u])
            assert np.isfinite(matrix.m["d1"][t, u])
    # heads grew per task; shared depth head exists
    assert len(driver.net.heads["last_3_3d"]) == 2
    assert driver.net.depth_head is not None
    # zero forgetting, column-constant (the stereo guarantee holds for
    # depth too once the shared DispHead freezes after task 0 — the
    # round-3 canonical depth run caught it drifting)
    for metric in ("silog", "d1"):
        assert matrix.m[metric][1, 0] == pytest.approx(
            matrix.m[metric][0, 0], rel=0, abs=0), metric
