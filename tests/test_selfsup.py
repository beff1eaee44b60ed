"""Self-supervised variant: color transfer, pretrain + photometric driver."""

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
