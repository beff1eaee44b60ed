"""Driver-level mesh data-parallelism (VERDICT r3 missing #1).

The canonical experiment must run data-parallel THROUGH the driver: cell
search, op search, and fine-tune all build shard_map dp steps when
ExperimentConfig.mesh_data > 1 (CLI --mesh). These tests pin, on the fake
8-CPU-device mesh:

  * a full 2-task continual run (search -> expand -> op-search -> select ->
    fine-tune -> forgetting matrix) with mesh_data=4 matches the
    single-device run's forgetting matrices within fp-reduction tolerance
    (grads psum'd, BN batch stats pmean'd, masked losses/metrics psum'd
    by parts — same math, different reduction order);
  * stage batches that do not divide by mesh_data fall back to
    single-device steps instead of crashing;
  * the CLI --mesh flag threads into the config.

No reference counterpart (single cuda:N, /root/reference/src/run.py:78) —
green-field per SURVEY.md §2.4.
"""

import dataclasses

import numpy as np
import pytest

from rag_tpu.continual.driver import (
    ContinualDriver,
    ExperimentConfig,
    TrainConfig,
)
from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig


def _datasets(n_tasks=2, n=16, h=24, w=48):
    mk = lambda s: SyntheticStereoDataset(n, h, w, seed=s, max_disp=16.0)
    train = [mk(10 + t) for t in range(n_tasks)]
    valid = [mk(20 + t) for t in range(n_tasks)]
    test = [mk(30 + t) for t in range(n_tasks)]
    return train, valid, test


def _config(mesh_data=1, maxdisp=48):
    return ExperimentConfig(
        cell=CellSearchConfig(epochs=2, batch=8, seed=0),
        op=OpSearchConfig(epochs=2, batch=8, o_size=2, seed=0),
        train=TrainConfig(epochs=2, batch=8),
        num_tasks=2, seed=0, maxdisp=maxdisp, mesh_data=mesh_data)


def _run(cfg):
    driver = ContinualDriver(cfg, log=None)
    train, valid, test = _datasets()
    return driver.run(train, valid, test)


@pytest.mark.slow
def test_mesh_driver_matches_single_device():
    m1 = _run(_config(mesh_data=1))
    m4 = _run(_config(mesh_data=4))
    for k in ("D1", "EPE", "loss"):
        a, b = m1.m[k], m4.m[k]
        assert np.allclose(a, b, rtol=1e-3, atol=2e-3), (k, a, b)


def test_mesh_indivisible_batch_falls_back():
    # batch 6 over mesh_data=4 cannot shard: the driver must log a
    # fallback and still run (single-device steps)
    cfg = dataclasses.replace(
        _config(mesh_data=4),
        train=TrainConfig(epochs=1, batch=6),
        cell=CellSearchConfig(epochs=1, batch=6, seed=0),
        op=OpSearchConfig(epochs=1, batch=6, o_size=2, seed=0),
        num_tasks=1, skip_cell_search=True)
    driver = ContinualDriver(cfg, log=None)
    assert driver._mesh_for(6, "fine-tune") is None
    assert driver._mesh_for(8, "fine-tune") is driver.mesh


def test_cli_mesh_flag_threads_into_config():
    from rag_tpu.cli import build_parser

    args = build_parser().parse_args(["--mesh", "4", "2"])
    assert args.mesh == [4, 2]
    args = build_parser().parse_args(["--mesh", "8"])
    assert args.mesh == [8]
    args = build_parser().parse_args([])
    assert args.mesh is None


def test_mesh_too_large_raises():
    with pytest.raises(ValueError):
        ContinualDriver(_config(mesh_data=16), log=None)
