"""Scene-parallel cell search == N sequential searches (per scene).

The scene axis is embarrassingly parallel (fresh supernet per task,
src/approaches/rag.py:224), so the shard_map engine must reproduce the
sequential CellSearch per scene: same sampled op streams, same p
trajectories, same genotypes, and matching supernet params."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.data.synthetic import SyntheticStereoDataset
from rag_tpu.search.mdenas import CellSearch, CellSearchConfig
from rag_tpu.search.scene_parallel import (
    SceneParallelCellSearch,
    make_scene_mesh,
)


def _datasets(n):
    return [SyntheticStereoDataset(4, 24, 48, seed=100 + t,
                                   max_disp=8.0 + 4.0 * t)
            for t in range(n)]


@pytest.mark.slow
def test_matches_sequential():
    cfg = CellSearchConfig(epochs=2, batch=2, seed=0)
    datas = _datasets(2)

    seq_genos, seq_p = [], []
    for t, d in enumerate(datas):
        cs = CellSearch(cfg, log=None)
        seq_genos.append(cs.search(d, task=t))
        seq_p.append({k: v.copy() for k, v in cs.p.items()})

    sp = SceneParallelCellSearch(cfg, num_scenes=2,
                                 mesh=make_scene_mesh(2), log=None)
    par_genos = sp.search(datas)

    for t in range(2):
        assert par_genos[t] == seq_genos[t], t
        for k in ("normal", "reduce"):
            np.testing.assert_allclose(sp.p[k][t], seq_p[t][k],
                                       rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_param_trajectories_match_sequential():
    """One train step per scene: sharded step == sequential step."""
    cfg = CellSearchConfig(epochs=1, batch=2, seed=0)
    datas = _datasets(2)

    seq_params = []
    for t, d in enumerate(datas):
        cs = CellSearch(cfg, log=None)
        cs.search(d, task=t)
        seq_params.append(cs.params)

    sp = SceneParallelCellSearch(cfg, num_scenes=2,
                                 mesh=make_scene_mesh(2), log=None)
    sp.search(datas)

    for t in range(2):
        la = jax.tree_util.tree_leaves(seq_params[t])
        lb = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x[t], sp.params))
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4,
                atol=1e-5 * max(np.abs(np.asarray(a)).max(), 1.0))


def test_scene_mesh_shape():
    m = make_scene_mesh(4)
    assert m.shape["scene"] == 4


@pytest.mark.slow
def test_driver_scene_parallel_matches_sequential_genotypes():
    """The driver's hoisted stage-1 must hand search_cell the same
    genotypes the sequential per-task searches would produce."""
    import dataclasses

    from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=1, batch=2, seed=0),
        num_tasks=2,
        scene_parallel_search=True,
    )
    datas = _datasets(2)

    drv = ContinualDriver(cfg, log=None)
    drv.parallel_cell_search(datas)
    assert set(drv._pre_genotypes) == {0, 1}
    par = [drv.search_cell(t, datas[t]) for t in range(2)]

    seq = []
    for t, d in enumerate(datas):
        cs = CellSearch(dataclasses.replace(cfg.cell, seed=cfg.cell.seed + t,
                                            maxdisp=cfg.maxdisp),
                        log=None)
        seq.append(cs.search(d, task=t))
    assert par == seq
