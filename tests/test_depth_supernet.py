"""Depth search supernet + DepthCellSearch."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.continual.depth_driver import SyntheticDepthDataset
from rag_tpu.models.supernet import (
    MAX_DEPTH,
    depth_supernet_forward,
    init_depth_supernet,
)
from rag_tpu.search.mdenas import CellSearchConfig, DepthCellSearch


@pytest.mark.slow
def test_depth_supernet_forward_shapes():
    params, stats = init_depth_supernet(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 48, 3))
    ops = jnp.zeros((9,), jnp.int32)
    pred, new_stats = depth_supernet_forward(params, stats, img, ops, ops,
                                             train=False)
    assert pred.shape == (2, 24, 48)
    d = np.asarray(pred)
    assert (d >= 0).all() and (d <= MAX_DEPTH).all()
    # op switch changes the output
    ops2 = jnp.ones((9,), jnp.int32)
    pred2, _ = depth_supernet_forward(params, stats, img, ops2, ops2,
                                      train=False)
    assert not np.allclose(np.asarray(pred), np.asarray(pred2))


@pytest.mark.slow
def test_depth_cell_search_runs():
    cs = DepthCellSearch(CellSearchConfig(epochs=2, batch=2, seed=0), log=None)
    data = SyntheticDepthDataset(4, 24, 48, seed=0)
    geno = cs.search(data, task=0)
    assert len(geno.normal) == 6 and len(geno.reduce) == 6
