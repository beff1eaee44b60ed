"""Channel-first matching path must numerically match channels-last.

Parametrized over the fused shear-collapsed stem (RAG_TPU_FUSED_STEM):
default-off path must be tight; the fused path reassociates the stem sum
and gets scale-aware tolerances (exactness is pinned at op level in
test_fused_stem.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.models.stereo import (
    build_head_specs,
    build_site_specs,
    init_sites,
    stereo_forward,
)
from rag_tpu.search.genotype import default_genotype


def _path(key=0):
    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(key), specs)
    return specs, params, stats


@pytest.fixture(params=["0", "1"], ids=["plain", "fused-stem"])
def fused(request, monkeypatch):
    monkeypatch.setenv("RAG_TPU_FUSED_STEM", request.param)
    return request.param == "1"


@pytest.mark.slow
def test_cf_matches_cl_eval(fused):
    specs, params, stats = _path()
    left = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 96, 3))
    right = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 96, 3))
    d_cl, _ = stereo_forward(specs, params, stats, left, right,
                             cf_matching=False)
    d_cf, _ = stereo_forward(specs, params, stats, left, right,
                             cf_matching=True)
    # fused atol in px: the reassociated stem sum's float noise is
    # amplified by soft-argmin where the distribution is flat
    np.testing.assert_allclose(np.asarray(d_cf), np.asarray(d_cl),
                               rtol=1e-4, atol=5e-2 if fused else 1e-3)


@pytest.mark.slow
def test_cf_matches_cl_train_stats(fused):
    specs, params, stats = _path()
    left = jax.random.normal(jax.random.PRNGKey(3), (2, 48, 96, 3))
    right = jax.random.normal(jax.random.PRNGKey(4), (2, 48, 96, 3))
    ts = frozenset(specs)
    d_cl, s_cl = stereo_forward(specs, params, stats, left, right,
                                train_sites=ts, cf_matching=False)
    d_cf, s_cf = stereo_forward(specs, params, stats, left, right,
                                train_sites=ts, cf_matching=True)
    np.testing.assert_allclose(np.asarray(d_cf), np.asarray(d_cl),
                               rtol=1e-4, atol=5e-2 if fused else 1e-3)
    # BN running stats agree across layouts
    la = jax.tree_util.tree_leaves(s_cl)
    lb = jax.tree_util.tree_leaves(s_cf)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cf_gradients_match(fused):
    specs, params, stats = _path()
    left = jax.random.normal(jax.random.PRNGKey(5), (1, 24, 48, 3))
    right = jax.random.normal(jax.random.PRNGKey(6), (1, 24, 48, 3))

    def loss(p, cf):
        d, _ = stereo_forward(specs, p, stats, left, right, cf_matching=cf)
        return jnp.mean(d ** 2)

    g_cl = jax.grad(lambda p: loss(p, False))(params)
    g_cf = jax.grad(lambda p: loss(p, True))(params)
    # Tolerance is scale-aware: the fused stem's reassociated sum leaves
    # float drift proportional to each tensor's LARGEST contributions (the
    # op-level fused-stem grad test pins exactness at rtol 1e-5; an
    # isolated fused-on/off comparison measured ~2e-5 x max|g| drift on
    # every leaf of this untrained amplifying stack), so small-magnitude
    # entries in a large-scale tensor legitimately drift far beyond their
    # own relative size.
    # 1% relative still catches real layout/math bugs (those are O(1) off).
    rtol = 1e-2 if fused else 2e-3
    for a, b in zip(jax.tree_util.tree_leaves(g_cl),
                    jax.tree_util.tree_leaves(g_cf)):
        a, b = np.asarray(a), np.asarray(b)
        atol = (2e-4 if fused else 1e-5) * np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol)


def test_conv3d_brc_cf_gradients_exact():
    """Hand-rolled backward (saved-residual) vs autodiff of the XLA form."""
    from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf, conv3d_brc_cf

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 6)) * 0.3
    scale = jax.random.normal(jax.random.PRNGKey(2), (6,)) * 0.4 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(3), (6,)) * 0.1

    for relu in (True, False):
        def f_fused(x_, w_, s_, b_):
            return (conv3d_brc_cf(x_, w_, s_, b_, relu) ** 2).sum()

        def f_ref(x_, w_, s_, b_):
            y = _xla_conv3d_cf(x_, w_) * s_.reshape(1, 1, -1, 1, 1) \
                + b_.reshape(1, 1, -1, 1, 1)
            y = jnp.maximum(y, 0.0) if relu else y
            return (y ** 2).sum()

        g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_supernet_cf_matches_cl():
    """Compare the PRE-softmin matching output (the disparity expectation
    amplifies 1e-5 logit noise into pixels on untrained nets)."""
    from rag_tpu.models.supernet import (
        _mat_forward,
        init_supernet,
        supernet_forward,
    )
    from rag_tpu.ops.cost_volume import cost_volume, cost_volume_cf

    params, stats = init_supernet(jax.random.PRNGKey(0))
    left = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 48, 3))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16, 12))
    y = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16, 12))
    ops = jnp.asarray([0, 1, 0, 1, 1, 0, 1, 0, 1], jnp.int32)
    for train in (False, True):
        ns1 = {"fea": {}, "mat": {}}
        mat_cl = _mat_forward(params, stats, cost_volume(x, y, 8), ops,
                              train, ns1)
        ns2 = {"fea": {}, "mat": {}}
        mat_cf = _mat_forward(params, stats, cost_volume_cf(x, y, 8), ops,
                              train, ns2, cf=True)
        # atol covers float-associativity drift of the einsum-formulated
        # 1x1 convs on ~1e3-magnitude activations
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(mat_cf, 2, -1)), np.asarray(mat_cl),
            rtol=1e-4, atol=5e-3)
        for a, b in zip(jax.tree_util.tree_leaves(ns1["mat"]),
                        jax.tree_util.tree_leaves(ns2["mat"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
    # the end-to-end wrapper also runs in both layouts
    d_cf, _ = supernet_forward(params, stats, left, left, ops, ops,
                               train=False, cf_matching=True)
    assert np.isfinite(np.asarray(d_cf)).all()
