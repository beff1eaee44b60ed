"""End-to-end shape/semantics tests for the deployed stereo pipeline."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.models.stereo import (
    build_head_specs,
    build_site_specs,
    init_sites,
    stereo_forward,
)
from rag_tpu.search.genotype import default_genotype


def _tiny_path(key=0):
    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(key), specs)
    return specs, params, stats


class TestStereoForward:
    def test_train_crop_shapes(self):
        specs, params, stats = _tiny_path()
        # tiny analogue of the 384x192 train crop (divisible by 12: /3 then /4)
        left = jnp.ones((1, 48, 96, 3))
        right = jnp.ones((1, 48, 96, 3))
        disp, new_stats = stereo_forward(specs, params, stats, left, right)
        assert disp.shape == (1, 48, 96)
        assert np.isfinite(np.asarray(disp)).all()
        # eval mode must not touch stats
        chex_same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
                stats,
                new_stats,
            )
        )
        assert chex_same

    def test_disparity_range(self):
        specs, params, stats = _tiny_path()
        left = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 96, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 96, 3))
        disp, _ = stereo_forward(specs, params, stats, left, right)
        d = np.asarray(disp)
        assert (d >= 0).all() and (d <= 191).all()

    def test_train_mode_updates_only_train_sites(self):
        specs, params, stats = _tiny_path()
        left = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 96, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 96, 3))
        train_sites = frozenset({"stem_2d0", "cell_3d0"})
        _, new_stats = stereo_forward(
            specs, params, stats, left, right, train_sites=train_sites
        )

        def changed(name):
            a = jax.tree_util.tree_leaves(stats[name])
            b = jax.tree_util.tree_leaves(new_stats[name])
            return any(not np.array_equal(np.asarray(x), np.asarray(y))
                       for x, y in zip(a, b))

        assert changed("stem_2d0")
        assert changed("cell_3d0")
        assert not changed("stem_2d1")
        assert not changed("cell_2d0")
        assert not changed("last_3_3d")

    def test_jit_and_grad(self):
        specs, params, stats = _tiny_path()
        left = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 96, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 96, 3))
        gt = jnp.full((1, 48, 96), 10.0)

        @jax.jit
        def loss_fn(p):
            disp, _ = stereo_forward(specs, p, stats, left, right)
            return jnp.mean(jnp.abs(disp - gt))

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # gradients reach the feature stem
        assert float(jnp.abs(g["stem_2d0"]["w"]).sum()) > 0


class TestBatchedFeatureExtraction:
    """stereo_forward runs left+right feature extraction as ONE stacked
    batch (halves=2). Must match the reference's sequential two-pass
    composition exactly: frozen BN is batch-elementwise, and train-mode BN
    uses per-half batch statistics + two sequential EMA updates."""

    FEATURE_SITES = frozenset({
        "stem_2d0", "stem_2d1", "stem_2d2",
        "cell_2d0", "cell_2d1", "cell_2d2", "cell_2d3", "last_3_2d",
    })

    def _two_pass(self, specs, params, stats, left, right, train_sites):
        """The reference composition: left pass, thread updated running
        stats, right pass (rag_model.py:372-373 two sequential BN passes)."""
        from rag_tpu.models.stereo import extract_feature

        ns = {}
        x = extract_feature(specs, params, stats, left, train_sites, ns)
        mid = {**stats, **ns}
        y = extract_feature(specs, params, mid, right, train_sites, ns)
        return x, y, ns

    def _stacked(self, specs, params, stats, left, right, train_sites):
        from rag_tpu.models.stereo import extract_feature

        ns = {}
        f = extract_feature(specs, params, stats,
                            jnp.concatenate([left, right], 0),
                            train_sites, ns, halves=2)
        b = left.shape[0]
        return f[:b], f[b:], ns

    def _check(self, train_sites):
        specs, params, stats = _tiny_path()
        left = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 48, 3))
        right = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (2, 24, 48, 3))
        x1, y1, ns1 = self._two_pass(specs, params, stats, left, right,
                                     train_sites)
        x2, y2, ns2 = self._stacked(specs, params, stats, left, right,
                                    train_sites)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=1e-5, atol=1e-5)
        # running stats after the stacked pass == after two sequential
        # passes (the double-EMA closed form)
        l1 = jax.tree_util.tree_leaves(
            {k: ns1[k] for k in self.FEATURE_SITES})
        l2 = jax.tree_util.tree_leaves(
            {k: ns2[k] for k in self.FEATURE_SITES})
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    def test_frozen_bn_matches_two_pass(self):
        self._check(frozenset())

    def test_train_bn_matches_two_pass(self):
        self._check(self.FEATURE_SITES)

    def test_mixed_train_sites_match_two_pass(self):
        self._check(frozenset({"stem_2d1", "cell_2d2"}))

    def test_forward_gradients_flow_through_stacked_path(self):
        specs, params, stats = _tiny_path()
        left = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 48, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 48, 3))
        ts = self.FEATURE_SITES

        def loss(p):
            d, _ = stereo_forward(specs, p, stats, left, right,
                                  train_sites=ts)
            return jnp.sum(d)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["stem_2d0"]["w"]).sum()) > 0
        assert np.isfinite(np.asarray(
            jax.tree_util.tree_leaves(g)[0])).all()


class TestSupernetStackedFeature:
    """The search supernet also stacks left+right feature extraction
    (supernet_forward halves=2) — must match the sequential two-pass
    composition in both train and frozen BN modes."""

    def _two_pass_disp(self, params, stats, left, right, fea, mat, train):
        from rag_tpu.models.supernet import (_fea_forward, _mat_forward)
        from rag_tpu.ops.cost_volume import cost_volume
        from rag_tpu.ops.disparity import soft_argmin_disparity

        ns = {"fea": {}, "mat": {}}
        x = _fea_forward(params, stats, left, fea, train, ns)
        mid = {"fea": {**stats["fea"], **ns["fea"]}, "mat": stats["mat"]}
        y = _fea_forward(params, mid, right, fea, train, ns)
        cost = cost_volume(x, y, 8)
        m = _mat_forward(params, stats, cost, mat, train, ns)
        return soft_argmin_disparity(m, 24, 3), ns

    def _run(self, train):
        from rag_tpu.models.supernet import init_supernet, supernet_forward

        params, stats = init_supernet(jax.random.PRNGKey(0))
        fea = np.array([1, 0, 1, 1, 0, 1, 1, 0, 1])
        mat = np.array([0, 1, 1, 0, 1, 0, 1, 1, 0])
        left = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 48, 3))
        right = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (2, 24, 48, 3))
        d2, ns2 = supernet_forward(params, stats, left, right, fea, mat,
                                   train, cf_matching=False, maxdisp=24)
        d1, ns1 = self._two_pass_disp(params, stats, left, right, fea, mat,
                                      train)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ns1["fea"]),
                        jax.tree_util.tree_leaves(ns2["fea"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_frozen(self):
        self._run(False)

    @pytest.mark.slow
    def test_train(self):
        self._run(True)
