"""End-to-end shape/semantics tests for the deployed stereo pipeline."""

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
