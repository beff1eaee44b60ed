"""Fused backward disparity kernel vs the analytic jnp gradient
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.pallas_kernels import _disp_bwd_pallas


def _analytic(x, g, maxdisp, scale):
    def f(z):
        return jnp.sum(soft_argmin_disparity(z[..., None], maxdisp, scale) * g)

    return jax.grad(f)(x)


class TestFusedBackward:
    def _check(self, b, d, h, w, maxdisp, seed=0):
        x = jax.random.normal(jax.random.PRNGKey(seed), (b, d, h, w)) * 2
        g = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, 3 * h, 3 * w))
        dx = _disp_bwd_pallas(x, g, maxdisp, 3, interpret=True)
        assert dx is not None
        ref = _analytic(x, g, maxdisp, 3)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_multi_tile(self):
        self._check(1, 8, 16, 16, 24)

    def test_batch_and_wider(self):
        self._check(2, 8, 16, 32, 24)

    def test_three_tiles(self):
        self._check(1, 4, 24, 16, 12)
