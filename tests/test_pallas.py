"""Pallas kernel tests (interpret mode on the CPU mesh) against the jnp
reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.pallas_kernels import (
    _disp_pallas_raw,
    _disp_reference,
    fused_soft_argmin,
)


class TestFusedSoftArgmin:
    def _check(self, b, d, h, w, maxdisp):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, d, h, w)) * 3
        ref = soft_argmin_disparity(x[..., None], maxdisp, 3)
        out = _disp_pallas_raw(x, maxdisp, 3, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_train_geometry_small(self):
        # scaled-down train-crop geometry (D=8, h=8, w=16)
        self._check(2, 8, 8, 16, 24)

    def test_single_tile(self):
        self._check(1, 4, 2, 8, 12)

    def test_tall_multi_tile(self):
        # forces the row-halo path across several tiles
        self._check(1, 8, 16, 8, 24)

    def test_gradient_matches_reference(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 16))

        def f_fused(z):
            return (fused_soft_argmin(z, 24, 3) ** 2).sum()

        def f_ref(z):
            return (soft_argmin_disparity(z[..., None], 24, 3) ** 2).sum()

        g1 = jax.grad(f_fused)(x)
        g2 = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-3)

    def test_reference_consistency(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 16))
        out, _ = _disp_reference(x, 24, 3)
        ref = soft_argmin_disparity(x[..., None], 24, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
