"""Fused cost-volume+stem (shear-collapsed) vs the materialized reference
composition cost_volume_cf -> conv3d, on exact integer values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.ops.cost_volume import cost_volume_cf
from rag_tpu.ops.fused_stem import cost_stem_z
from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf


def _ref(x_nhwc, y_nhwc, w3, d):
    cost = cost_volume_cf(x_nhwc, y_nhwc, d)      # (B, D, 2C, H, W)
    return _xla_conv3d_cf(cost, w3)[:, :, :, :, :]


@pytest.mark.parametrize("b,c,h,w,d,co", [
    (2, 3, 8, 10, 5, 4),
    (1, 2, 5, 6, 7, 3),     # D > W region (j - d <= -3 all-zero band)
    (1, 4, 6, 12, 4, 5),
    (1, 1, 4, 5, 1, 2),     # single disparity plane (both D fixes on d=0)
    (1, 2, 4, 4, 2, 2),
])
def test_matches_materialized(b, c, h, w, d, co):
    rng = np.random.default_rng(b * 100 + w + d)
    x = jnp.asarray(rng.integers(-3, 4, (b, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.integers(-3, 4, (b, h, w, c)), jnp.float32)
    w3 = jnp.asarray(rng.integers(-2, 3, (3, 3, 3, 2 * c, co)), jnp.float32)
    ref = _ref(x, y, w3, d)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    y_cf = jnp.transpose(y, (0, 3, 1, 2))
    z = cost_stem_z(x_cf, y_cf, w3, d)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(ref))


def test_gradients_match():
    rng = np.random.default_rng(0)
    b, c, h, w, d, co = 1, 2, 6, 8, 4, 3
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 2 * c, co)) * 0.3,
                     jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, d, co, h, w)), jnp.float32)

    def f_ref(x_, y_, w_):
        return (_ref(x_, y_, w_, d) * g).sum()

    def f_fused(x_, y_, w_):
        z = cost_stem_z(jnp.transpose(x_, (0, 3, 1, 2)),
                        jnp.transpose(y_, (0, 3, 1, 2)), w_, d)
        return (z * g).sum()

    g1 = jax.grad(f_ref, argnums=(0, 1, 2))(x, y, w3)
    g2 = jax.grad(f_fused, argnums=(0, 1, 2))(x, y, w3)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-5)
