"""Fused cost-volume+stem Pallas kernel (rag_tpu.ops.pallas_cvstem) vs the
materialized composition, forward and backward, on exact integer values.

The kernel builds the (B, D, 2C, h, w) volume tile-by-tile in VMEM from
the two feature maps (dynamic lane rolls + diagonal masks) — SURVEY.md
hard-part #1; reference hot loop src/models/rag_model.py:375-383."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.ops.cost_volume import cost_volume_cf
from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf, pack_weights
from rag_tpu.ops.pallas_cvstem import (
    _xla_cvstem,
    cvstem_brc,
    cvstem_dw_pallas,
    cvstem_dxy_pallas,
    cvstem_forward_cf,
)

SHAPES = [
    (1, 3, 16, 12, 5, 4),
    (2, 2, 8, 10, 4, 3),
    (1, 2, 32, 130, 6, 5),   # lane-padded W (wk > w)
    (1, 1, 8, 8, 8, 2),      # D == W, wk == w (roll-wrap edge case)
]


def _data(b, c, h, w, d, co, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-3, 4, (b, h, w, c)), jnp.float32)
    y = jnp.asarray(rng.integers(-3, 4, (b, h, w, c)), jnp.float32)
    w3 = jnp.asarray(rng.integers(-2, 3, (3, 3, 3, 2 * c, co)), jnp.float32)
    return x, y, w3, rng


@pytest.mark.parametrize("b,c,h,w,d,co", SHAPES)
def test_forward_matches_materialized(b, c, h, w, d, co):
    x, y, w3, rng = _data(b, c, h, w, d, co, b * 7 + w + d)
    # integer affine keeps every intermediate integer-exact (a float scale
    # shows harmless ~1e-5 FMA-ordering noise vs the XLA broadcast form)
    scale = jnp.asarray(rng.integers(-2, 3, co), jnp.float32)
    bias = jnp.asarray(rng.integers(-2, 3, co), jnp.float32)
    ref = _xla_conv3d_cf(cost_volume_cf(x, y, d), w3)
    ref = ref * scale[None, None, :, None, None] \
        + bias[None, None, :, None, None]
    ref = jnp.maximum(ref, 0.0)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    y_cf = jnp.transpose(y, (0, 3, 1, 2))
    out = cvstem_forward_cf(x_cf, y_cf, pack_weights(w3), scale, bias, d,
                            relu=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("b,c,h,w,d,co", SHAPES)
def test_backward_kernels_exact(b, c, h, w, d, co):
    x, y, w3, rng = _data(b, c, h, w, d, co, b * 11 + w + d)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    y_cf = jnp.transpose(y, (0, 3, 1, 2))
    g = jnp.asarray(rng.integers(-2, 3, (b, d, co, h, w)), jnp.float32)

    _, vjp = jax.vjp(lambda a, bb, cc: _xla_cvstem(a, bb, cc, d),
                     x_cf, y_cf, w3)
    rx, ry, rw = vjp(g)
    dx, dy = cvstem_dxy_pallas(g, w3, d, interpret=True)
    dw = cvstem_dw_pallas(x_cf, y_cf, g, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(rw))


def test_brc_vjp():
    """Folded-affine form stays differentiable (op search trains weights
    with all BN frozen, rag.py:344-368)."""
    rng = np.random.default_rng(0)
    b, c, h, w, d, co = 1, 2, 8, 10, 4, 3
    x = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 3, 2 * c, co)) * 0.3,
                     jnp.float32)
    a = jnp.asarray(rng.standard_normal(co), jnp.float32)
    bb = jnp.asarray(rng.standard_normal(co), jnp.float32)

    def f_kernel(x_, y_, w_, a_, b_):
        return (cvstem_brc(x_, y_, w_, a_, b_, d, True) ** 2).sum()

    def f_ref(x_, y_, w_, a_, b_):
        z = _xla_cvstem(x_, y_, w_, d) * a_.reshape(1, 1, -1, 1, 1) \
            + b_.reshape(1, 1, -1, 1, 1)
        return (jnp.maximum(z, 0) ** 2).sum()

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(x, y, w3, a, bb)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, y, w3, a, bb)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-5)


def test_dw_shared_padded_dz_parity():
    """cvstem dw kernel consuming the shared padded dz (zp=) matches the
    unpadded-dz form."""
    from rag_tpu.ops.pallas_cvstem import (_pad_dz, cvstem_dw_pallas)

    k = jax.random.PRNGKey(11)
    x = jax.random.normal(k, (1, 4, 16, 16))
    y = jax.random.normal(jax.random.PRNGKey(12), (1, 4, 16, 16))
    dz = jax.random.normal(jax.random.PRNGKey(13), (1, 6, 5, 16, 16))
    a = cvstem_dw_pallas(x, y, dz, 6, interpret=True)
    b = cvstem_dw_pallas(x, y, dz, 6, interpret=True, zp=_pad_dz(dz))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)


V3_SHAPES = [
    (1, 3, 16, 12, 5, 4),    # 2 H-tiles
    (2, 2, 24, 10, 4, 3),    # 3 H-tiles, batch 2
    (1, 2, 32, 130, 6, 5),   # lane-padded W
    (1, 1, 8, 8, 8, 2),      # single tile, D == W roll-wrap edge
]


@pytest.mark.parametrize("b,c,h,w,d,co", V3_SHAPES)
def test_v3_forward_matches_materialized(b, c, h, w, d, co):
    """H-tiled (manual-DMA) forward == materialized composition, exact on
    integers — the variant that engages at the 480x960 eval geometry."""
    from rag_tpu.ops.pallas_cvstem import cvstem_forward_cf_v3

    x, y, w3, rng = _data(b, c, h, w, d, co, b * 13 + w + d)
    scale = jnp.asarray(rng.integers(-2, 3, co), jnp.float32)
    bias = jnp.asarray(rng.integers(-2, 3, co), jnp.float32)
    ref = _xla_conv3d_cf(cost_volume_cf(x, y, d), w3)
    ref = ref * scale[None, None, :, None, None] \
        + bias[None, None, :, None, None]
    ref = jnp.maximum(ref, 0.0)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    y_cf = jnp.transpose(y, (0, 3, 1, 2))
    out = cvstem_forward_cf_v3(x_cf, y_cf, pack_weights(w3), scale, bias, d,
                               relu=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
