"""Pallas im2col conv3d kernel vs XLA conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_tpu.ops.pallas_conv3d import (
    _conv3d_pallas,
    _xla_conv3d,
    conv3d_brc,
    pack_weights,
)


def _ref(x, w, scale, bias, relu):
    y = _xla_conv3d(x, w) * scale + bias
    return jnp.maximum(y, 0.0) if relu else y


class TestConv3dKernel:
    def _check(self, b, d, h, w, cin, cout, relu=True, seed=0):
        k = jax.random.PRNGKey(seed)
        x = jax.random.normal(k, (b, d, h, w, cin))
        wt = jax.random.normal(jax.random.PRNGKey(seed + 1),
                               (3, 3, 3, cin, cout)) * 0.2
        scale = jax.random.normal(jax.random.PRNGKey(seed + 2), (cout,)) * 0.5 + 1
        bias = jax.random.normal(jax.random.PRNGKey(seed + 3), (cout,)) * 0.1
        ref = _ref(x, wt, scale, bias, relu)
        out = _conv3d_pallas(x, pack_weights(wt), scale, bias, relu,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_small(self):
        self._check(1, 4, 8, 16, 12, 12)

    def test_multi_h_tiles(self):
        self._check(1, 3, 32, 8, 4, 8)

    def test_no_relu_wide(self):
        self._check(2, 3, 8, 8, 8, 24, relu=False)

    def test_gradients_match_xla(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 8, 4))
        wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 4)) * 0.3
        scale = jnp.ones(4)
        bias = jnp.zeros(4)

        def f_fused(x_, w_):
            return (conv3d_brc(x_, w_, scale, bias, True) ** 2).sum()

        def f_ref(x_, w_):
            return (_ref(x_, w_, scale, bias, True) ** 2).sum()

        gx1, gw1 = jax.grad(f_fused, argnums=(0, 1))(x, wt)
        gx2, gw2 = jax.grad(f_ref, argnums=(0, 1))(x, wt)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)


def test_v4_d_blocked_multi_chunk(monkeypatch):
    """d divisible by 8 routes through the D-blocked manual-DMA variant
    (db=8, multiple H chunks, unaligned cout). v4 defaults OFF (measured
    slower on v5e, see pallas_conv3d.py) — forced on here."""
    monkeypatch.setenv("RAG_TPU_CONV3D_V4", "1")
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(k, (1, 8, 32, 16, 6))
    wt = jax.random.normal(jax.random.PRNGKey(8), (3, 3, 3, 6, 10)) * 0.2
    scale = jnp.ones(10)
    bias = jnp.zeros(10)
    ref = _ref(x, wt, scale, bias, True)
    out = _conv3d_pallas(x, pack_weights(wt), scale, bias, True,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dw_kernel_matches_xla():
    from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf, conv3d_dw_pallas
    import jax, jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 16, 8))
    dz = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6, 16, 8))
    w0 = jnp.zeros((3, 3, 3, 4, 6))
    _, vjp_w = jax.vjp(lambda w_: _xla_conv3d_cf(x, w_), w0)
    (ref,) = vjp_w(dz)
    dw = conv3d_dw_pallas(x, dz, interpret=True)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


class TestFastBackward:
    """Shared-pad fast VJP (padded residual, one padded dz for dx+dw,
    scale folded into the flipped weights) vs XLA autodiff. Runs the
    exact TPU code path via RAG_TPU_KERNEL_INTERPRET=1."""

    def _grads(self, relu, cin=4, cout=6, seed=0):
        from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf, conv3d_brc_cf

        k = jax.random.PRNGKey(seed)
        x = jax.random.normal(k, (1, 4, cin, 16, 16))
        wt = jax.random.normal(jax.random.PRNGKey(seed + 1),
                               (3, 3, 3, cin, cout)) * 0.3
        scale = jax.random.normal(jax.random.PRNGKey(seed + 2),
                                  (cout,)) * 0.4 + 1.0
        bias = jax.random.normal(jax.random.PRNGKey(seed + 3), (cout,)) * 0.1

        def f_fused(x_, w_, s_, b_):
            return (conv3d_brc_cf(x_, w_, s_, b_, relu) ** 2).sum()

        def f_ref(x_, w_, s_, b_):
            y = _xla_conv3d_cf(x_, w_) * s_.reshape(1, 1, -1, 1, 1) \
                + b_.reshape(1, 1, -1, 1, 1)
            y = jnp.maximum(y, 0.0) if relu else y
            return (y ** 2).sum()

        g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3))(x, wt, scale, bias)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(x, wt, scale, bias)
        return g1, g2

    def test_fast_bwd_engages_and_matches(self, monkeypatch):
        monkeypatch.setenv("RAG_TPU_KERNEL_INTERPRET", "1")
        from rag_tpu.ops.pallas_conv3d import _fast_bwd_ok

        x = jnp.zeros((1, 4, 4, 16, 16))
        assert _fast_bwd_ok(x, 4, 6)
        for relu in (True, False):
            g1, g2 = self._grads(relu)
            for a, b in zip(g1, g2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-4, atol=1e-4)

    def test_dw_padded_dz_parity(self):
        from rag_tpu.ops.pallas_conv3d import (_pad_v2, conv3d_dw_pallas,
                                               conv3d_dw_pallas_pre)

        k = jax.random.PRNGKey(7)
        x = jax.random.normal(k, (2, 4, 4, 16, 16))
        dz = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 6, 16, 16))
        a = conv3d_dw_pallas(x, dz, interpret=True)
        b = conv3d_dw_pallas_pre(_pad_v2(x), _pad_v2(dz), 16,
                                 dz_padded=True, interpret=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
