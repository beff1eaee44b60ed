"""Mixed-precision (bf16-at-rest) policy tests — rag_tpu.ops.precision.

The policy: cf-matching activations are STORED bf16 while every
accumulation (matmul/conv contractions, BN statistics, param gradients)
stays f32 and params/optimizer state/BN stats remain f32. These tests pin:

  * forward parity with f32 at bf16-level tolerances (both layouts, and
    through the real Pallas kernel code paths via interpret mode);
  * gradient dtypes: every PARAM cotangent is f32 even when activations
    are bf16;
  * a train step under bf16 keeps the param/stat trees f32 and produces
    a loss close to the f32 step's.

The reference has no mixed-precision story (pure f32 torch); this is the
TPU-native addition (see BASELINE.md round-2 rows).
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


@pytest.fixture
def bf16(monkeypatch):
    monkeypatch.setenv("RAG_TPU_COMPUTE_DTYPE", "bfloat16")


def _path(key=0):
    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(key), specs)
    return specs, params, stats


def _fwd(specs, params, stats, cf, train=False, shape=(1, 24, 48, 3)):
    left = jax.random.normal(jax.random.PRNGKey(1), shape)
    right = jax.random.normal(jax.random.PRNGKey(2), shape)
    ts = frozenset(specs) if train else frozenset()
    return stereo_forward(specs, params, stats, left, right,
                          train_sites=ts, cf_matching=cf)


@pytest.mark.parametrize("cf", [False, True], ids=["cl", "cf"])
@pytest.mark.slow
def test_bf16_forward_close_to_f32(cf, monkeypatch):
    specs, params, stats = _path()
    d32, _ = _fwd(specs, params, stats, cf)
    monkeypatch.setenv("RAG_TPU_COMPUTE_DTYPE", "bfloat16")
    d16, _ = _fwd(specs, params, stats, cf)
    assert d16.dtype == jnp.float32  # head output is always f32
    # the untrained soft-argmin amplifies matching-score noise; compare
    # the MEAN disparity (the expectation is smooth in the scores) plus a
    # generous per-pixel bound
    a, b = np.asarray(d32), np.asarray(d16)
    assert abs(a.mean() - b.mean()) < 1.0
    assert np.mean(np.abs(a - b)) < 5.0


@pytest.mark.slow
def test_bf16_param_grads_are_f32(bf16):
    specs, params, stats = _path()

    def loss(p, cf):
        left = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 48, 3))
        right = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 48, 3))
        d, _ = stereo_forward(specs, p, stats, left, right,
                              train_sites=frozenset(specs), cf_matching=cf)
        return jnp.mean(d ** 2)

    for cf in (False, True):
        g = jax.grad(lambda p: loss(p, cf))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_bf16_kernel_paths_interpret(bf16, monkeypatch):
    """The real Pallas kernel code (conv3d + cvstem + their backwards)
    under bf16 inputs, via the interpreter."""
    monkeypatch.setenv("RAG_TPU_KERNEL_INTERPRET", "1")
    from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf, conv3d_brc_cf
    from rag_tpu.ops.pallas_cvstem import _xla_cvstem, cvstem_conv

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, 4, 12, 16, 24)).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 12, 12)) * 0.3
    s = jnp.ones((12,))
    b = jnp.zeros((12,))
    y = conv3d_brc_cf(x, w, s, b, True)
    assert y.dtype == jnp.bfloat16
    ref = jnp.maximum(_xla_conv3d_cf(x.astype(jnp.float32), w), 0.0)
    rel = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref))) \
        / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.02, rel

    g = jax.grad(
        lambda x_, w_, s_, b_: (conv3d_brc_cf(x_, w_, s_, b_, True)
                                .astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2, 3))(x, w, s, b)
    assert g[0].dtype == jnp.bfloat16          # dx matches x
    assert all(gg.dtype == jnp.float32 for gg in g[1:])  # param grads f32

    xf = jax.random.normal(jax.random.PRNGKey(2),
                           (1, 12, 16, 24)).astype(jnp.bfloat16)
    yf = jax.random.normal(jax.random.PRNGKey(3),
                           (1, 12, 16, 24)).astype(jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 3, 24, 12)) * 0.2
    z = cvstem_conv(xf, yf, w3, 8)
    assert z.dtype == jnp.bfloat16
    zr = _xla_cvstem(xf.astype(jnp.float32), yf.astype(jnp.float32), w3, 8)
    rel = float(jnp.max(jnp.abs(z.astype(jnp.float32) - zr))) \
        / float(jnp.max(jnp.abs(zr)))
    assert rel < 0.02, rel

    g2 = jax.grad(
        lambda a, c, w_: (cvstem_conv(a, c, w_, 8)
                          .astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2))(xf, yf, w3)
    assert g2[0].dtype == jnp.bfloat16
    assert g2[1].dtype == jnp.bfloat16
    assert g2[2].dtype == jnp.float32


def test_bf16_train_step_state_stays_f32(bf16):
    from rag_tpu.train.trainer import make_optimizer, make_train_step

    specs, params, stats = _path()
    opt = make_optimizer(0.003, 5.0)
    opt_state = opt.init(params)
    step = make_train_step(specs, frozenset(specs), opt)
    left = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 48, 3))
    right = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 48, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(3), (2, 24, 48), minval=1.0,
                            maxval=100.0)
    p, s, o, sc = step(params, stats, opt_state, 1e-3, left, right, gt)
    assert np.isfinite(float(sc["loss"]))
    for l in jax.tree_util.tree_leaves((p, s)):
        assert l.dtype == jnp.float32


@pytest.mark.slow
def test_bf16_train_loss_close_to_f32(monkeypatch):
    from rag_tpu.train.trainer import make_optimizer, make_train_step

    specs, params, stats = _path()
    left = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 48, 3))
    right = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 48, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(3), (2, 24, 48), minval=1.0,
                            maxval=100.0)

    losses = {}
    for mode in ("float32", "bfloat16"):
        monkeypatch.setenv("RAG_TPU_COMPUTE_DTYPE", mode)
        opt = make_optimizer(0.003, 5.0)
        step = make_train_step(specs, frozenset(specs), opt)
        _, _, _, sc = step(params, stats, opt.init(params), 1e-3, left,
                           right, gt)
        losses[mode] = float(sc["loss"])
    rel = abs(losses["bfloat16"] - losses["float32"]) \
        / max(abs(losses["float32"]), 1e-6)
    assert rel < 0.05, losses


class TestFeatureDtypePolicy:
    """Round-3 extension: bf16-at-rest covers the 2D feature net
    (ops/precision.feature_dtype; RAG_TPU_BF16_FEATURES=0 opts out)."""

    def test_features_ride_bf16_under_policy(self, bf16):
        from rag_tpu.models.stereo import extract_feature

        specs, params, stats = _path()
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 48, 3))
        f = extract_feature(specs, params, stats, img, frozenset(), {})
        assert f.dtype == jnp.bfloat16

    def test_opt_out_pins_features_f32(self, bf16, monkeypatch):
        from rag_tpu.models.stereo import extract_feature

        monkeypatch.setenv("RAG_TPU_BF16_FEATURES", "0")
        specs, params, stats = _path()
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 48, 3))
        f = extract_feature(specs, params, stats, img, frozenset(), {})
        assert f.dtype == jnp.float32

    def test_f32_default_unaffected(self):
        from rag_tpu.ops.precision import feature_dtype

        assert feature_dtype() == jnp.float32

    def test_train_bn_stats_stay_f32_with_bf16_features(self, bf16):
        from rag_tpu.models.stereo import extract_feature

        specs, params, stats = _path()
        img = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 48, 3))
        ns = {}
        extract_feature(specs, params, stats, img, frozenset(specs), ns,
                        halves=2)
        leaves = jax.tree_util.tree_leaves(ns)
        assert leaves and all(l.dtype == jnp.float32 for l in leaves)

    def test_depth_variant_runs_under_bf16(self, bf16):
        # Regression (round-3 advisor, high): bf16 features reached the
        # depth head's f32 conv weights -> lax.conv dtype mismatch. The
        # head now upcasts to f32 at entry (the stereo head's policy).
        from rag_tpu.models.depth import (
            build_depth_head_specs,
            build_depth_site_specs,
            depth_forward,
            init_depth_head,
        )

        g = default_genotype()
        specs = {**build_depth_site_specs(g), **build_depth_head_specs()}
        params, stats = init_sites(jax.random.PRNGKey(0), specs)
        params["depth_head"], stats["depth_head"] = init_depth_head(
            jax.random.PRNGKey(1))
        img = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 48, 3))
        d, _ = depth_forward(specs, params, stats, img,
                             train_sites=frozenset(specs))
        assert d.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(d)))

    def test_fused_head_upcasts_bf16_cost(self):
        # Mosaic rejects mixed-dtype DMA: the fused head must accept a
        # bf16 cost (CPU path exercises the reference formulation; the
        # entry cast is shared)
        from rag_tpu.ops.pallas_kernels import soft_argmin_disparity_fused

        cost = jax.random.normal(
            jax.random.PRNGKey(4), (1, 8, 8, 16, 1)).astype(jnp.bfloat16)
        d = soft_argmin_disparity_fused(cost, 24, 3)
        assert d.dtype == jnp.float32 and d.shape == (1, 24, 48)
