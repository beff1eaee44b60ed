"""Unit tests for core ops: resize matrices, cost volume, soft-argmin,
ConvBR/BN semantics, cell DAG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr, init_convbr, batch_norm
from rag_tpu.ops.cell import CellSpec, apply_cell, init_cell, canonicalize_gene
from rag_tpu.ops.cost_volume import cost_volume
from rag_tpu.ops.disparity import soft_argmin_disparity
from rag_tpu.ops.resize import interp_matrix, resize_linear, scale_dimension


class TestResize:
    def test_identity(self):
        m = interp_matrix(8, 8, True)
        np.testing.assert_allclose(np.asarray(m), np.eye(8))

    def test_align_corners_endpoints(self):
        # align_corners=True maps endpoints to endpoints exactly
        m = np.asarray(interp_matrix(5, 9, True))
        np.testing.assert_allclose(m[0], np.eye(5)[0])
        np.testing.assert_allclose(m[-1], np.eye(5)[-1])
        np.testing.assert_allclose(m.sum(1), np.ones(9), atol=1e-6)

    def test_linear_ramp_exact(self):
        # linear functions are reproduced exactly by linear interpolation
        x = jnp.arange(16, dtype=jnp.float32)[None, :, None]
        for ac in (True, False):
            y = resize_linear(x, (32,), (1,), ac)
            # interior of an upsampled ramp is itself a ramp
            d = np.diff(np.asarray(y[0, :, 0]))
            assert np.all(d >= -1e-5)

    def test_downsample_half(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
        y = resize_linear(x, (4, 4), (1, 2), True)
        assert y.shape == (1, 4, 4, 3)

    def test_scale_dimension(self):
        assert scale_dimension(64, 0.5) == 32
        assert scale_dimension(64, 2) == 128
        assert scale_dimension(65, 0.5) == 33
        assert scale_dimension(65, 2) == 129


class TestCostVolume:
    def test_matches_reference_loop(self):
        """Check against a direct transcription of the reference's 64-step
        shift-copy semantics (src/models/rag_model.py:375-383)."""
        key = jax.random.PRNGKey(1)
        b, h, w, c, d = 2, 4, 10, 3, 5
        x = jax.random.normal(key, (b, h, w, c))
        y = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, c))
        cv = np.asarray(cost_volume(x, y, d))
        assert cv.shape == (b, d, h, w, 2 * c)
        xn, yn = np.asarray(x), np.asarray(y)
        ref = np.zeros((b, d, h, w, 2 * c), np.float32)
        for i in range(d):
            if i > 0:
                ref[:, i, :, i:, :c] = xn[:, :, i:]
                ref[:, i, :, i:, c:] = yn[:, :, :-i]
            else:
                ref[:, 0, :, :, :c] = xn
                ref[:, 0, :, :, c:] = yn
        np.testing.assert_allclose(cv, ref, atol=1e-6)

    def test_gradients_flow(self):
        x = jnp.ones((1, 2, 6, 2))
        y = jnp.ones((1, 2, 6, 2))
        g = jax.grad(lambda a, b: cost_volume(a, b, 3).sum())(x, y)
        assert np.isfinite(np.asarray(g)).all()


class TestSoftArgmin:
    def test_peaked_cost_recovers_disparity(self):
        """A cost volume with a strong minimum at disparity index k should
        regress to ~3k after the 3x upsample of the disparity axis."""
        b, d3, h, w = 1, 8, 4, 4
        k = 5
        cost = np.full((b, d3, h, w, 1), 10.0, np.float32)
        cost[:, k] = -10.0  # softmin -> mass at index k
        disp = np.asarray(soft_argmin_disparity(jnp.asarray(cost), 24, 3))
        assert disp.shape == (b, 12, 12)
        # index k at D=8 maps to ~ (k+0.5)*3-0.5 in the 24-bin axis
        expected = (k + 0.5) * 3 - 0.5
        np.testing.assert_allclose(disp, expected, atol=1.0)

    def test_uniform_cost_gives_mid_disparity(self):
        cost = jnp.zeros((1, 8, 4, 4, 1))
        disp = np.asarray(soft_argmin_disparity(cost, 24, 3))
        np.testing.assert_allclose(disp, (24 - 1) / 2, atol=1e-3)


class TestConvBR:
    def test_shapes_and_stride(self):
        spec = ConvBRSpec(2, 3, 6, 3, 3)  # the stride-3 stem
        params, stats = init_convbr(jax.random.PRNGKey(0), spec)
        x = jnp.ones((2, 192, 384, 3))
        y, _ = apply_convbr(spec, params, stats, x, train=False)
        assert y.shape == (2, 64, 128, 6)

    def test_bn_train_updates_stats(self):
        spec = ConvBRSpec(2, 4, 4, 1, 1)
        params, stats = init_convbr(jax.random.PRNGKey(0), spec)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 6, 4)) * 3 + 1
        _, new_stats = apply_convbr(spec, params, stats, x, train=True)
        assert not np.allclose(np.asarray(new_stats["mean"]), 0)
        # eval mode leaves stats untouched
        _, same = apply_convbr(spec, params, stats, x, train=False)
        np.testing.assert_array_equal(np.asarray(same["mean"]), np.asarray(stats["mean"]))

    def test_bn_normalizes_batch(self):
        # with scale=1, bias=0, train-mode BN output has ~0 mean / ~1 var
        params = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
        stats = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 5, 5, 4)) * 5 + 3
        y, _ = batch_norm(x, params, stats, train=True)
        np.testing.assert_allclose(np.asarray(y.mean(axis=(0, 1, 2))), 0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y.std(axis=(0, 1, 2))), 1, atol=1e-3)

    def test_3d_conv(self):
        spec = ConvBRSpec(3, 24, 12, 3, 1)
        params, stats = init_convbr(jax.random.PRNGKey(0), spec)
        x = jnp.ones((1, 8, 6, 10, 24))
        y, _ = apply_convbr(spec, params, stats, x, train=False)
        assert y.shape == (1, 8, 6, 10, 12)


class TestCell:
    GENE = canonicalize_gene([(0, 1), (1, 0), (2, 1), (3, 0), (5, 0), (6, 1)])

    def test_gene_validation(self):
        with pytest.raises(AssertionError):
            canonicalize_gene([(0, 1), (1, 0), (2, 1), (3, 0), (4, 0), (9, 1)])

    def test_output_shape_same_scale(self):
        spec = CellSpec(2, 12, 12, 4, 0, self.GENE)
        params, stats = init_cell(jax.random.PRNGKey(0), spec)
        s0 = jnp.ones((2, 16, 16, 12))
        s1 = jnp.ones((2, 16, 16, 12))
        out, _ = apply_cell(spec, params, stats, s0, s1, train=False)
        assert out.shape == (2, 16, 16, 12)  # 3 * c_out

    def test_output_shape_down_up(self):
        spec_d = CellSpec(2, 12, 12, 8, -1, self.GENE)
        p, s = init_cell(jax.random.PRNGKey(0), spec_d)
        out, _ = apply_cell(spec_d, p, s, jnp.ones((1, 16, 16, 12)), jnp.ones((1, 16, 16, 12)), False)
        assert out.shape == (1, 8, 8, 24)
        spec_u = CellSpec(2, 12, 24, 4, +1, self.GENE)
        p, s = init_cell(jax.random.PRNGKey(1), spec_u)
        out, _ = apply_cell(spec_u, p, s, jnp.ones((1, 16, 16, 12)), jnp.ones((1, 8, 8, 24)), False)
        assert out.shape == (1, 16, 16, 12)

    def test_3d_cell(self):
        spec = CellSpec(3, 12, 12, 4, 0, self.GENE)
        p, s = init_cell(jax.random.PRNGKey(0), spec)
        out, _ = apply_cell(spec, p, s, jnp.ones((1, 8, 6, 10, 12)), jnp.ones((1, 8, 6, 10, 12)), False)
        assert out.shape == (1, 8, 6, 10, 12)

    def test_hand_computed_tiny_dag(self):
        """all-skip gene with identity preprocessing check: each step sums
        its two in-edge states, so outputs are predictable."""
        gene = canonicalize_gene([(0, 0), (1, 0), (2, 0), (3, 0), (5, 0), (6, 0)])
        spec = CellSpec(2, 12, 4, 4, 0, gene)
        params, stats = init_cell(jax.random.PRNGKey(0), spec)
        # make preprocessing exact identity: pre: 12->4 can't be identity, so
        # zero out pre weights and check prep passthrough arithmetic instead.
        params["pre"]["w"] = jnp.zeros_like(params["pre"]["w"])
        w = np.zeros(params["prep"]["w"].shape, np.float32)
        for i in range(4):
            w[0, 0, i, i] = 1.0
        params["prep"]["w"] = jnp.asarray(w)
        # disable BN effect: scale=1 bias=0 stats mean0 var1 already; eval mode.
        s0 = jnp.zeros((1, 4, 4, 12))
        s1 = jnp.ones((1, 4, 4, 4)) * 2.0
        out, _ = apply_cell(spec, params, stats, s0, s1, train=False)
        # s0 -> 0 (zero pre); s1 -> 2 (identity prep, BN ~identity in eval)
        # edge numbering: step0 edges (0=s0, 1=s1); step1 (2=s0, 3=s1, 4=n0);
        # step2 (5=s0, 6=s1, 7=n0, 8=n1).
        # n0 = s0+s1 = 2; n1 = s0+s1 = 2; n2 = s0+s1 = 2
        expected = np.concatenate(
            [np.full((1, 4, 4, 4), v, np.float32) for v in (2.0, 2.0, 2.0)], axis=-1
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


class TestMergedEdgeConvs:
    def test_merged_matches_individual(self):
        """The wide-conv merge (cell.py _merged_convbr) must be bitwise-
        level equivalent to running each edge conv separately."""
        from rag_tpu.ops.cell import CellSpec, apply_cell, init_cell, canonicalize_gene
        from rag_tpu.ops.convbr import ConvBRSpec, apply_convbr
        import jax, jax.numpy as jnp

        gene = canonicalize_gene([(0, 1), (1, 1), (2, 1), (3, 1), (5, 1), (6, 1)])
        spec = CellSpec(2, 12, 12, 4, 0, gene)
        params, stats = init_cell(jax.random.PRNGKey(3), spec)
        s0 = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 12))
        s1 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 12))
        out, _ = apply_cell(spec, params, stats, s0, s1, train=False)

        # manual reference: preprocess then individual convs per the DAG
        pre = ConvBRSpec(2, 12, 4, 1)
        prep = ConvBRSpec(2, 12, 4, 1)
        conv = ConvBRSpec(2, 4, 4, 3)
        a, _ = apply_convbr(pre, params["pre"], stats["pre"], s0, False)
        b, _ = apply_convbr(prep, params["prep"], stats["prep"], s1, False)

        def c(edge, x):
            y, _ = apply_convbr(conv, params["ops"][str(edge)],
                                stats["ops"][str(edge)], x, False)
            return y

        n0 = c(0, a) + c(1, b)
        n1 = c(2, a) + c(3, b)
        n2 = c(5, a) + c(6, b)
        expected = jnp.concatenate([n0, n1, n2], axis=-1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)


def test_cost_volume_cf_matches_cl():
    from rag_tpu.ops.cost_volume import cost_volume, cost_volume_cf
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 10, 3))
    cl = cost_volume(x, y, 5)                       # (B, D, H, W, 2C)
    cf = cost_volume_cf(x, y, 5)                    # (B, D, 2C, H, W)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(cf, (0, 1, 3, 4, 2))), np.asarray(cl),
        atol=1e-6)
