"""Growth algebra, MdeNAS update rule, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from rag_tpu.models.growable import GrowableStereoNet, K_MULTIPLIER
from rag_tpu.models.stereo import HEAD_NAMES, SITE_NAMES
from rag_tpu.search.genotype import default_genotype, parse_genotype
from rag_tpu.search.mdenas import mdenas_update
from rag_tpu.ops.cell import canonicalize_gene


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


class TestGrowable:
    def test_init_registry(self):
        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        assert set(net.units) == set(SITE_NAMES)
        assert all(len(v) == 1 for v in net.units.values())
        assert net.archis[0] == {**{s: 0 for s in SITE_NAMES},
                                 **{h: 0 for h in HEAD_NAMES}}
        assert net.size_m() > 0

    def test_expand_prior(self):
        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        net.expand(jax.random.PRNGKey(1), 1, default_genotype())
        # reuse prior at L=1, K=2: [2/3, 1/3]  (rag_model.py:403-407)
        for p in net.p:
            np.testing.assert_allclose(p, [2 / 3, 1 / 3])
        assert all(len(net.units[s]) == 2 for s in SITE_NAMES)
        assert all(len(net.heads[h]) == 2 for h in HEAD_NAMES)

    def test_select_reuse_deletes_new_and_preserves_params(self):
        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        old_params = {s: net.units[s][0].params for s in SITE_NAMES}
        net.expand(jax.random.PRNGKey(1), 1, default_genotype())
        # force reuse everywhere
        for i in range(len(net.p)):
            net.p[i] = np.array([0.9, 0.1])
        best = net.select(1)
        assert all(best[s] == 0 for s in SITE_NAMES)
        assert all(len(net.units[s]) == 1 for s in SITE_NAMES)
        assert all(best[h] == 1 for h in HEAD_NAMES)
        # reused params bitwise intact
        for s in SITE_NAMES:
            assert _tree_equal(net.units[s][0].params, old_params[s])
        # model_to_train = heads only
        assert net.trainable_sites(1) == frozenset(HEAD_NAMES)

    def test_select_new_keeps_candidate(self):
        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        net.expand(jax.random.PRNGKey(1), 1, default_genotype())
        for i in range(len(net.p)):
            net.p[i] = np.array([0.1, 0.9])  # new wins everywhere
        best = net.select(1)
        assert all(best[s] == 1 for s in SITE_NAMES)
        assert all(len(net.units[s]) == 2 for s in SITE_NAMES)
        assert net.trainable_sites(1) == frozenset(list(SITE_NAMES) + list(HEAD_NAMES))

    def test_mixed_select(self):
        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        net.expand(jax.random.PRNGKey(1), 1, default_genotype())
        for i in range(len(net.p)):
            net.p[i] = np.array([0.9, 0.1]) if i % 2 == 0 else np.array([0.1, 0.9])
        best = net.select(1)
        for i, s in enumerate(SITE_NAMES):
            assert best[s] == (0 if i % 2 == 0 else 1)
        # paths assemble for both tasks
        for arch in net.archis:
            specs, params, stats = net.path(arch)
            assert set(specs) == set(list(SITE_NAMES) + list(HEAD_NAMES))

    def test_checkpoint_roundtrip(self, tmp_path):
        from rag_tpu.continual.state import load_checkpoint, save_checkpoint

        net = GrowableStereoNet(jax.random.PRNGKey(0), default_genotype())
        net.expand(jax.random.PRNGKey(1), 1, default_genotype())
        for i in range(len(net.p)):
            net.p[i] = np.array([0.2, 0.8])
        net.select(1)
        save_checkpoint(str(tmp_path), net, task=1)
        net2, manifest = load_checkpoint(str(tmp_path))
        assert manifest["task"] == 1
        assert net2.archis == net.archis
        for s in SITE_NAMES:
            assert len(net2.units[s]) == len(net.units[s])
            for u1, u2 in zip(net.units[s], net2.units[s]):
                assert u1.spec == u2.spec
                assert _tree_equal(u1.params, u2.params)
                assert _tree_equal(u1.stats, u2.stats)
        for h in HEAD_NAMES:
            for u1, u2 in zip(net.heads[h], net2.heads[h]):
                assert _tree_equal(u1.params, u2.params)


class TestMdenasUpdate:
    def test_rewards_efficient_ops(self):
        # op1: fewer epochs, higher reward -> probability must increase
        p = np.array([0.5, 0.5])
        h_e = np.array([10, 2])
        h_a = np.array([0.3, 0.8])
        p2 = mdenas_update(p, h_e, h_a, lr_a=0.1)
        assert p2[1] > p2[0]
        np.testing.assert_allclose(p2.sum(), 1.0)

    def test_no_signal_no_change_direction(self):
        p = np.array([0.5, 0.5])
        h_e = np.array([5, 5])
        h_a = np.array([0.5, 0.5])
        p2 = mdenas_update(p, h_e, h_a, lr_a=0.1)
        np.testing.assert_allclose(p2, [0.5, 0.5])

    def test_batched_edges(self):
        p = np.full((9, 2), 0.5)
        h_e = np.zeros((9, 2), np.int64)
        h_a = np.zeros((9, 2))
        h_e[:, 0] = 10
        h_a[:, 1] = 0.9
        p2 = mdenas_update(p, h_e, h_a, 0.01)
        assert (p2[:, 1] > p2[:, 0]).all()


class TestGenotypeParse:
    def test_parse_picks_top_conv_edges(self):
        p = np.full((9, 2), 0.0)
        # make conv strongly preferred on edges 1,0 / 2,4 / 6,8
        for e in (0, 1, 2, 4, 6, 8):
            p[e, 1] = 5.0
        g = parse_genotype(p, p)
        edges = [e for e, _ in g.normal]
        assert edges == [0, 1, 2, 4, 6, 8]
        assert all(op == 1 for _, op in g.normal)

    def test_canonical_sorted(self):
        gene = canonicalize_gene([(1, 0), (0, 1), (3, 1), (2, 0), (6, 1), (5, 0)])
        assert gene == ((0, 1), (1, 0), (2, 0), (3, 1), (5, 0), (6, 1))
