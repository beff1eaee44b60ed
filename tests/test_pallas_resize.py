"""cf trilinear resize kernel (rag_tpu.ops.pallas_resize) vs the matmul
formulation — forward, adjoint, and the tap-table decomposition. Runs the
exact TPU code path via RAG_TPU_KERNEL_INTERPRET=1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.ops.pallas_resize import _taps_np, _xla_resize_cf, resize_cf
from rag_tpu.ops.resize import _interp_matrix_np


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("RAG_TPU_KERNEL_INTERPRET", "1")
    # the kernel defaults OFF (negative result on v5e, see _use_kernel);
    # force it on so these tests pin the kernel's exactness
    monkeypatch.setenv("RAG_TPU_RESIZE_KERNEL", "1")


@pytest.mark.parametrize("target", [(3, 8, 12), (12, 32, 48), (6, 16, 24),
                                    (4, 8, 24), (6, 8, 48)])
def test_forward_matches_matmul(target):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 5, 16, 24))
    a = resize_cf(x, *target, True)
    b = _xla_resize_cf(x, *target, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("target", [(3, 8, 12), (12, 32, 48)])
def test_gradient_matches_matmul(target):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 4, 16, 24))

    def f(xx):
        return jnp.sum(jnp.sin(resize_cf(xx, *target, True)))

    def g(xx):
        return jnp.sum(jnp.sin(_xla_resize_cf(xx, *target, True)))

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(g)(x)),
                               rtol=1e-5, atol=1e-6)


def test_tap_tables_reconstruct_matrix():
    for (n_in, n_out, tr) in [(64, 32, False), (32, 64, False),
                              (64, 32, True), (7, 13, True)]:
        m = _interp_matrix_np(n_in, n_out, True)
        if tr:
            m = m.T
        idx, w = _taps_np(n_in, n_out, True, tr)
        rec = np.zeros_like(m)
        for r in range(m.shape[0]):
            for kk in range(idx.shape[1]):
                rec[r, idx[r, kk]] += w[r, kk]
        np.testing.assert_allclose(rec, m, atol=1e-7)


def test_identity_axes_skip():
    """Unchanged axes must pass through exactly."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 8, 16))
    out = resize_cf(x, 4, 8, 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)
