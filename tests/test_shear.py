"""Shear-collapsed cost-volume+stem Pallas kernel (rag_tpu.ops.pallas_shear).

Exactness contract: shear_stem_z == conv3d(cost_volume_cf(x, y, D), w) —
the same bit-equality-on-integers protocol as tests/test_cvstem.py, run
through the kernel code via the Pallas interpreter, over shapes that
exercise the lane-roll wraps, the D-pad gates, and the W-edge masks.
Gradients (through the custom VJP adjoint kernel + the XLA tap-map convs)
must match the materialized composition too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_tpu.ops.pallas_cvstem import _xla_cvstem
from rag_tpu.ops.pallas_shear import shear_stem_z, tap_maps, shear_adjoint


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("RAG_TPU_KERNEL_INTERPRET", "1")


def _int_inputs(key, b, c, h, w, cout, lo=-3, hi=4):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.randint(k1, (b, c, h, w), lo, hi).astype(jnp.float32)
    y = jax.random.randint(k2, (b, c, h, w), lo, hi).astype(jnp.float32)
    w3 = jax.random.randint(k3, (3, 3, 3, 2 * c, cout), lo, hi).astype(
        jnp.float32)
    return x, y, w3


@pytest.mark.parametrize("b,c,h,w,cout,nd", [
    (1, 4, 8, 16, 4, 5),      # tiny, D < W
    (1, 3, 8, 24, 6, 24),     # D == W (rolls wrap the full lane range)
    (2, 4, 16, 16, 4, 8),     # batch revisiting
    (1, 4, 8, 130, 4, 6),     # W > 128: lane padding + cyclic wrap zone
])
def test_forward_bit_exact(b, c, h, w, cout, nd):
    x, y, w3 = _int_inputs(7 * b + nd, b, c, h, w, cout)
    z = shear_stem_z(x, y, w3, nd)
    ref = _xla_cvstem(x, y, w3, nd)
    assert z.shape == ref.shape
    assert np.array_equal(np.asarray(z, np.float64),
                          np.asarray(ref, np.float64)), \
        np.abs(np.asarray(z) - np.asarray(ref)).max()


def test_gradients_match():
    b, c, h, w, cout, nd = 1, 3, 8, 16, 4, 6
    x, y, w3 = _int_inputs(0, b, c, h, w, cout, lo=-2, hi=3)
    cot = jax.random.randint(jax.random.PRNGKey(9), (b, nd, cout, h, w),
                             -2, 3).astype(jnp.float32)

    def f_shear(x_, y_, w_):
        return jnp.vdot(shear_stem_z(x_, y_, w_, nd), cot)

    def f_ref(x_, y_, w_):
        return jnp.vdot(_xla_cvstem(x_, y_, w_, nd), cot)

    gs = jax.grad(f_shear, argnums=(0, 1, 2))(x, y, w3)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, y, w3)
    for a, b_ in zip(gs, gr):
        assert np.array_equal(np.asarray(a), np.asarray(b_)), \
            np.abs(np.asarray(a) - np.asarray(b_)).max()


def test_adjoint_is_transpose_of_forward():
    # <shear(px, py), g> == <px, dpx> + <py, dpy> (linearity in tap maps)
    b, c, h, w, cout, nd = 1, 3, 8, 16, 4, 6
    x, y, w3 = _int_inputs(3, b, c, h, w, cout, lo=-2, hi=3)
    px, py = tap_maps(x, y, w3)
    from rag_tpu.ops.pallas_shear import _shear_op

    g = jax.random.randint(jax.random.PRNGKey(4), (b, nd, cout, h, w),
                           -2, 3).astype(jnp.float32)
    z = _shear_op(px, py, nd, w)
    dpx, dpy = shear_adjoint(g, nd, w, interpret=True)
    lhs = float(jnp.vdot(z, g))
    rhs = float(jnp.vdot(px, dpx) + jnp.vdot(py, dpy))
    assert lhs == rhs, (lhs, rhs)


@pytest.mark.slow
def test_wiring_through_stereo_forward(monkeypatch):
    # the RAG_TPU_CVSTEM_SHEAR branch in run_matching_cf must produce the
    # same disparity as the default path (force-enable off-TPU via the
    # interpreter + an _on_tpu monkeypatch)
    import rag_tpu.ops.pallas_conv3d as pc

    from rag_tpu.models.stereo import (
        build_head_specs,
        build_site_specs,
        init_sites,
        stereo_forward,
    )
    from rag_tpu.search.genotype import default_genotype

    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(0), specs)
    left = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 48, 3))
    right = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 48, 3))

    base, _ = stereo_forward(specs, params, stats, left, right,
                             cf_matching=True)
    monkeypatch.setenv("RAG_TPU_CVSTEM_SHEAR", "1")
    monkeypatch.setattr(pc, "_on_tpu", lambda: True)
    monkeypatch.setenv("RAG_TPU_CONV3D_KERNEL", "0")  # cells stay XLA
    shear, _ = stereo_forward(specs, params, stats, left, right,
                              cf_matching=True)
    assert np.allclose(np.asarray(base), np.asarray(shear),
                       rtol=1e-4, atol=1e-3)


def test_bf16_stack_path():
    # under the bf16-at-rest policy the tap stacks ride compute_dtype; the
    # kernel accumulates f32 and returns the stack dtype
    import os

    os.environ["RAG_TPU_COMPUTE_DTYPE"] = "bfloat16"
    try:
        x, y, w3 = _int_inputs(1, 1, 3, 8, 16, 4, lo=-2, hi=3)
        z = shear_stem_z(x, y, w3, 5)
        assert z.dtype == jnp.bfloat16
        ref = _xla_cvstem(x, y, w3, 5)
        assert np.allclose(np.asarray(z, np.float32), np.asarray(ref),
                           rtol=0.02, atol=0.1)
    finally:
        os.environ.pop("RAG_TPU_COMPUTE_DTYPE")
