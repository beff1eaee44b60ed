"""Matmul-based separable linear interpolation (bilinear / trilinear).

The reference leans on torch ``F.interpolate`` for inter-scale feature
resizing (align_corners=True inside cells, src/models/rag_model.py:83-86,
150-153) and for the final trilinear upsample of the cost volume
(align_corners=False, src/models/rag_model.py:40). On TPU we express each
axis resize as a dense (n_out x n_in) interpolation matrix contracted via
einsum: the matrices are tiny trace-time constants, the contraction lands on
the MXU, and XLA fuses the chain — no gather/scatter, no dynamic shapes.

``scale_dimension`` mirrors the reference's target-size rule
(src/models/rag_model.py:74-75) so grown cells see the exact same geometry.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def scale_dimension(dim: int, scale: float) -> int:
    """Reference target-size rule for intra-cell down/up sampling."""
    return int((float(dim) - 1.0) * scale + 1.0) if dim % 2 == 1 else int(float(dim) * scale)


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    if align_corners:
        if n_out == 1:
            x = np.zeros((1,), np.float64)
        else:
            x = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        x = np.clip(x, 0.0, n_in - 1)
    i0 = np.floor(x).astype(np.int64)
    i0 = np.minimum(i0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = x - i0
    m = np.zeros((n_out, n_in), np.float64)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - w1)
    np.add.at(m, (rows, i1), w1)
    return m.astype(np.float32)


def interp_matrix(n_in: int, n_out: int, align_corners: bool) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(n_in, n_out, align_corners))


def resize_linear(x, out_sizes, axes, align_corners: bool):
    """Resize ``x`` along ``axes`` to ``out_sizes`` with linear interpolation.

    x: any-rank array; axes: tuple of axis indices; out_sizes: matching tuple.
    """
    assert len(out_sizes) == len(axes)
    dt = x.dtype
    for axis, n_out in zip(axes, out_sizes):
        n_in = x.shape[axis]
        if n_in == n_out:
            continue
        # dtype-preserving: bf16 activations contract against a bf16 copy
        # of the (exactly-representable-to-~3 decimal digits) interp matrix
        # with f32 accumulation — keeps the bf16-at-rest policy's traffic
        # halving through the resize chain.
        m = interp_matrix(n_in, n_out, align_corners).astype(dt)
        x = jnp.moveaxis(x, axis, -1)
        x = jnp.matmul(x, m.T, preferred_element_type=dt)
        x = jnp.moveaxis(x, -1, axis).astype(dt)
    return x


def resize_spatial_2d(x, h, w, align_corners=True):
    """NHWC bilinear resize."""
    return resize_linear(x, (h, w), (1, 2), align_corners)


def resize_spatial_3d(x, d, h, w, align_corners=True):
    """NDHWC trilinear resize."""
    return resize_linear(x, (d, h, w), (1, 2, 3), align_corners)
