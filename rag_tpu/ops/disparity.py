"""Soft-argmin disparity regression.

Mirrors the reference's Disp head (src/models/rag_model.py:32-44 +
DisparityRegression :18-29): trilinear-upsample the 1-channel matching cost
from (D/3, H/3, W/3) to (maxdisp, H, W) with align_corners=False, Softmin
over the disparity axis, then the expectation sum(d * p(d)).

TPU formulation: each upsample axis is a dense interpolation-matrix
contraction (see rag_tpu.ops.resize); softmin + expectation fuse into the
surrounding elementwise graph. A Pallas kernel that never materializes the
(maxdisp, H, W) volume is in rag_tpu.ops.pallas_kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rag_tpu.ops.resize import interp_matrix


def soft_argmin_disparity(cost, maxdisp: int, scale: int = 3):
    """cost: (B, D, h, w, 1) matching output (D = maxdisp // scale).

    Returns disparity map (B, scale*h, scale*w).
    """
    b, d, h, w, c = cost.shape
    assert c == 1
    x = cost[..., 0]  # (B, D, h, w)

    m_d = interp_matrix(d, maxdisp, align_corners=False)       # (maxdisp, D)
    m_h = interp_matrix(h, h * scale, align_corners=False)     # (H, h)
    m_w = interp_matrix(w, w * scale, align_corners=False)     # (W, w)

    x = jnp.einsum("Dd,bdhw->bDhw", m_d, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("Hh,bDhw->bDHw", m_h, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("Ww,bDHw->bDHW", m_w, x, preferred_element_type=jnp.float32)

    p = jax.nn.softmax(-x, axis=1)  # Softmin over disparity
    dvals = jnp.arange(maxdisp, dtype=x.dtype)
    return jnp.einsum("d,bdHW->bHW", dvals, p, preferred_element_type=jnp.float32)
