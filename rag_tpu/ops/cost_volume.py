"""Concat cost-volume construction.

The reference assembles the 4D cost volume with a 64-iteration python loop of
strided tensor copies (src/models/rag_model.py:375-383) — launch-bound and
memory-bound on GPU, and hostile to XLA. Here it is a single gather-free
formulation: the right features are shifted along W by a dense disparity
gather expressed with jnp.take, the left features broadcast, both masked
where the shifted column would fall off the image (the reference zero-fills
exactly those positions for BOTH halves).

Semantics (D = maxdisp // 3, NHWC features):
    cost[b, d, i, j, :C]   = x[b, i, j, :]      if j >= d else 0
    cost[b, d, i, j, C:2C] = y[b, i, j - d, :]  if j >= d else 0

Output layout: (B, D, H, W, 2C) — NDHWC for the 3D matching net.

A fused Pallas kernel lives in rag_tpu.ops.pallas_kernels; this jnp version
is the semantic reference and the autodiff fallback.
"""

from __future__ import annotations

import jax.numpy as jnp


def cost_volume(x, y, num_disp: int):
    """Build the concat cost volume.

    x, y: (B, H, W, C) left/right features at 1/3 resolution.
    Returns (B, num_disp, H, W, 2C).
    """
    b, h, w, c = x.shape
    d = num_disp
    j = jnp.arange(w)[None, :]          # (1, W)
    disp = jnp.arange(d)[:, None]       # (D, 1)
    src = j - disp                      # (D, W): source column in right image
    valid = (src >= 0).astype(x.dtype)  # (D, W)
    src_c = jnp.clip(src, 0, w - 1)

    # gather right features: (B, H, D, W, C) -> (B, D, H, W, C)
    y_shift = jnp.take(y, src_c, axis=2)        # (B, H, D, W, C)
    y_shift = jnp.moveaxis(y_shift, 2, 1)
    mask = valid[None, :, None, :, None]
    y_part = y_shift * mask
    x_part = jnp.broadcast_to(x[:, None], (b, d, h, w, c)) * mask
    return jnp.concatenate([x_part, y_part], axis=-1)
