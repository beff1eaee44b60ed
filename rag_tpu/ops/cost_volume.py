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

Output layout: (B, D, H, W, 2C) — NDHWC for the 3D matching net;
cost_volume_cf emits the channel-first (B, D, 2C, h, w) layout the Pallas
matching path consumes.
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


def cost_volume_cf(x, y, num_disp: int):
    """Channel-first cost volume: (B, H, W, C) features ->
    (B, D, 2C, H, W), the native layout of the Pallas matching path.

    Same semantics as cost_volume; built from small (B, C, H, W) feature
    transposes instead of transposing the 40x bigger volume afterwards.
    """
    b, h, w, c = x.shape
    d = num_disp
    x_cf = jnp.transpose(x, (0, 3, 1, 2))       # (B, C, H, W)
    y_cf = jnp.transpose(y, (0, 3, 1, 2))
    j = jnp.arange(w)[None, :]
    disp = jnp.arange(d)[:, None]
    src = j - disp                              # (D, W)
    valid = (src >= 0).astype(x.dtype)
    src_c = jnp.clip(src, 0, w - 1)

    y_shift = jnp.take(y_cf, src_c, axis=3)     # (B, C, H, D, W)
    y_shift = jnp.moveaxis(y_shift, 3, 1)       # (B, D, C, H, W)
    mask = valid[None, :, None, None, :]
    y_part = y_shift * mask
    x_part = jnp.broadcast_to(x_cf[:, None], (b, d, c, h, w)) * mask
    return jnp.concatenate([x_part, y_part], axis=2)
