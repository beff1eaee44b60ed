"""Training losses: supervised smooth-L1, self-supervised photometric
(SSIM + L1 + edge-aware smoothness), and silog depth loss.

References:
  * smooth-L1 over the 0<gt<maxdisp mask — src/approaches/rag.py:210-211.
  * photometric re_and_sm_loss — src_self/models/loss.py:112-141
    (0.85*SSIM + 0.15*L1 reconstruction via disparity warp, + 0.1 *
    edge-aware smoothness).
  * silog — rag_depth/src/utilstool/experiment.py:154-161
    (variance_focus 0.85, x10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_masked(pred, target, mask, beta: float = 1.0, axis=None):
    """Masked mean smooth-L1 (torch F.smooth_l1_loss semantics, beta=1).

    axis: data-parallel shard_map axis name — the masked sums reduce
    across the shards so the sharded global batch yields the exact
    single-device loss (rag_tpu.parallel.axis)."""
    from rag_tpu.parallel.axis import psum_if

    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    m = mask.astype(loss.dtype)
    num = psum_if(jnp.sum(loss * m), axis)
    den = psum_if(jnp.sum(m), axis)
    return num / jnp.maximum(den, 1.0)


def silog_loss(depth_est, depth_gt, mask, variance_focus: float = 0.85,
               axis=None):
    """Scale-invariant log loss over the masked pixels."""
    from rag_tpu.parallel.axis import psum_if

    m = mask.astype(jnp.float32)
    n = jnp.maximum(psum_if(jnp.sum(m), axis), 1.0)
    d = (jnp.log(jnp.maximum(depth_est, 1e-8)) - jnp.log(jnp.maximum(depth_gt, 1e-8))) * m
    mean_sq = psum_if(jnp.sum(d * d), axis) / n
    mean = psum_if(jnp.sum(d), axis) / n
    return jnp.sqrt(jnp.maximum(mean_sq - variance_focus * mean * mean, 1e-12)) * 10.0


def warp_by_disparity(image, disp):
    """Inverse-warp the right image to the left view by the disparity map.

    image: (B,H,W,C); disp: (B,H,W) positive left-disparities. Bilinear
    sampling along W with zero border and a validity mask, mirroring
    src_self/models/loss.py:6-36 (grid_sample with out-of-range masking).
    """
    b, h, w, c = image.shape
    x = jnp.arange(w, dtype=jnp.float32)[None, None, :] - disp  # (B,H,W) source col
    x0 = jnp.floor(x)
    frac = x - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    g0 = jnp.take_along_axis(image, i0[..., None].repeat(c, -1), axis=2)
    g1 = jnp.take_along_axis(image, i1[..., None].repeat(c, -1), axis=2)
    out = g0 * (1.0 - frac[..., None]) + g1 * frac[..., None]
    valid = ((x >= 0) & (x <= w - 1)).astype(image.dtype)[..., None]
    return out * valid, valid


def warp_by_disparity_scan(image, disp, max_disp: int = 192):
    """Gather-free warp: identical math to warp_by_disparity for
    disp in [0, max_disp], restructured for the TPU.

    Bilinear sampling along W is a sum of hat-weighted integer shifts:
        left_est[w] = sum_d max(0, 1 - |disp[w] - d|) * image[w - d]
    — a lax.scan of vectorized shift+mask+fma passes instead of two
    take_along_axis gathers (TPU gathers serialize per element; the
    measured photometric step was gather-bound). The hat weights
    reproduce the lerp exactly: at x = w - disp, only d = floor(disp)
    and d+1 have nonzero weight, equal to (1-frac, frac). Out-of-range
    source columns (x < 0) get zero weight from the w >= d masks, and
    the validity mask matches the gather version's zero-border rule.
    """
    b, h, w, c = image.shape
    dmax = int(min(max_disp, w))  # shifts beyond W contribute nothing

    col = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    def body(acc, d):
        df = d.astype(jnp.float32)
        weight = jnp.maximum(0.0, 1.0 - jnp.abs(disp - df))
        # image[w - d] with zero fill for w < d: a static-shape dynamic
        # shift along W (lax-friendly, no wraparound contribution)
        shifted = jnp.roll(image, d, axis=2)
        keep = (col >= df).astype(image.dtype)[..., None]
        acc = acc + (weight[..., None] * (shifted * keep)).astype(acc.dtype)
        return acc, None

    acc = jnp.zeros_like(image, dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(dmax + 1))
    x = col - disp
    valid = ((x >= 0) & (x <= w - 1)).astype(image.dtype)[..., None]
    return acc.astype(image.dtype) * valid, valid


def _use_scan_warp() -> bool:
    """Scan warp on TPU (gather-bound there), gather warp elsewhere;
    RAG_TPU_SCAN_WARP=0/1 forces."""
    import os

    v = os.environ.get("RAG_TPU_SCAN_WARP")
    if v is not None:
        return v == "1"
    import jax as _jax

    return _jax.default_backend() not in ("cpu",)


def _avg_pool3(x):
    """3x3 valid-window mean over H,W of an NHWC array (torch
    F.avg_pool2d(kernel_size=3) has stride=3; here we keep stride 3 to
    match the reference's SSIM exactly)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 3, 3, 1), "VALID"
    ) / 9.0


def ssim(x, y):
    """SSIM dissimilarity in [0,1], reference src_self/models/loss.py:78-99."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = _avg_pool3(x), _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) / 2.0, 0.0, 1.0)


def photometric_loss(disp_est, left, right, axis=None):
    """0.85*SSIM + 0.15*L1 reconstruction + 0.1*edge-aware smoothness.

    disp_est: (B,H,W); left/right: (B,H,W,C). All terms are plain means
    over equal-sized shards, so the data-parallel reduction is a pmean.
    """
    from rag_tpu.parallel.axis import pmean_if
    warp = warp_by_disparity_scan if _use_scan_warp() else warp_by_disparity
    left_est, _ = warp(right, disp_est)
    recon = 0.85 * jnp.mean(ssim(left, left_est)) + 0.15 * jnp.mean(
        jnp.abs(left - left_est)
    )

    d = disp_est[..., None]
    dgx = d[:, :, :-1] - d[:, :, 1:]
    dgy = d[:, :-1, :] - d[:, 1:, :]
    igx = jnp.mean(left[:, :, :-1] - left[:, :, 1:], axis=-1, keepdims=True)
    igy = jnp.mean(left[:, :-1, :] - left[:, 1:, :], axis=-1, keepdims=True)
    wx = jnp.exp(-jnp.abs(igx))
    wy = jnp.exp(-jnp.abs(igy))
    smooth = jnp.mean(jnp.abs(dgx) * wx) + jnp.mean(jnp.abs(dgy) * wy)
    return pmean_if(recon + 0.1 * smooth, axis)
