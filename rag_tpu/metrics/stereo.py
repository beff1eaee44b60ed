"""KITTI-style stereo metrics with the reference's per-image protocol.

Reference: src/utilstool/metrics.py —
  * D1: err > 3px AND err/|gt| > 5% (:43-49)
  * Thres(tau): err > tau (:51-58)
  * EPE: mean |err| (:61-65)
  * per-image wrapper (:22-41): metrics are computed per image over the
    valid mask, images whose mask covers < 10% of the gt>0 area are
    SKIPPED, and the per-image values are averaged.

TPU formulation: instead of python-level skipping we compute per-image
values and a per-image weight (0 for skipped images) in one vectorized
pass — jit-able and batched. The host-facing helpers return plain floats.
"""

from __future__ import annotations

import jax.numpy as jnp


def _per_image(vals, weights, axis=None):
    """Weighted mean over kept images. axis: data-parallel shard_map axis —
    numerator and denominator psum across shards so the sharded batch
    reproduces the single-device per-image average exactly."""
    from rag_tpu.parallel.axis import psum_if

    total = psum_if(jnp.sum(weights), axis)
    num = psum_if(jnp.sum(vals * weights), axis)
    return jnp.where(total > 0, num / jnp.maximum(total, 1), 0.0)


def _image_weights(d_gt, mask):
    """1.0 for images that pass the reference's <10%-coverage skip rule.

    kept  <=>  mask.mean()/ (gt>0).mean() >= 0.1  <=>  10*|mask| >= |gt>0|.
    The sum form is EXACT at the ratio==0.1 boundary: pixel counts are
    integers representable in f32 (XLA lowers mean to sum*(1/n), whose
    rounding can land 1 ulp below 0.1 — pinned in tests/test_metrics_spec).
    Images with no gt>0 pixels get weight 0 (the reference's nan-poisoning
    divide-by-zero is a bug we deliberately do not replicate)."""
    axes = tuple(range(1, d_gt.ndim))
    mask_sum = jnp.sum(mask.astype(jnp.float32), axis=axes)
    gt_sum = jnp.sum((d_gt > 0).astype(jnp.float32), axis=axes)
    return ((10.0 * mask_sum >= gt_sum) & (gt_sum > 0)).astype(jnp.float32)


def _masked_image_mean(x, mask):
    axes = tuple(range(1, x.ndim))
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m, axis=axes), 1.0)
    return jnp.sum(x * m, axis=axes) / denom


def d1_metric(d_est, d_gt, mask, axis=None):
    """(B,H,W) arrays -> scalar D1-all fraction (per-image averaged)."""
    err = jnp.abs(d_gt - d_est)
    bad = (err > 3.0) & (err / jnp.maximum(jnp.abs(d_gt), 1e-12) > 0.05)
    per_img = _masked_image_mean(bad.astype(jnp.float32), mask)
    return _per_image(per_img, _image_weights(d_gt, mask), axis)


def thres_metric(d_est, d_gt, mask, tau, axis=None):
    err = jnp.abs(d_gt - d_est)
    per_img = _masked_image_mean((err > tau).astype(jnp.float32), mask)
    return _per_image(per_img, _image_weights(d_gt, mask), axis)


def epe_metric(d_est, d_gt, mask, axis=None):
    err = jnp.abs(d_gt - d_est)
    per_img = _masked_image_mean(err, mask)
    return _per_image(per_img, _image_weights(d_gt, mask), axis)


def stereo_metrics(d_est, d_gt, mask, axis=None):
    """All standard scalars in one jit-able dict."""
    return {
        "EPE": epe_metric(d_est, d_gt, mask, axis),
        "D1": d1_metric(d_est, d_gt, mask, axis),
        "Thres1": thres_metric(d_est, d_gt, mask, 1.0, axis),
        "Thres2": thres_metric(d_est, d_gt, mask, 2.0, axis),
        "Thres3": thres_metric(d_est, d_gt, mask, 3.0, axis),
    }
