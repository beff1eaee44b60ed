"""Monocular-depth metric suite (rag_depth variant).

Reference: rag_depth/src/approaches/rag.py:19-41 ``compute_errors`` —
silog, abs_rel, log10, rms, sq_rel, log_rms, delta<1.25^{1,2,3}, computed
over the valid (gt>0) mask. Vectorized masked formulation for jit.
"""

from __future__ import annotations

import jax.numpy as jnp

DEPTH_METRIC_NAMES = (
    "silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms", "d1", "d2", "d3"
)


def depth_metrics(pred, gt, mask, axis=None):
    """pred/gt/mask: (B,H,W). Returns dict of scalars over the masked pixels
    (pooled over the batch, matching the reference which flattens gt[mask]).

    axis: data-parallel shard_map axis — masked sums psum across shards
    (rag_tpu.parallel.axis) so the sharded global batch reproduces the
    single-device pooled statistics exactly."""
    from rag_tpu.parallel.axis import psum_if

    m = mask.astype(jnp.float32)
    n = jnp.maximum(psum_if(jnp.sum(m), axis), 1.0)
    eps = 1e-12
    p = jnp.maximum(pred, eps)
    g = jnp.maximum(gt, eps)

    def mmean(x):
        return psum_if(jnp.sum(x * m), axis) / n

    thresh = jnp.maximum(g / p, p / g)
    d1 = mmean((thresh < 1.25).astype(jnp.float32))
    d2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    d3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    rms = jnp.sqrt(mmean((g - p) ** 2))
    log_rms = jnp.sqrt(mmean((jnp.log(g) - jnp.log(p)) ** 2))
    abs_rel = mmean(jnp.abs(g - p) / g)
    sq_rel = mmean(((g - p) ** 2) / g)

    err = jnp.log(p) - jnp.log(g)
    silog = jnp.sqrt(jnp.maximum(mmean(err ** 2) - mmean(err) ** 2, 0.0)) * 100.0
    log10 = mmean(jnp.abs(jnp.log10(p) - jnp.log10(g)))

    return {
        "silog": silog, "abs_rel": abs_rel, "log10": log10, "rms": rms,
        "sq_rel": sq_rel, "log_rms": log_rms, "d1": d1, "d2": d2, "d3": d3,
    }
