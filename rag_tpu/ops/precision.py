"""Mixed-precision policy: bf16 at rest, f32 compute.

TPU fact that shapes this design: under the DEFAULT dot/conv precision,
the MXU already executes f32 matmuls as single-pass bf16 — casting
operands to bf16 buys NO extra FLOPs. What bf16 does buy is bandwidth:
HBM reads/writes, kernel DMA slabs, and XLA fusion traffic all halve.
So the policy here keeps every accumulation, BN statistic, parameter,
and gradient in f32 and stores the big cf-matching activations
(cost-volume stem outputs, cell states, resize outputs) in bf16:

  * params / optimizer state / BN running stats: f32 always;
  * cf matching activations BETWEEN ops: compute_dtype() (bf16 when
    RAG_TPU_COMPUTE_DTYPE=bfloat16, default f32);
  * inside the Pallas kernels: blocks arrive bf16, are cast to f32
    right after the aligned window load (register cast — avoids every
    Mosaic unaligned-16-bit-layout hazard), all matmuls accumulate
    f32, and the store casts back;
  * BN normalizes in f32 (stats from an f32 upcast) and returns the
    input's dtype;
  * the disparity head always runs f32 (softmin over 192 levels
    amplifies noise; the head input is small).

The reference has no mixed-precision story (pure f32 torch,
/root/reference/src/run.py); this is a TPU-native addition demanded by
the north star. Enable with RAG_TPU_COMPUTE_DTYPE=bfloat16 or the CLI
flag --bf16.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def compute_dtype() -> jnp.dtype:
    """Activation storage dtype for the big cf-matching tensors.

    Read dynamically (not frozen at import) so tests and the CLI can
    flip it per-process; jit caches stay correct because the entry cast
    changes the traced input dtypes.
    """
    return jnp.dtype(os.environ.get("RAG_TPU_COMPUTE_DTYPE", "float32"))


def mixed() -> bool:
    return compute_dtype() != jnp.float32


def cast_in(x):
    """Cast an activation into the policy dtype (no-op at f32)."""
    dt = compute_dtype()
    return x if x.dtype == dt else x.astype(dt)


def feature_dtype() -> jnp.dtype:
    """Storage dtype for the 2D feature net.

    Round 3 trace finding: at the bf16 production config the f32
    feature-net buffers (stem0/stem1 run at FULL resolution on the
    stacked 2B batch — f32[8,192,384,6] is 56 MB) account for ~2 ms of
    fusion/reduce traffic per train step. Conv weights cast to the
    activation dtype and BatchNorm always computes statistics in f32
    (ops/convbr.py), so riding the features bf16 is safe; disable with
    RAG_TPU_BF16_FEATURES=0 to pin features f32 under a bf16 policy.
    """
    if not mixed() or os.environ.get("RAG_TPU_BF16_FEATURES", "1") != "1":
        return jnp.dtype(jnp.float32)
    return compute_dtype()


def cast_feature_in(x):
    """Cast an image/feature activation into the feature-net dtype."""
    dt = feature_dtype()
    return x if x.dtype == dt else x.astype(dt)


def cast_f32(x):
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)
