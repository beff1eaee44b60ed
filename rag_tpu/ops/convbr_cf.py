"""Channel-first (B, D, C, H, W) variants of ConvBR/BN for the 3D matching
path.

Why: the Pallas conv3d kernel needs W on the 128-lane dim; converting at
every conv costs two 100+ MB transposes per call, which erased the
kernel's 1.65-2.35x win (measured). These ops keep the volume
channel-first end to end: the conv kernel runs natively, BN normalizes
axis 2, and only the pipeline boundaries transpose (cost volume in,
nothing out — the matching output (B,D,1,h,w) drops straight into the
disparity head's (B,D,h,w) input).

Parameter/stat trees are IDENTICAL to the channels-last ops (same leaves,
same shapes) — checkpoints and the growth registry are layout-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rag_tpu.ops.convbr import BN_EPS, BN_MOMENTUM, ConvBRSpec


def batch_norm_cf(x, params, stats, train: bool, momentum: float = BN_MOMENTUM):
    """x: (B, D, C, H, W); channel axis 2.

    Stats and normalization in f32 (bf16 batch statistics drift); output
    keeps x's dtype (bf16-at-rest policy, rag_tpu.ops.precision)."""
    from rag_tpu.parallel.axis import bn_axis

    axes = (0, 1, 3, 4)
    shape = (1, 1, -1, 1, 1)
    xf = x.astype(jnp.float32)
    if train:
        # cross-shard batch statistics under a data-parallel shard_map
        # (rag_tpu.parallel.axis): pmean makes the sharded global batch
        # reproduce single-device statistics exactly
        ax = bn_axis()
        mean = jnp.mean(xf, axis=axes)
        msq = jnp.mean(jnp.square(xf), axis=axes)
        if ax is not None:
            mean = jax.lax.pmean(mean, ax)
            msq = jax.lax.pmean(msq, ax)
        var = msq - jnp.square(mean)
        n = (x.size // x.shape[2]) * (1 if ax is None
                                      else jax.lax.psum(1, ax))
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (xf - mean.reshape(shape)) * (inv * params["scale"]).reshape(shape) \
        + params["bias"].reshape(shape)
    return y.astype(x.dtype), new_stats


def _conv_cf(x, w, spec: ConvBRSpec):
    """Plain XLA conv in NCDHW terms (x: (B, D, C, H, W)).

    Dtype-preserving: weights cast to the activation dtype, accumulation
    f32, output back in x's dtype (no-ops at f32)."""
    # preferred_element_type equals the operand dtype for non-f32 so the
    # transpose never mixes a f32 cotangent into a bf16 conv/dot (the MXU
    # accumulates f32 internally either way; see rag_tpu.ops.convbr._conv)
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    if spec.kernel == 1 and spec.stride == 1:
        # 1x1x1 conv = channel contraction; dot_general directly in the cf
        # layout skips the two full-volume layout transposes below (the
        # pre/prep/head 1x1s run once per cell on the big matching volume)
        y = jnp.einsum("oi,bdihw->bdohw", w[0, 0, 0].T.astype(x.dtype), x,
                       preferred_element_type=pet)
        return y.astype(x.dtype)
    # lax expects (N, C, spatial...): permute D into the spatial block
    xt = jnp.transpose(x, (0, 2, 1, 3, 4))  # (B, C, D, H, W)
    wt = jnp.transpose(w, (4, 3, 0, 1, 2))  # (O, I, kd, kh, kw)
    pad = [(spec.padding, spec.padding)] * 3
    y = jax.lax.conv_general_dilated(
        xt, wt.astype(x.dtype), (spec.stride,) * 3, pad,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=pet)
    return jnp.transpose(y, (0, 2, 1, 3, 4)).astype(x.dtype)


def _kernel_ok(spec: ConvBRSpec, x) -> bool:
    import os

    if os.environ.get("RAG_TPU_CONV3D_KERNEL", "1") != "1":
        return False
    if spec.kernel != 3 or spec.stride != 1:
        return False
    if x.shape[3] % 8 != 0:  # any W: the kernel lane-pads internally
        return False
    from rag_tpu.ops.pallas_conv3d import _on_tpu

    return _on_tpu()


def apply_convbr_cf(spec: ConvBRSpec, params, stats, x, train: bool):
    """conv -> BN -> ReLU on a (B, D, C, H, W) volume."""
    assert spec.ndim == 3
    if _kernel_ok(spec, x):
        from rag_tpu.ops.pallas_conv3d import conv3d_brc_cf

        if spec.bn and not train:
            inv = jax.lax.rsqrt(stats["var"] + BN_EPS)
            a = params["scale"] * inv
            b = params["bias"] - stats["mean"] * a
            return conv3d_brc_cf(x, params["w"], a, b, spec.relu), stats
        y = conv3d_brc_cf(x, params["w"],
                          jnp.ones((spec.cout,), jnp.float32),
                          jnp.zeros((spec.cout,), jnp.float32), False)
    else:
        y = _conv_cf(x, params["w"], spec)
        if not spec.bn:
            if spec.relu:
                y = jax.nn.relu(y)
            return y, stats
    if spec.bn:
        y, stats = batch_norm_cf(y, params, stats, train)
    if spec.relu:
        y = jax.nn.relu(y)
    return y, stats
