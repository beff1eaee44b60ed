"""Conv + BatchNorm + ReLU blocks, functional style.

The reference's primitive op vocabulary is ConvBR_2d / ConvBR_3d
(/root/reference/src/automl/operations_2d.py:31-54, operations_3d.py:31-55):
a bias-free conv, BatchNorm (momentum 0.1, eps 1e-5), optional ReLU, with
kaiming-normal fan-out init. We reproduce those semantics functionally:

  * params:  {'w': (*k, cin, cout), 'scale': (cout,), 'bias': (cout,)}
  * stats:   {'mean': (cout,), 'var': (cout,)}   (BN running stats)
  * apply(spec, params, stats, x, train) -> (y, new_stats)

Layouts are TPU-native channels-last: NHWC for 2D, NDHWC for 3D (the
reference uses torch NCHW/NCDHW; that is an implementation detail we do not
copy). In train mode BN normalizes with the current batch statistics and
returns updated running stats; in frozen/eval mode it normalizes with the
running stats and returns them unchanged — this carries the reference's
"reused units keep BN in eval()" semantics (src/approaches/rag.py:159-201).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


@dataclasses.dataclass(frozen=True)
class ConvBRSpec:
    """Static description of a ConvBR block (hashable: part of jit keys)."""

    ndim: int  # 2 or 3 spatial dims
    cin: int
    cout: int
    kernel: int
    stride: int = 1
    bn: bool = True
    relu: bool = True

    @property
    def padding(self) -> int:
        # reference always uses padding = kernel//2 except 1x1 (padding 0);
        # stride-3 stem uses padding 1 with kernel 3.
        return self.kernel // 2


def _kaiming_fan_out(key, shape, fan_out):
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def init_convbr(key, spec: ConvBRSpec) -> Tuple[Any, Any]:
    """Initialize params/stats for a ConvBR block."""
    k = (spec.kernel,) * spec.ndim
    w_shape = k + (spec.cin, spec.cout)
    fan_out = spec.cout * int(np.prod(k))
    params = {"w": _kaiming_fan_out(key, w_shape, fan_out)}
    stats = {}
    if spec.bn:
        params["scale"] = jnp.ones((spec.cout,), jnp.float32)
        params["bias"] = jnp.zeros((spec.cout,), jnp.float32)
        stats = {
            "mean": jnp.zeros((spec.cout,), jnp.float32),
            "var": jnp.ones((spec.cout,), jnp.float32),
        }
    return params, stats


def init_convbr2d(key, cin, cout, kernel, stride=1, bn=True, relu=True):
    spec = ConvBRSpec(2, cin, cout, kernel, stride, bn, relu)
    params, stats = init_convbr(key, spec)
    return spec, params, stats


def init_convbr3d(key, cin, cout, kernel, stride=1, bn=True, relu=True):
    spec = ConvBRSpec(3, cin, cout, kernel, stride, bn, relu)
    params, stats = init_convbr(key, spec)
    return spec, params, stats


_DIMNUMS = {
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}

# compute dtype policy lives in rag_tpu.ops.precision (bf16 at rest, f32
# compute); activations keep their incoming dtype through every op here.


def _conv(x, w, spec: ConvBRSpec):
    pad = [(spec.padding, spec.padding)] * spec.ndim
    # preferred_element_type must equal the operand dtype for non-f32:
    # an f32-accumulated output makes the conv TRANSPOSE mix a f32
    # cotangent with bf16 operands (lax.conv requires equal dtypes). The
    # MXU accumulates bf16 contractions in f32 internally and rounds once
    # at the output either way.
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(spec.stride,) * spec.ndim,
        padding=pad,
        dimension_numbers=_DIMNUMS[spec.ndim],
        preferred_element_type=pet,
    )
    return y.astype(x.dtype)


def batch_norm(x, params, stats, train: bool, momentum: float = BN_MOMENTUM,
               halves: int = 1):
    """Channels-last batch norm with torch BatchNorm semantics.

    Train mode: normalize by (biased) batch stats; update running stats with
    the unbiased batch variance. Eval mode: normalize by running stats.

    halves > 1 (train mode only): the leading batch axis is ``halves``
    independent passes stacked together (left/right feature extraction run
    as ONE batch). Each half normalizes by ITS OWN batch statistics and the
    running stats take ``halves`` sequential EMA updates in stacking order —
    exactly the reference's two sequential BN passes (rag_model.py:372-373),
    computed from a single stacked conv.

    Stats and normalization math run in f32 regardless of the activation
    dtype (bf16 batch statistics drift); the output keeps x's dtype.

    Inside a data-parallel shard_map (rag_tpu.parallel.axis.bn_collective
    active at trace time) the batch statistics are pmean'd across the
    shards, so training with a sharded global batch reproduces the
    single-device batch statistics exactly.
    """
    from rag_tpu.parallel.axis import bn_axis

    ax = bn_axis() if train else None
    nsh = 1 if ax is None else jax.lax.psum(1, ax)
    xf = x.astype(jnp.float32)
    if train and halves > 1:
        c = x.shape[-1]
        xh = xf.reshape((halves, x.shape[0] // halves) + x.shape[1:])
        axes_h = tuple(range(1, xh.ndim - 1))
        mean_h = jnp.mean(xh, axis=axes_h)                       # (halves, C)
        msq_h = jnp.mean(jnp.square(xh), axis=axes_h)
        if ax is not None:
            mean_h = jax.lax.pmean(mean_h, ax)
            msq_h = jax.lax.pmean(msq_h, ax)
        var_h = msq_h - jnp.square(mean_h)
        n = (x.size // (halves * c)) * nsh
        unbiased_h = var_h * (n / max(n - 1, 1))
        m, v = stats["mean"], stats["var"]
        for i in range(halves):  # the reference's sequential EMA order
            m = (1 - momentum) * m + momentum * mean_h[i]
            v = (1 - momentum) * v + momentum * unbiased_h[i]
        new_stats = {"mean": m, "var": v}
        bshape = (halves,) + (1,) * (xh.ndim - 2) + (c,)
        inv = jax.lax.rsqrt(var_h + BN_EPS).reshape(bshape)
        y = ((xh - mean_h.reshape(bshape)) * (inv * params["scale"])
             + params["bias"])
        return y.reshape(x.shape).astype(x.dtype), new_stats
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(xf, axis=axes)
        msq = jnp.mean(jnp.square(xf), axis=axes)
        if ax is not None:
            mean = jax.lax.pmean(mean, ax)
            msq = jax.lax.pmean(msq, ax)
        var = msq - jnp.square(mean)
        n = (x.size // x.shape[-1]) * nsh
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (xf - mean) * (inv * params["scale"]) + params["bias"]
    return y.astype(x.dtype), new_stats


def apply_convbr(spec: ConvBRSpec, params, stats, x, train: bool,
                 halves: int = 1):
    """Apply conv -> BN -> ReLU (channels-last). Returns (y, new_stats).

    NOTE: the Pallas conv3d kernel is NOT routed here — wrapping it with
    per-call layout transposes measured 5x slower than plain XLA. The
    kernel runs through the channel-first path (rag_tpu.ops.convbr_cf /
    run_matching_cf) where the whole matching net stays in its layout."""
    y = _conv(x, params["w"], spec)
    if spec.bn:
        y, stats = batch_norm(y, params, stats, train, halves=halves)
    if spec.relu:
        y = jax.nn.relu(y)
    return y, stats
