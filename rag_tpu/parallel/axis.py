"""Trace-time collective-axis context for data-parallel steps.

The driver's sharded train/eval steps run the WHOLE per-device program
under ``jax.shard_map`` over the 'data' mesh axis (this is what keeps the
Pallas kernels dispatching per shard — GSPMD treats their custom calls as
unpartitionable and would all-gather around them). Inside shard_map the
program sees only its local batch shard, so every batch-wide statistic
must reduce across the axis explicitly to reproduce single-device
semantics exactly:

  * BatchNorm batch statistics  -> pmean of per-shard mean / mean-square
    (rag_tpu.ops.convbr / convbr_cf consult ``bn_axis()``);
  * masked losses and per-image-weighted metrics -> psum of numerator
    and denominator parts (losses/metrics take an ``axis=`` argument).

``bn_collective`` is a TRACE-TIME context: the step builders wrap the
shard_map body so batch_norm sees the axis while the body is being
traced. JAX tracing is synchronous within the wrapped call, so the
context is reliable; it is never consulted at run time.

The reference is single-GPU (SURVEY.md §2.4) — no counterpart exists;
this is the green-field scaling plane of the north star.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax

_STATE = threading.local()


def bn_axis() -> Optional[str]:
    """The active cross-shard BN axis name (None = single-device)."""
    return getattr(_STATE, "axis", None)


@contextlib.contextmanager
def bn_collective(axis: Optional[str]):
    """Activate cross-shard BN statistics over ``axis`` for code traced
    inside the block (no-op when axis is None)."""
    prev = getattr(_STATE, "axis", None)
    _STATE.axis = axis
    try:
        yield
    finally:
        _STATE.axis = prev


def pmean_if(x, axis: Optional[str]):
    return x if axis is None else jax.lax.pmean(x, axis)


def psum_if(x, axis: Optional[str]):
    return x if axis is None else jax.lax.psum(x, axis)


def data_axis(mesh) -> Optional[str]:
    """The shard_map dp axis name for a step builder: None when no mesh
    (or a trivial one) is given. The shard_map dp path requires the
    'model' axis to be absent/1 — spatial (model-axis) sharding goes
    through the GSPMD path (rag_tpu.parallel.sharded) instead."""
    if mesh is None:
        return None
    from rag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if sizes.get(MODEL_AXIS, 1) != 1:
        raise ValueError(
            "shard_map dp steps require model axis == 1; use "
            "rag_tpu.parallel.sharded for spatial sharding")
    return DATA_AXIS if sizes.get(DATA_AXIS, 1) > 1 else None


def shard_jit(mesh, body, arg_kinds: str):
    """jit(shard_map(body)) over the 'data' axis.

    arg_kinds: one char per positional arg — 'r' replicated pytree,
    's' scalar (lr), 'd' batch-sharded array. Outputs are replicated
    (the bodies psum/pmean every cross-shard statistic).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_tpu.parallel.mesh import DATA_AXIS

    spec = {"r": P(), "s": P(), "d": P(DATA_AXIS)}
    shard = {"r": NamedSharding(mesh, P()), "s": None,
             "d": NamedSharding(mesh, P(DATA_AXIS))}
    f = jax.shard_map(body, mesh=mesh,
                      in_specs=tuple(spec[c] for c in arg_kinds),
                      out_specs=P())
    return jax.jit(f, in_shardings=tuple(shard[c] for c in arg_kinds))
