"""Pallas TPU kernel: channel-first trilinear resize without layout
transposes.

The matmul formulation (rag_tpu.ops.resize) is exact but pays hidden
layout costs on the cf matching volume: each per-axis contraction moves
the resized axis to the minor position and back, so XLA materializes two
full-volume transposes per axis in HBM (profiled: the cell s0/s1 resizes
and the head cascade accounted for several ms/step of pure copies).

This kernel resizes (B, D, C, H, W) along (D, H, W) in ONE pass, all
intermediates in VMEM:

  * D-mix: the interpolation matrix rows have at most K taps (2 for a
    linear resize; up to 3 for the adjoint of a 2x downsample), so the
    kernel reads K source D-slabs per output plane via scalar-prefetched
    index maps and blends them with per-plane weights.
  * H then W: two chained in-VMEM dot_generals, each contracting the
    axis at position 1 and appending the resized axis last —
    (C,H,W)x(H,H') -> (C,W,H'), then (C,W,H')x(W,W') -> (C,H',W').
    The second contraction lands the output in the original layout, so
    no transpose ever materializes.

The adjoint of y = M x is M^T y: the custom VJP runs the SAME kernel
with transposed matrices (reference semantics: align_corners tables of
torch F.interpolate, see rag_tpu.ops.resize._interp_matrix_np).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_tpu.ops.resize import _interp_matrix_np, resize_linear


@functools.lru_cache(maxsize=None)
def _taps_np(n_in: int, n_out: int, align_corners: bool, transposed: bool):
    """(idx (n_out, K) int32, w (n_out, K) f32) tap table of the
    interpolation matrix (or its transpose)."""
    m = _interp_matrix_np(n_in, n_out, align_corners)
    if transposed:
        m = m.T  # (n_in, n_out) -> rows index the ADJOINT's outputs
    rows = []
    k_max = max(int((r != 0).sum()) for r in m) or 1
    for r in m:
        nz = np.nonzero(r)[0]
        idx = list(nz) + [0] * (k_max - len(nz))
        w = list(r[nz]) + [0.0] * (k_max - len(nz))
        rows.append((idx, w))
    idx = np.array([r[0] for r in rows], np.int32)
    w = np.array([r[1] for r in rows], np.float32)
    return idx, w


def _resize_kernel(idx_ref, w_ref, *refs, k: int, c: int, h: int, w: int,
                   h2: int, w2: int):
    del idx_ref  # consumed by the index maps
    slabs = refs[:k]
    mh_ref, mw_ref = refs[k], refs[k + 1]
    out_ref = refs[k + 2]
    d = pl.program_id(1)

    acc = slabs[0][0, 0] * w_ref[d, 0]
    for i in range(1, k):
        acc = acc + slabs[i][0, 0] * w_ref[d, i]          # (C, H, W)
    if h2 != h:
        acc = jax.lax.dot_general(                        # (C, W, H2)
            acc, mh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if w2 != w:
            acc = jax.lax.dot_general(                    # (C, H2, W2)
                acc, mw_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc = jnp.swapaxes(acc, 1, 2)
    elif w2 != w:
        acc = jax.lax.dot_general(                        # (C, H, W2)
            acc, mw_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc


def _resize_cf_pallas(x, d2: int, h2: int, w2: int, align_corners: bool,
                      transposed: bool, interpret: bool):
    b, d, c, h, w = x.shape
    di, dw_ = _taps_np(*((d2, d) if transposed else (d, d2)),
                       align_corners, transposed)
    k = di.shape[1]
    mh = _interp_matrix_np(*((h2, h) if transposed else (h, h2)),
                           align_corners)
    mw = _interp_matrix_np(*((w2, w) if transposed else (w, w2)),
                           align_corners)
    # kernel contracts with (H, H2) / (W, W2): forward matrices are
    # (H2, H) -> pass M^T; transposed (adjoint) matrices are already (H, H2)
    mh = mh if transposed else mh.T
    mw = mw if transposed else mw.T

    kernel = functools.partial(_resize_kernel, k=k, c=c, h=h, w=w,
                               h2=h2, w2=w2)
    slab = lambda i: pl.BlockSpec(
        (1, 1, c, h, w),
        functools.partial(
            lambda bb, dd, idx, wref, i_: (bb, idx[dd, i_], 0, 0, 0),
            i_=i),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # tap indices + tap weights (SMEM)
        grid=(b, d2),
        in_specs=[
            *[slab(i) for i in range(k)],
            pl.BlockSpec(memory_space=pltpu.VMEM),    # mh (H, H2)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # mw (W, W2)
        ],
        out_specs=pl.BlockSpec((1, 1, c, h2, w2),
                               lambda bb, dd, idx, wref: (bb, dd, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d2, c, h2, w2), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(di), jnp.asarray(dw_), *([x] * k), jnp.asarray(mh),
      jnp.asarray(mw))


def _xla_resize_cf(x, d2, h2, w2, align_corners):
    return resize_linear(x, (d2, h2, w2), (1, 3, 4), align_corners)


def _use_kernel(x) -> bool:
    # Default OFF — negative result on v5e: the in-kernel dot_generals
    # contract a NON-MINOR axis, so Mosaic inserts internal vector
    # relayouts that cost more than the XLA matmul chain's fused HBM
    # transposes (measured 1.03 vs 0.44 ms for a down+up pair at
    # (4,64,12,64,128); full train step 55.9 vs 56.2 pairs/s). Kept as
    # the exactness-tested foundation (tap tables + layout-preserving
    # contraction order) for a revisit with explicit in-kernel tiling.
    import os

    from rag_tpu.ops.pallas_conv3d import _on_tpu

    if os.environ.get("RAG_TPU_RESIZE_KERNEL", "0") != "1":
        return False
    if x.dtype != jnp.float32:  # kernel is f32-only; bf16 rides XLA
        return False
    b, d, c, h, w = x.shape
    slab_bytes = 4 * c * h * w
    return _on_tpu() and slab_bytes * 4 <= 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def resize_cf(x, d2: int, h2: int, w2: int, align_corners: bool = True):
    """Trilinear resize of a cf volume (B, D, C, H, W) -> (B, d2, C, h2, w2).

    Matches rag_tpu.ops.resize.resize_linear(x, (d2,h2,w2), (1,3,4)) to
    float tolerance; Pallas on TPU (no HBM transposes), XLA elsewhere."""
    from rag_tpu.ops.pallas_conv3d import _interp_forced

    if _use_kernel(x):
        return _resize_cf_pallas(x, d2, h2, w2, align_corners, False,
                                 _interp_forced())
    return _xla_resize_cf(x, d2, h2, w2, align_corners)


def _resize_fwd(x, d2, h2, w2, align_corners):
    return resize_cf(x, d2, h2, w2, align_corners), x.shape


def _resize_bwd(d2, h2, w2, align_corners, in_shape, g):
    from rag_tpu.ops.pallas_conv3d import _interp_forced

    b, d, c, h, w = in_shape
    if _use_kernel(g):
        return (_resize_cf_pallas(g, d, h, w, align_corners, True,
                                  _interp_forced()),)
    # adjoint via transposed matmuls in XLA
    from rag_tpu.ops.resize import interp_matrix

    out = g
    for axis, (n_in, n_out) in zip((1, 3, 4), ((d, d2), (h, h2), (w, w2))):
        if n_in == n_out:
            continue
        m = interp_matrix(n_in, n_out, align_corners)  # (n_out, n_in)
        out = jnp.moveaxis(out, axis, -1)
        out = jnp.matmul(out, m.astype(g.dtype),
                         preferred_element_type=jnp.float32)
        out = jnp.moveaxis(out, -1, axis).astype(g.dtype)
    return (out,)


resize_cf.defvjp(_resize_fwd, _resize_bwd)
