"""Pallas TPU kernel: shear-collapsed cost-volume + matching-stem conv.

The round-2 jnp prototype (rag_tpu.ops.fused_stem) proved the composition
conv3d(cost_volume(x, y)) COLLAPSES: the volume is a shear of the right
feature map, so the stem conv is eighteen (3,1)-kernel convs on the
FEATURE maps plus per-disparity diagonal masks — ~30x fewer FLOPs than
convolving the volume, and the volume never exists. The prototype lost to
the materialized path because its five volume-sized ``jnp.take`` gathers
out-cost the saved FLOPs (BASELINE.md round-2 negative-result row).

This kernel replaces the gathers with in-VMEM lane rolls. Outside the
kernel, XLA computes the eighteen per-tap maps (tiny (3,1) convs on the
12-channel features):

    px[dd, dw] = conv31(shift_w(X, dw-1), Wx[dd, :, dw])     (B, co, H, W)
    py[dd, dw] = conv31(Y,               Wy[dd, :, dw])      (B, co, H, W)

Inside, for one (b, d) grid step the stem output plane is

    z[d] = sum_t  1[j >= d+dd-dw] * gate(d+dd-1) * px[t]
         + sum_t  1[j >= d+dd-dw] * 1[j <= w-dw] * gate(d+dd-1)
                  * roll(py[t], d+dd-dw)

— nine masked adds per half plus nine lane rolls on (co, H, W) tiles; no
patch copies, no matmul. Exactness needs NO edge fix-ups (unlike the jnp
prototype's grouped form): ``shift_w`` prebakes the x-half's W-edge
zeros, the per-term lane masks are the volume's diagonal/W-pad zeros, and
the D-pad gate drops out-of-range source planes. Derivation cross-checked
against rag_tpu.ops.fused_stem; bit-exactness vs the materialized
composition is pinned in tests/test_shear.py.

The op is LINEAR in (px, py), so the custom VJP is one adjoint kernel
(masked adds + inverse rolls accumulated over d into feature-sized
revisiting blocks); XLA autodiff then carries d(px,py) through the tiny
conv31 builds to dX/dY/dW.

Reference being replaced: the 64-step volume copy loop + first matching
ConvBR (src/models/rag_model.py:375-383).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_tpu.ops.pallas_conv3d import _wk_of

# term order: t = 3 * dd + dw
_T9 = tuple((dd, dw) for dd in range(3) for dw in range(3))


def _conv31(x_cf, k31):
    """(3,1)-kernel conv over H on a (B, C, H, W) map. k31: (3, C, co)."""
    return jax.lax.conv_general_dilated(
        x_cf.astype(jnp.float32), k31[:, None].astype(jnp.float32), (1, 1),
        [(1, 1), (0, 0)], dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)


def _shift_w(x_cf, s):
    """Shift along W by s in {-1, 0, 1} with zero fill (x[..., j + s])."""
    if s == 0:
        return x_cf
    if s > 0:
        return jnp.pad(x_cf[..., s:], ((0, 0),) * 3 + ((0, s),))
    return jnp.pad(x_cf[..., :s], ((0, 0),) * 3 + ((-s, 0),))


def tap_maps(x_cf, y_cf, w3):
    """The eighteen per-tap feature maps, stacked (B, 9, co, H, W) x2."""
    c = x_cf.shape[1]
    assert w3.shape[:3] == (3, 3, 3) and w3.shape[3] == 2 * c, w3.shape
    wx = w3[:, :, :, :c]
    wy = w3[:, :, :, c:]
    sx = {dw: _shift_w(x_cf, dw - 1) for dw in range(3)}
    px = jnp.stack([_conv31(sx[dw], wx[dd, :, dw]) for dd, dw in _T9], 1)
    py = jnp.stack([_conv31(y_cf, wy[dd, :, dw]) for dd, dw in _T9], 1)
    return px, py


def _shear_kernel(px_ref, py_ref, scale_ref, bias_ref, out_ref, *,
                  h: int, w: int, cout: int, num_disp: int, relu: bool):
    d = pl.program_id(1)
    wk = px_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (cout, h, wk), 2)
    acc = jnp.zeros((cout, h, wk), jnp.float32)
    for t, (dd, dw) in enumerate(_T9):
        dv = d + dd - 1
        gate = jnp.logical_and(dv >= 0, dv <= num_disp - 1)
        m1 = lane >= d + dd - dw
        xm = jnp.logical_and(m1, gate)
        acc = acc + jnp.where(xm, px_ref[0, t].astype(jnp.float32), 0.0)
        ym = jnp.logical_and(xm, lane <= w - dw)
        s = jax.lax.rem(d + dd - dw + wk, wk)
        rolled = pltpu.roll(py_ref[0, t].astype(jnp.float32), s, axis=2)
        acc = acc + jnp.where(ym, rolled, 0.0)
    acc = acc * scale_ref[:, 0][:, None, None] \
        + bias_ref[:, 0][:, None, None]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = acc[:, :, :w].astype(out_ref.dtype)


def shear_forward(px, py, scale, bias, num_disp: int, w: int,
                  relu: bool = False, interpret: bool = False):
    """(B, 9, co, H, W) tap maps -> (B, D, co, H, W) stem output."""
    b, nine, cout, h, wreal = px.shape
    assert nine == 9 and wreal == w
    wkl = _wk_of(w)
    pad = lambda f: jnp.pad(f, ((0, 0),) * 4 + ((0, wkl - w),))
    kernel = functools.partial(_shear_kernel, h=h, w=w, cout=cout,
                               num_disp=num_disp, relu=relu)
    stack_spec = pl.BlockSpec(
        (1, 9, cout, h, wkl), lambda bb, dd: (bb, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)  # revisiting: DMA'd once per batch step
    return pl.pallas_call(
        kernel,
        grid=(b, num_disp),
        in_specs=[
            stack_spec, stack_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (co, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, h, w), lambda bb, dd: (bb, dd, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_disp, cout, h, w), px.dtype),
        interpret=interpret,
    )(pad(px), pad(py), scale.reshape(-1, 1), bias.reshape(-1, 1))


def _shear_adj_kernel(dz_ref, dpx_ref, dpy_ref, *, h: int, w: int,
                      cout: int, num_disp: int):
    """Adjoint: dpx/dpy accumulated over the d grid axis (the op is linear
    in the tap maps). Masked adds + inverse rolls; revisiting outputs."""
    d = pl.program_id(1)
    wk = dpx_ref.shape[-1]

    @pl.when(d == 0)
    def _():
        dpx_ref[...] = jnp.zeros_like(dpx_ref)
        dpy_ref[...] = jnp.zeros_like(dpy_ref)

    g = dz_ref[0, 0].astype(jnp.float32)          # (co, h, w)
    if wk != w:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, wk - w)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (cout, h, wk), 2)
    for t, (dd, dw) in enumerate(_T9):
        dv = d + dd - 1
        gate = jnp.logical_and(dv >= 0, dv <= num_disp - 1)
        m1 = lane >= d + dd - dw
        xm = jnp.logical_and(m1, gate)
        dpx_ref[0, t] += jnp.where(xm, g, 0.0)
        ym = jnp.logical_and(xm, lane <= w - dw)
        s = jax.lax.rem(2 * wk - (d + dd - dw), wk)   # inverse roll
        dpy_ref[0, t] += pltpu.roll(jnp.where(ym, g, 0.0), s, axis=2)


def shear_adjoint(dz, num_disp: int, w: int, interpret: bool = False):
    """dz (B, D, co, H, W) -> (dpx, dpy), both (B, 9, co, H, W) f32."""
    b, dnum, cout, h, wreal = dz.shape
    assert dnum == num_disp and wreal == w
    wkl = _wk_of(w)
    kernel = functools.partial(_shear_adj_kernel, h=h, w=w, cout=cout,
                               num_disp=num_disp)
    stack_spec = pl.BlockSpec(
        (1, 9, cout, h, wkl), lambda bb, dd: (bb, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)
    dpx, dpy = pl.pallas_call(
        kernel,
        grid=(b, num_disp),
        in_specs=[pl.BlockSpec(
            (1, 1, cout, h, w), lambda bb, dd: (bb, dd, 0, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=(stack_spec, stack_spec),
        out_shape=(jax.ShapeDtypeStruct((b, 9, cout, h, wkl), jnp.float32),
                   jax.ShapeDtypeStruct((b, 9, cout, h, wkl), jnp.float32)),
        interpret=interpret,
    )(dz)
    return dpx[..., :w], dpy[..., :w]


# -- differentiable entry ---------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _shear_op(px, py, num_disp, w):
    from rag_tpu.ops.pallas_conv3d import _interp_forced

    cout = px.shape[2]
    return shear_forward(px, py,
                         jnp.ones((cout,), jnp.float32),
                         jnp.zeros((cout,), jnp.float32),
                         num_disp, w, relu=False,
                         interpret=_interp_forced())


def _shear_op_fwd(px, py, num_disp, w):
    return _shear_op(px, py, num_disp, w), None


def _shear_op_bwd(num_disp, w, _res, g):
    from rag_tpu.ops.pallas_conv3d import _interp_forced

    dpx, dpy = shear_adjoint(g, num_disp, w, interpret=_interp_forced())
    return dpx, dpy


_shear_op.defvjp(_shear_op_fwd, _shear_op_bwd)


def shear_vmem_ok(b: int, c: int, h: int, w: int, cout: int) -> bool:
    """Working set: two 9-map stacks (revisiting) + dz/out block."""
    wkl = _wk_of(w)
    byts = (2 * 9 * cout * h * wkl        # px + py stacks (f32 in VMEM)
            + 2 * cout * h * wkl          # out block, double-buffered
            + 2 * cout * h * wkl) * 4     # kernel accumulator slack
    return byts <= 12 * 1024 * 1024


def shear_stem_z(x_cf, y_cf, w3, num_disp: int):
    """Differentiable conv3d(cost_volume_cf(x, y, D), w3) via the shear
    collapse; (B, C, H, W) features -> (B, D, co, H, W) pre-BN output.

    The tap maps are built by XLA (autodiff flows through them to
    dX/dY/dW); only the masked shear assembly runs in Pallas.
    """
    from rag_tpu.ops.precision import compute_dtype

    px, py = tap_maps(x_cf, y_cf, w3)
    w = x_cf.shape[-1]
    z = _shear_op(px.astype(compute_dtype()), py.astype(compute_dtype()),
                  num_disp, w)
    return z


def use_shear(x_cf, cout: int) -> bool:
    import os

    from rag_tpu.ops.pallas_conv3d import _on_tpu

    if os.environ.get("RAG_TPU_CVSTEM_SHEAR", "0") != "1":
        return False
    b, c, h, w = x_cf.shape
    return _on_tpu() and shear_vmem_ok(b, c, h, w, cout)
