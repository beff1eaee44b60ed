"""Pallas TPU kernel: cost volume fused into the matching stem conv.

SURVEY.md hard-part #1. The reference materializes the concat cost volume
with a 64-step copy loop (src/models/rag_model.py:375-383) and feeds it to
the first matching ConvBR. The volume is the biggest tensor in the model
— (B, D, 2C, h, w) — and building it costs a full HBM round trip plus,
under autodiff, a scatter-shaped adjoint.

This kernel never materializes it. The volume's structure is pure shear:

    v[d, :C,  h, j] = X[h, j]      masked j >= d
    v[d, C:,  h, j] = Y[h, j - d]  masked j >= d

so for one (b, d) grid step the three D-slabs the 3x3x3 conv needs are
built IN VMEM from the two (C, H, W) feature maps: X stays put, Y is a
dynamic lane roll by d+dd-1 (``pltpu.roll``), and the left-of-diagonal /
W-edge zeros are lane-iota masks. The feature maps ride a Pallas
revisiting block (index map ignores d), so per batch they are DMA'd ONCE
and reused across all D grid steps: input HBM traffic drops from 3x the
volume (~300 MB at train geometry) to 2 feature maps (~5 MB), and the
jnp cost-volume build (gather + concat) disappears from the graph.

Everything downstream matches rag_tpu.ops.pallas_conv3d's roll-free
scheme: 9 (dd, dh) patch groups, one stacked 3-dw matmul, output lane
shifts, fused BN affine + ReLU.

The backward reuses this structure: dw re-builds the same patches from
the feature maps (never the volume); dX/dY accumulate the weight-
transposed dz across d in feature-sized VMEM revisiting blocks with the
inverse rolls — the volume's adjoint also never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_tpu.ops.pallas_conv3d import (
    HC,
    _cpad_of,
    _shift_w,
    _win,
    _wk_of,
)


def _pad_dz(dz_cf):
    """D/H halo pad for the backward kernels (same geometry as the
    forward's feature pad along H)."""
    h = dz_cf.shape[3]
    hc = HC if h % HC == 0 and h > HC else h
    h_pad = (h - hc) + _win(hc)
    return jnp.pad(dz_cf,
                   ((0, 0), (1, 1), (0, 0), (1, h_pad - h - 1), (0, 0)))


def _masked_slabs(x_win, y_win, d, dd, w, num_disp):
    """The (dd in 0..2) cost-volume D-slab pieces for output plane d,
    built from feature windows (C, hc_win, wk). Returns (x_part, y_part),
    both zero-masked exactly as the materialized volume would be."""
    dv = d + dd - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, x_win.shape, x_win.ndim - 1)
    valid_d = jnp.logical_and(dv >= 0, dv <= num_disp - 1)
    # diagonal + W-edge zeros; X's lanes >= w are host-pad zeros already,
    # but Y's roll wrap puts REAL values into lanes >= w — mask both
    mask = jnp.logical_and(lane >= dv, lane < w)
    mask = jnp.logical_and(mask, valid_d)
    x_part = jnp.where(mask, x_win, 0.0)
    y_roll = pltpu.roll(y_win, jnp.maximum(dv, 0), axis=y_win.ndim - 1)
    y_part = jnp.where(mask, y_roll, 0.0)
    return x_part, y_part


def _cvstem_kernel(x_ref, y_ref, wk_ref, scale_ref, bias_ref, out_ref,
                   patches, *, h: int, w: int, c: int, cout: int,
                   num_disp: int, relu: bool):
    d = pl.program_id(1)
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)
    c2 = 2 * c
    cpad = _cpad_of(cout)

    def chunk_body(ch, _):
        h0 = pl.multiple_of(ch * hc, 8)
        # aligned window load + register cast to f32 (bf16-at-rest policy)
        xw = x_ref[0, :, pl.ds(h0, win), :].astype(jnp.float32)
        yw = y_ref[0, :, pl.ds(h0, win), :].astype(jnp.float32)
        t = 0
        for dd in range(3):
            xp_, yp_ = _masked_slabs(xw, yw, d, dd, w, num_disp)
            for dh in range(3):
                xr = xp_[:, dh:dh + hc, :]           # (c, hc, wk)
                yr = yp_[:, dh:dh + hc, :]
                patches[t * c2:t * c2 + c, :] = xr.reshape(c, hc * wk)
                patches[t * c2 + c:(t + 1) * c2, :] = yr.reshape(c, hc * wk)
                t += 1
        z = jax.lax.dot_general(                     # (3*cpad, hc*wk)
            wk_ref[:], patches[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y3 = None
        for dw in range(3):
            z3 = _shift_w(
                z[dw * cpad:dw * cpad + cpad].reshape(cpad, hc, wk), dw, w)
            y3 = z3 if y3 is None else y3 + z3
        y3 = y3 * scale_ref[:, 0][:, None, None] \
            + bias_ref[:, 0][:, None, None]
        if relu:
            y3 = jnp.maximum(y3, 0.0)
        out_ref[0, 0, :, pl.ds(h0, hc), :] = \
            y3[:cout, :, :w].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // hc, chunk_body, 0)


def cvstem_forward_cf(x_cf, y_cf, wk, scale, bias, num_disp: int,
                      relu: bool = False, interpret: bool = False):
    """Fused cost_volume + stem conv + affine(+ReLU), channel-first.

    x_cf, y_cf: (B, C, H, W) left/right features. wk: packed weights
    (pack_weights of (3,3,3,2C,Cout)). Returns (B, D, Cout, H, W) ==
    conv3d(cost_volume_cf(x, y, D)) * scale + bias.
    """
    b, c, h, w = x_cf.shape
    cout = scale.shape[0]
    cpad = _cpad_of(cout)
    scale = jnp.pad(scale, (0, cpad - cout))
    bias = jnp.pad(bias, (0, cpad - cout))
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    h_pad = (h - hc) + win
    wkl = _wk_of(w)

    pad_feat = lambda f: jnp.pad(
        f, ((0, 0), (0, 0), (1, h_pad - h - 1), (0, wkl - w)))
    xp = pad_feat(x_cf)
    yp = pad_feat(y_cf)

    kernel = functools.partial(_cvstem_kernel, h=h, w=w, c=c, cout=cout,
                               num_disp=num_disp, relu=relu)
    feat_spec = pl.BlockSpec(
        (1, c, h_pad, wkl), lambda bb, dd: (bb, 0, 0, 0),
        memory_space=pltpu.VMEM)  # revisiting: DMA'd once per batch step
    return pl.pallas_call(
        kernel,
        grid=(b, num_disp),
        in_specs=[
            feat_spec, feat_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (cpad, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, h, w), lambda bb, dd: (bb, dd, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_disp, cout, h, w),
                                       x_cf.dtype),
        scratch_shapes=[
            pltpu.VMEM((9 * 2 * c, hc * wkl), jnp.float32),
        ],
        interpret=interpret,
    )(xp, yp, wk, scale.reshape(-1, 1), bias.reshape(-1, 1))


def cvstem_vmem_ok(b: int, c: int, h: int, w: int, cout: int) -> bool:
    """Whether the fused kernel's working set fits the VMEM budget."""
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    h_pad = (h - hc) + win
    wkl = _wk_of(w)
    byts = (2 * 2 * c * h_pad * wkl          # x + y blocks, double-buffered
            + 9 * 2 * c * hc * wkl           # patches
            + 2 * cout * h * w) * 4          # output block, double-buffered
    return byts <= 12 * 1024 * 1024 and h % 8 == 0


# -- v3: H-tiled grid for large (eval) geometries ---------------------------

_HB3 = 8  # H-tile rows per grid step (v3)


def _cvstem_kernel_v3(x_hbm, y_hbm, wk_ref, scale_ref, bias_ref, out_ref,
                      xwin, ywin, patches, sems, *, hb: int, w: int, c: int,
                      cout: int, num_disp: int, relu: bool):
    b = pl.program_id(0)
    ih = pl.program_id(1)
    d = pl.program_id(2)  # fastest: the feature windows DMA'd at d == 0
    #                       persist in scratch across all D for this tile
    wk = _wk_of(w)
    win = hb + 8
    c2 = 2 * c
    cpad = _cpad_of(cout)

    @pl.when(d == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(ih * hb, win), :], xwin, sems.at[0]).start()
        pltpu.make_async_copy(
            y_hbm.at[b, :, pl.ds(ih * hb, win), :], ywin, sems.at[1]).start()
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(ih * hb, win), :], xwin, sems.at[0]).wait()
        pltpu.make_async_copy(
            y_hbm.at[b, :, pl.ds(ih * hb, win), :], ywin, sems.at[1]).wait()

    xw = xwin[...].astype(jnp.float32)
    yw = ywin[...].astype(jnp.float32)
    t = 0
    for dd in range(3):
        xp_, yp_ = _masked_slabs(xw, yw, d, dd, w, num_disp)
        for dh in range(3):
            patches[t * c2:t * c2 + c, :] = \
                xp_[:, dh:dh + hb, :].reshape(c, hb * wk)
            patches[t * c2 + c:(t + 1) * c2, :] = \
                yp_[:, dh:dh + hb, :].reshape(c, hb * wk)
            t += 1
    z = jax.lax.dot_general(                     # (3*cpad, hb*wk)
        wk_ref[:], patches[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y3 = None
    for dw in range(3):
        z3 = _shift_w(
            z[dw * cpad:dw * cpad + cpad].reshape(cpad, hb, wk), dw, w)
        y3 = z3 if y3 is None else y3 + z3
    y3 = y3 * scale_ref[:, 0][:, None, None] + bias_ref[:, 0][:, None, None]
    if relu:
        y3 = jnp.maximum(y3, 0.0)
    out_ref[0, 0] = y3[:cout, :, :w].astype(out_ref.dtype)


def cvstem_forward_cf_v3(x_cf, y_cf, wk, scale, bias, num_disp: int,
                         relu: bool = False, interpret: bool = False):
    """H-tiled variant of cvstem_forward_cf for geometries whose full-H
    feature blocks exceed VMEM (the 480x960 eval pad). Features stay in
    HBM; each (b, h-tile) DMAs its haloed row window ONCE into persistent
    scratch and revisits it across all D grid steps, so total input
    traffic stays ~2 feature maps (vs materializing the volume + 3x-reading
    it in the conv)."""
    b, c, h, w = x_cf.shape
    cout = scale.shape[0]
    cpad = _cpad_of(cout)
    scale = jnp.pad(scale, (0, cpad - cout))
    bias = jnp.pad(bias, (0, cpad - cout))
    hb = _HB3
    assert h % hb == 0, (h, hb)
    wkl = _wk_of(w)
    h_pad3 = h + 16  # 1 top halo + bottom halo + window slack
    pad_feat = lambda f: jnp.pad(
        f, ((0, 0), (0, 0), (1, h_pad3 - h - 1), (0, wkl - w)))

    kernel = functools.partial(_cvstem_kernel_v3, hb=hb, w=w, c=c, cout=cout,
                               num_disp=num_disp, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(b, h // hb, num_disp),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # y (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # scale (cpad, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, hb, w), lambda bb, ih, dd: (bb, dd, 0, ih, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_disp, cout, h, w),
                                       x_cf.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, hb + 8, wkl), x_cf.dtype),
            pltpu.VMEM((c, hb + 8, wkl), x_cf.dtype),
            pltpu.VMEM((9 * 2 * c, hb * wkl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pad_feat(x_cf), pad_feat(y_cf), wk,
      scale.reshape(-1, 1), bias.reshape(-1, 1))


def cvstem_v3_ok(b: int, c: int, h: int, w: int, cout: int) -> bool:
    """Whether the H-tiled (v3) fused kernel fits + applies."""
    hb = _HB3
    wkl = _wk_of(w)
    byts = (2 * c * (hb + 8) * wkl           # x + y persistent windows
            + 9 * 2 * c * hb * wkl           # patches
            + 3 * _cpad_of(cout) * hb * wkl  # z
            + 2 * cout * hb * w) * 4         # output block, double-buffered
    return h % hb == 0 and byts <= 12 * 1024 * 1024


# -- backward: dX / dY ------------------------------------------------------


def _cvstem_dxy_kernel(dz0_ref, dz1_ref, dz2_ref, wf_ref, dx_ref, dy_ref,
                       patches, *, h: int, w: int, c: int, cout: int,
                       num_disp: int):
    """dX, dY accumulated over the d grid axis.

    Per (b, d): dv-slab = conv3d(dz, flipped weights) at plane d (the
    standard dx kernel body), then the adjoint of the in-VMEM volume
    build: dX += mask * dv_x, dY += roll(mask * dv_y, -d). The outputs
    are feature-sized revisiting blocks — the volume's adjoint never
    touches HBM."""
    d = pl.program_id(1)
    slabs = (dz0_ref, dz1_ref, dz2_ref)
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)
    c2 = 2 * c
    cpad = _cpad_of(c2)

    @pl.when(d == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)
        dy_ref[...] = jnp.zeros_like(dy_ref)

    def chunk_body(ch, _):
        h0 = pl.multiple_of(ch * hc, 8)
        bases = [slabs[dd][0, 0, :, pl.ds(h0, win), :].astype(jnp.float32)
                 for dd in range(3)]
        if wk != w:
            bases = [jnp.pad(b_, ((0, 0), (0, 0), (0, wk - w)))
                     for b_ in bases]
        t = 0
        for dd in range(3):
            for dh in range(3):
                rows = bases[dd][:, dh:dh + hc, :]     # (cout, hc, wk)
                patches[t * cout:(t + 1) * cout, :] = \
                    rows.reshape(cout, hc * wk)
                t += 1
        z = jax.lax.dot_general(                       # (3*cpad, hc*wk)
            wf_ref[:], patches[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        g = None
        for dw in range(3):
            z3 = _shift_w(
                z[dw * cpad:dw * cpad + cpad].reshape(cpad, hc, wk), dw, w)
            g = z3 if g is None else g + z3
        # g[:c2] = dv-slab for volume plane d; apply the forward's masks
        lane = jax.lax.broadcasted_iota(jnp.int32, (c, hc, wk), 2)
        mask = jnp.logical_and(lane >= d, lane < w)
        gx = jnp.where(mask, g[:c], 0.0)
        gy = jnp.where(mask, g[c:c2], 0.0)
        gy = pltpu.roll(gy, jax.lax.rem(wk - d, wk), axis=2)  # undo shear
        dx_ref[0, :, pl.ds(h0, hc), :] += gx[:, :, :w]
        dy_ref[0, :, pl.ds(h0, hc), :] += gy[:, :, :w]
        return 0

    jax.lax.fori_loop(0, h // hc, chunk_body, 0)


def cvstem_dxy_pallas(dz_cf, w3, num_disp: int, interpret: bool = False,
                      zp=None):
    """Adjoints (dX, dY) of cvstem wrt the two feature maps.

    dz_cf: (B, D, Cout, H, W) cotangent of the pre-affine stem output.
    w3: (3, 3, 3, 2C, Cout). Returns two (B, C, H, W) arrays.
    zp: optionally the already-padded dz (shared with the dw kernel so
    the pad pass over the volume-sized cotangent is paid once)."""
    from rag_tpu.ops.pallas_conv3d import pack_weights

    b, dnum, cout, h, w = dz_cf.shape
    assert dnum == num_disp
    c2 = w3.shape[3]
    c = c2 // 2
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    h_pad = (h - hc) + win
    wf = jnp.transpose(w3[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    if zp is None:
        zp = _pad_dz(dz_cf)

    kernel = functools.partial(_cvstem_dxy_kernel, h=h, w=w, c=c,
                               cout=cout, num_disp=num_disp)
    mk_slab = lambda off: pl.BlockSpec(
        (1, 1, cout, h_pad, w),
        functools.partial(lambda bb, dd, o: (bb, dd + o, 0, 0, 0), o=off),
        memory_space=pltpu.VMEM)
    feat_out = pl.BlockSpec((1, c, h, w), lambda bb, dd: (bb, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, num_disp),
        in_specs=[
            mk_slab(0), mk_slab(1), mk_slab(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # flipped weights
        ],
        out_specs=(feat_out, feat_out),
        out_shape=(jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, c, h, w), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((9 * cout, hc * _wk_of(w)), jnp.float32),
        ],
        interpret=interpret,
    )(zp, zp, zp, pack_weights(wf))


# -- backward: dW -----------------------------------------------------------


def _cvstem_dw_kernel(x_ref, y_ref, dz_ref, out_ref, patches, *, h: int,
                      w: int, c: int, cout: int, num_disp: int,
                      dz_padded: bool):
    """dw accumulated across (B, D): the conv3d_dw scheme with the
    patches built in VMEM from the feature maps (cvstem's volume)."""
    b = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)
    c2 = 2 * c

    def chunk_body(ch, _):
        h0 = pl.multiple_of(ch * hc, 8)
        xw = x_ref[0, :, pl.ds(h0, win), :].astype(jnp.float32)
        yw = y_ref[0, :, pl.ds(h0, win), :].astype(jnp.float32)
        t = 0
        for dd in range(3):
            xp_, yp_ = _masked_slabs(xw, yw, d, dd, w, num_disp)
            for dh in range(3):
                patches[t * c2:t * c2 + c, :] = \
                    xp_[:, dh:dh + hc, :].reshape(c, hc * wk)
                patches[t * c2 + c:(t + 1) * c2, :] = \
                    yp_[:, dh:dh + hc, :].reshape(c, hc * wk)
                t += 1
        if dz_padded:
            # pad the aligned window BEFORE the offset-1 row slice (Mosaic
            # cannot lane-concat a value carrying a sublane offset)
            dzw = dz_ref[0, 0, :, pl.ds(h0, win), :].astype(jnp.float32)
            if wk != w:
                dzw = jnp.pad(dzw, ((0, 0), (0, 0), (0, wk - w)))
            dzc = dzw[:, 1:1 + hc, :]
        else:
            dzc = dz_ref[0, 0, :, pl.ds(h0, hc), :].astype(jnp.float32)
            if wk != w:
                dzc = jnp.pad(dzc, ((0, 0), (0, 0), (0, wk - w)))
        dzs = jnp.concatenate(
            [_shift_w(dzc, 2 - dw_, w).reshape(cout, hc * wk)
             for dw_ in range(3)], axis=0)
        out_ref[...] += jax.lax.dot_general(
            patches[:], dzs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, h // hc, chunk_body, 0)


def cvstem_dw_pallas(x_cf, y_cf, dz_cf, num_disp: int,
                     interpret: bool = False, zp=None):
    """Weight gradient of cvstem. Returns (3,3,3,2C,Cout).

    zp: optionally the padded dz shared with cvstem_dxy_pallas; when
    given, dz_cf supplies only the shape."""
    b, c, h, w = x_cf.shape
    cout = dz_cf.shape[2]
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    h_pad = (h - hc) + win
    wkl = _wk_of(w)
    pad_feat = lambda f: jnp.pad(
        f, ((0, 0), (0, 0), (1, h_pad - h - 1), (0, wkl - w)))

    kernel = functools.partial(_cvstem_dw_kernel, h=h, w=w, c=c, cout=cout,
                               num_disp=num_disp, dz_padded=zp is not None)
    feat_spec = pl.BlockSpec(
        (1, c, h_pad, wkl), lambda bb, dd: (bb, 0, 0, 0),
        memory_space=pltpu.VMEM)
    dw = pl.pallas_call(
        kernel,
        grid=(b, num_disp),
        in_specs=[
            feat_spec, feat_spec,
            pl.BlockSpec((1, 1, cout, h_pad, w),
                         lambda bb, dd: (bb, dd + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            if zp is not None else
            pl.BlockSpec((1, 1, cout, h, w), lambda bb, dd: (bb, dd, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * 2 * c, 3 * cout), lambda bb, dd: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * 2 * c, 3 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9 * 2 * c, hc * wkl), jnp.float32),
        ],
        interpret=interpret,
    )(pad_feat(x_cf), pad_feat(y_cf), dz_cf if zp is None else zp)
    return dw.reshape(3, 3, 2 * c, 3, cout).transpose(0, 1, 3, 2, 4)


# -- differentiable entry ---------------------------------------------------


def _xla_cvstem(x_cf, y_cf, w3, num_disp: int):
    """Reference composition (materialized volume), channel-first in/out."""
    from rag_tpu.ops.cost_volume import cost_volume_cf
    from rag_tpu.ops.pallas_conv3d import _xla_conv3d_cf

    x = jnp.transpose(x_cf, (0, 2, 3, 1))
    y = jnp.transpose(y_cf, (0, 2, 3, 1))
    return _xla_conv3d_cf(cost_volume_cf(x, y, num_disp), w3)


def _use_kernel(x_cf, cout: int) -> bool:
    import os

    from rag_tpu.ops.pallas_conv3d import _on_tpu

    if os.environ.get("RAG_TPU_CVSTEM", "1") != "1":
        return False
    b, c, h, w = x_cf.shape
    return (_on_tpu() and cvstem_vmem_ok(b, c, h, w, cout))


def _use_kernel_v3(x_cf, cout: int) -> bool:
    """The H-tiled forward engages where the full-H (v2) kernel can't fit
    (eval geometry). The backward kernels keep the v2-only gate — at these
    geometries gradients fall back to the XLA vjp (nothing trains at the
    eval pad; the guard is for completeness)."""
    import os

    from rag_tpu.ops.pallas_conv3d import _on_tpu

    if os.environ.get("RAG_TPU_CVSTEM", "1") != "1":
        return False
    b, c, h, w = x_cf.shape
    return (_on_tpu() and not cvstem_vmem_ok(b, c, h, w, cout)
            and cvstem_v3_ok(b, c, h, w, cout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cvstem_conv(x_cf, y_cf, w3, num_disp):
    """conv3d(cost_volume(x, y, D), w3) without materializing the volume.

    x_cf/y_cf: (B, C, H, W); w3: (3,3,3,2C,Cout). Returns the pre-affine
    (B, D, Cout, H, W) stem output (BN/ReLU run outside, as in the
    unfused training path). Pallas on TPU, XLA composition elsewhere."""
    from rag_tpu.ops.pallas_conv3d import pack_weights

    cout = w3.shape[-1]
    if _use_kernel(x_cf, cout) or _use_kernel_v3(x_cf, cout):
        from rag_tpu.ops.pallas_conv3d import _interp_forced

        fwd = (cvstem_forward_cf if _use_kernel(x_cf, cout)
               else cvstem_forward_cf_v3)
        return fwd(
            x_cf, y_cf, pack_weights(w3),
            jnp.ones((cout,), jnp.float32),
            jnp.zeros((cout,), jnp.float32), num_disp, relu=False,
            interpret=_interp_forced())
    return _xla_cvstem(x_cf, y_cf, w3, num_disp)


def _cvstem_fwd(x_cf, y_cf, w3, num_disp):
    return cvstem_conv(x_cf, y_cf, w3, num_disp), (x_cf, y_cf, w3)


def _cvstem_bwd(num_disp, res, g):
    x_cf, y_cf, w3 = res
    cout = w3.shape[-1]
    if _use_kernel(x_cf, cout):
        from rag_tpu.ops.pallas_conv3d import _interp_forced

        ip = _interp_forced()
        zp = _pad_dz(g)
        dx, dy = cvstem_dxy_pallas(g, w3, num_disp, interpret=ip, zp=zp)
        dw = cvstem_dw_pallas(x_cf, y_cf, g, num_disp, interpret=ip, zp=zp)
        # dX/dY accumulate f32 in the kernel; cotangents take x's dtype
        return dx.astype(x_cf.dtype), dy.astype(y_cf.dtype), dw
    _, vjp = jax.vjp(lambda a, b, c: _xla_cvstem(a, b, c, num_disp),
                     x_cf, y_cf, w3)
    return vjp(g)


cvstem_conv.defvjp(_cvstem_fwd, _cvstem_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def cvstem_brc(x_cf, y_cf, w3, scale, bias, num_disp, relu=True):
    """Frozen-BN fused form: cost volume + stem conv + folded affine +
    ReLU in ONE kernel pass (scale/bias are the running-stat fold).

    Differentiable: the op-search stage trains new-unit weights with all
    BN frozen (src/approaches/rag.py:344-368), so gradients can flow
    through this folded path — the VJP recomputes the pre-affine z with
    one extra kernel pass (paid only when differentiated; eval never
    differentiates)."""
    from rag_tpu.ops.pallas_conv3d import pack_weights

    cout = w3.shape[-1]
    if _use_kernel(x_cf, cout) or _use_kernel_v3(x_cf, cout):
        from rag_tpu.ops.pallas_conv3d import _interp_forced

        fwd = (cvstem_forward_cf if _use_kernel(x_cf, cout)
               else cvstem_forward_cf_v3)
        return fwd(x_cf, y_cf, pack_weights(w3), scale, bias,
                   num_disp, relu=relu, interpret=_interp_forced())
    z = _xla_cvstem(x_cf, y_cf, w3, num_disp).astype(jnp.float32)
    z = z * scale.reshape(1, 1, -1, 1, 1) + bias.reshape(1, 1, -1, 1, 1)
    z = jnp.maximum(z, 0.0) if relu else z
    return z.astype(x_cf.dtype)


def _brc_fwd(x_cf, y_cf, w3, scale, bias, num_disp, relu):
    out = cvstem_brc(x_cf, y_cf, w3, scale, bias, num_disp, relu)
    return out, (x_cf, y_cf, w3, scale, out)


def _brc_bwd(num_disp, relu, res, g):
    x_cf, y_cf, w3, scale, out = res
    sh = (1, 1, -1, 1, 1)
    if relu:
        g = g * (out > 0).astype(g.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 3, 4))
    z = cvstem_conv(x_cf, y_cf, w3, num_disp)
    dscale = jnp.sum(g.astype(jnp.float32) * z.astype(jnp.float32),
                     axis=(0, 1, 3, 4))
    dz = (g.astype(jnp.float32) * scale.reshape(sh)).astype(x_cf.dtype)
    if _use_kernel(x_cf, w3.shape[-1]):
        from rag_tpu.ops.pallas_conv3d import _interp_forced

        ip = _interp_forced()
        zp = _pad_dz(dz)
        dx, dy = cvstem_dxy_pallas(dz, w3, num_disp, interpret=ip, zp=zp)
        dw = cvstem_dw_pallas(x_cf, y_cf, dz, num_disp, interpret=ip, zp=zp)
        dx, dy = dx.astype(x_cf.dtype), dy.astype(y_cf.dtype)
    else:
        _, vjp = jax.vjp(lambda a, b, c: _xla_cvstem(a, b, c, num_disp),
                         x_cf, y_cf, w3)
        dx, dy, dw = vjp(dz)
    return dx, dy, dw, dscale, dbias


cvstem_brc.defvjp(_brc_fwd, _brc_bwd)
