"""Fused cost-volume + matching-stem conv (the volume never materializes).

The reference materializes the concat cost volume with a 64-step copy loop
(/root/reference/src/models/rag_model.py:375-383) and immediately convolves
it with the first matching-net ConvBR (stem_3d0, 2C -> co). SURVEY.md ranks
fusing these as TPU hard-part #1: the volume is the biggest tensor in the
model, and building it just to feed one conv costs a full HBM round trip.

This module goes further than fusion: the composition COLLAPSES. With
u = j - d, the y-half of the volume, cost_y[d, h, j] = Y[h, j - d], is a
shear of the right feature map, and the x-half is constant along d. A 3x3x3
conv over a shear is a small 2D conv read along diagonals:

    z[d, h, j] = sum_c  1[j - d >= c]           * XG_c[h, j]
               + sum_e  1[j - d >= -e]          * YG_e[h, j - d + e]
               - (edge corrections, see below)

where XG_c = sum_{dd-dw=c} conv2d_h(shift_w(X, dw-1), Wx[dd, :, dw]) and
YG_e = sum_{dw-dd=e} conv2d_h(Y, Wy[dd, :, dw]) are ten (B, co, H, W) maps
built from eighteen (3,1)-kernel convs on the FEATURE maps. The step masks
1[.] implement the volume's zero-fill left of the disparity diagonal
(cost_volume semantics, rag_tpu/ops/cost_volume.py). FLOPs drop ~30x
(27 * 2C * co per output point -> 18 small feature convs) and the
(B, D, 2C, h, w) input volume is never read or written.

Exact-equivalence corrections (all cheap, sub-volume):
  * d = 0 / d = D-1 planes: the dd = 0 / dd = 2 taps read the volume's
    zero D-padding; subtract those pieces on the two boundary planes.
  * j = W-1 column: the dw = 2 taps read the volume's zero W-padding, but
    the sheared YG lookup would read real interior Y values; subtract.
  * j - d <= -3: every tap sits left of the diagonal; all masks fail and
    z is exactly 0, matching conv-of-zeros.

Everything is plain differentiable jnp (convs, takes, wheres): XLA fuses
the masked adds + gathers into the single z-volume write, and autodiff
gives the backward for free — no custom VJP, no Pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv31(x_cf, k31):
    """(3,1)-kernel conv over H on a (B, C, H, W) map. k31: (3, C, co)."""
    return jax.lax.conv_general_dilated(
        x_cf, k31[:, None], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32)


def _shift_w(x_cf, s):
    """Shift along W by s in {-1, 0, 1} with zero fill (x[..., j + s])."""
    if s == 0:
        return x_cf
    if s > 0:
        return jnp.pad(x_cf[..., s:], ((0, 0),) * 3 + ((0, s),))
    return jnp.pad(x_cf[..., :s], ((0, 0),) * 3 + ((-s, 0),))


def cost_stem_z(x_cf, y_cf, w3, num_disp: int):
    """z = conv3d(cost_volume_cf(x, y, D), w3), pre-BN, without the volume.

    x_cf, y_cf: (B, C, H, W) channel-first left/right features.
    w3: (3, 3, 3, 2C, co) stem weights. Returns (B, D, co, H, W).
    """
    b, cc, h, w = x_cf.shape
    d = num_disp
    c = cc
    assert w3.shape[:3] == (3, 3, 3) and w3.shape[3] == 2 * c, w3.shape
    wx = w3[:, :, :, :c]        # (dd, dh, dw, C, co)
    wy = w3[:, :, :, c:]

    # per-(dd, dw) pieces: PX[dd][dw][h, j] sums the X taps of column dw in
    # D-plane offset dd; PY[dd][dw][h, v] is the Y piece in sheared v-space
    # (no W shift: the shear absorbed it)
    sx = [_shift_w(x_cf, dw - 1) for dw in range(3)]
    px = [[_conv31(sx[dw], wx[dd, :, dw]) for dw in range(3)]
          for dd in range(3)]
    py = [[_conv31(y_cf, wy[dd, :, dw]) for dw in range(3)]
          for dd in range(3)]

    j = jnp.arange(w)[None, :]            # (1, W)
    dv = jnp.arange(d)[:, None]           # (D, 1)
    kap = j - dv                          # (D, W): j - d

    # mains: X groups by c = dd - dw (diag mask 1[kap >= c]), Y groups by
    # e = dw - dd (mask 1[kap + e >= 0], gather at v = j - d + e)
    z = jnp.zeros((b, d, px[0][0].shape[1], h, w), jnp.float32)
    for cg in range(-2, 3):
        xg = None
        for dd in range(3):
            dw = dd - cg
            if 0 <= dw < 3:
                xg = px[dd][dw] if xg is None else xg + px[dd][dw]
        m = (kap >= cg)[None, :, None, None, :]
        z = z + jnp.where(m, xg[:, None], 0.0)
    for e in range(-2, 3):
        yg = None
        for dd in range(3):
            dw = dd + e
            if 0 <= dw < 3:
                yg = py[dd][dw] if yg is None else yg + py[dd][dw]
        idx = jnp.clip(kap + e, 0, w - 1)                  # (D, W)
        g = jnp.take(yg, idx, axis=3)                      # (B, co, H, D, W)
        g = jnp.transpose(g, (0, 3, 1, 2, 4))              # (B, D, co, H, W)
        m = (kap + e >= 0)[None, :, None, None, :]
        z = z + jnp.where(m, g, 0.0)

    # W-edge fix: at j = W-1 the dw = 2 taps read the volume's zero pad
    # (j' = W), but the sheared lookup used interior Y values. Subtract the
    # (dd, 2) pieces there — skipping dd taps already removed by the
    # D-plane fixes below.
    jw = w - 1
    fix = 0.0
    for dd in range(3):
        vv = jnp.clip(jw + 2 - 1 - (dv[:, 0] + dd - 1), 0, w - 1)  # (D,)
        valid_d = (dv[:, 0] + dd - 1 >= 0) & (dv[:, 0] + dd - 1 <= d - 1)
        mm = ((jw - dv[:, 0]) + (2 - dd) >= 0) & valid_d
        val = jnp.take(py[dd][2], vv, axis=3)              # (B, co, H, D)
        val = jnp.transpose(val, (0, 3, 1, 2))             # (B, D, co, H)
        fix = fix + jnp.where(mm[None, :, None, None], val, 0.0)
    z = z.at[..., jw].add(-fix)

    # D-plane fixes: the dd = 0 taps at d = 0 (and dd = 2 at d = D-1) read
    # the volume's zero D-padding; subtract those pieces with the same
    # diag masks (and the same clipped gather) the mains applied.
    for dplane, dd in ((0, 0), (d - 1, 2)):
        sub = 0.0
        for dw in range(3):
            mj = (j[0] - dplane + dw - dd >= 0)            # (W,)
            vj = jnp.clip(j[0] + dw - 1 - (dplane + dd - 1), 0, w - 1)
            yv = jnp.take(py[dd][dw], vj, axis=3)          # (B, co, H, W)
            sub = sub + jnp.where(mj[None, None, None, :],
                                  px[dd][dw] + yv, 0.0)
        z = z.at[:, dplane].add(-sub)
    return z
