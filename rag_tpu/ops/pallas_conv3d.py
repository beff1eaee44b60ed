"""Pallas TPU kernel: small-channel 3x3x3 conv3d via in-VMEM im2col.

Why: the matching net's 3D convs have 12-48 channels. XLA's conv strategy
re-reads the input volume per tap (arithmetic intensity ~6 FLOP/byte ->
memory bound), and the MXU's K dim sits nearly idle at C=12.

Design (shaped by Mosaic layout rules found the hard way):
  * CHANNEL-MAJOR layout (B, D, C, H, W): W rides the 128-lane dim exactly
    (channels-minor blocks lane-pad 12 -> 128, a 10x VMEM blowup).
  * one D-slice per grid step; the D-halo comes from passing the padded
    input three times with d, d+1, d+2 blocked index maps — no manual DMA.
  * H-halo by host padding rows; W-halo by in-kernel lane rolls with edge
    masking (SAME zero padding).
  * ROLL-FREE im2col: patches hold only the 9 (dd, dh) row-slice groups
    (9*C, Hc*W) — no per-tap W shifts of input-sized data. The dw taps
    become 3 MXU matmuls (Cout, 9C) x (9C, Hc*W) whose small OUTPUTS are
    lane-shifted and accumulated (round 2: 3x less VMEM patch traffic and
    9x less roll traffic than the 27-tap/single-matmul formulation, which
    was shuffle-bound at ~1% MFU);
  * fused BN affine + ReLU.

Exposed as ``conv3d_brc`` (channels-last API, transposing at the
boundary) with a custom VJP whose backward is the exact XLA transpose
convolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HC = 16  # H rows per in-kernel chunk


def _shift_w(arr, dw, w):
    """x[..., w + dw - 1] with zero fill (SAME padding along W).

    arr: (..., Wk) with Wk >= w on lanes (cols >= w are zero); dw in
    {0,1,2}. When Wk > w the zero pad supplies the boundary zeros and the
    wrap-around lands in pad columns (whose outputs are discarded), so
    only the Wk == w case needs explicit edge masks."""
    if dw == 1:
        return arr
    wk = arr.shape[-1]
    # dw=0 -> shift right by 1; dw=2 -> shift left by 1 (pltpu.roll only
    # accepts non-negative shifts, so left-by-1 is roll by wk-1)
    shift = 1 if dw == 0 else wk - 1
    rolled = pltpu.roll(arr, shift, axis=arr.ndim - 1)
    if wk > w:
        return rolled  # zero pad supplies the edges; wrap lands in pad
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
    if dw == 0:
        return jnp.where(lane >= 1, rolled, 0.0)
    return jnp.where(lane <= w - 2, rolled, 0.0)


def _win(hc: int) -> int:
    """Aligned slab-window rows per chunk (covers the +2 H halo)."""
    return -(-(hc + 2) // 8) * 8


def _wk_of(w: int) -> int:
    """Lane-padded tile width: kernel math runs at the next 128 multiple
    (pad columns are explicit zeros; their outputs are sliced away)."""
    return -(-w // 128) * 128 if w > 8 else w


def _cpad_of(cout: int) -> int:
    """Sublane-aligned rows per dw weight block: slicing the stacked
    matmul result at non-multiple-of-8 offsets forces Mosaic relayouts
    (measured 100x slower), so each block is zero-padded to 8 rows."""
    return -(-cout // 8) * 8


def _conv3d_kernel(s0_ref, s1_ref, s2_ref, wk_ref, scale_ref, bias_ref,
                   out_ref, patches, *, h: int, w: int, cin: int,
                   cout: int, relu: bool):
    slabs = (s0_ref, s1_ref, s2_ref)
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)

    def chunk_body(c, _):
        h0 = pl.multiple_of(c * hc, 8)
        # one aligned (cin, win, w) window load per D-slab; the 9 (dd, dh)
        # groups are roll-free sublane slices of the loaded VALUE. bf16
        # inputs are cast to f32 right here (aligned load + register
        # cast; all in-VMEM shuffles stay in the proven f32 layouts).
        bases = [slabs[dd][0, 0, :, pl.ds(h0, win), :].astype(jnp.float32)
                 for dd in range(3)]
        if wk != w:
            bases = [jnp.pad(b_, ((0, 0), (0, 0), (0, wk - w)))
                     for b_ in bases]
        t = 0
        for dd in range(3):
            for dh in range(3):
                rows = bases[dd][:, dh:dh + hc, :]       # (cin, hc, wk)
                patches[t * cin:(t + 1) * cin, :] = rows.reshape(cin, hc * wk)
                t += 1
        # ONE matmul for all 3 dw taps (M=3*cpad amortizes the MXU
        # pipeline fill that dominates at cout<=48), then aligned slices +
        # lane-shift + accumulate of the small outputs
        cpad = _cpad_of(cout)
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


def _conv3d_kernel_v4(x_hbm, wk_ref, scale_ref, bias_ref, out_ref,
                      slab, patches, sem, *, db: int, h: int, w: int,
                      cin: int, cout: int, relu: bool):
    """D-blocked variant: one manual DMA of a (db+2, cin, h_pad, wk) window
    per grid step serves db output D-slices — input HBM traffic drops from
    3x (the blocked-slab kernel re-fetches every D-slice for d-1, d, d+1)
    to (db+2)/db."""
    b = pl.program_id(0)
    k = pl.program_id(1)
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)
    cpad = _cpad_of(cout)
    nchunks = h // hc

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(k * db, db + 2)], slab, sem)
    copy.start()
    copy.wait()

    def body(idx, _):
        di = idx // nchunks
        c = idx % nchunks
        h0 = pl.multiple_of(c * hc, 8)
        bases = [slab[di + dd, :, pl.ds(h0, win), :].astype(jnp.float32)
                 for dd in range(3)]
        t = 0
        for dd in range(3):
            for dh in range(3):
                rows = bases[dd][:, dh:dh + hc, :]       # (cin, hc, wk)
                patches[t * cin:(t + 1) * cin, :] = rows.reshape(cin, hc * wk)
                t += 1
        z = jax.lax.dot_general(                         # (3*cpad, hc*wk)
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
        out_ref[0, di, :, pl.ds(h0, hc), :] = \
            y3[:cout, :, :w].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, db * nchunks, body, 0)


def _conv3d_kernel_v3(x_hbm, wk_ref, scale_ref, bias_ref, out_ref,
                      slabs, patches, sems, *, hb: int, w: int, cin: int,
                      cout: int, relu: bool):
    """Large-shape variant: H-tiled grid, manual aligned haloed DMAs (one
    per D-offset), roll-free (dd, dh) patch groups + per-dw matmuls with
    output shifts (same scheme as the blocked-slab kernel)."""
    b = pl.program_id(0)
    d = pl.program_id(1)
    ih = pl.program_id(2)
    wk = _wk_of(w)
    win = hb + 8

    # x is host-padded to wk lanes (DMA lane extents must be 128-aligned)
    for dd in range(3):
        pltpu.make_async_copy(
            x_hbm.at[b, d + dd, :, pl.ds(ih * hb, win), :],
            slabs.at[dd], sems.at[dd]).start()
    for dd in range(3):
        pltpu.make_async_copy(
            x_hbm.at[b, d + dd, :, pl.ds(ih * hb, win), :],
            slabs.at[dd], sems.at[dd]).wait()

    t = 0
    for dd in range(3):
        base = slabs[dd][...].astype(jnp.float32)      # (cin, win, wk)
        for dh in range(3):
            rows = base[:, dh:dh + hb, :]              # (cin, hb, wk)
            patches[t * cin:(t + 1) * cin, :] = rows.reshape(cin, hb * wk)
            t += 1
    cpad = _cpad_of(cout)
    z = jax.lax.dot_general(                           # (3*cpad, hb*wk)
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


def _hgeom(h: int):
    """(hc, win, h_pad) for the blocked-slab kernels at height h."""
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    return hc, win, (h - hc) + win


def _pad_v2(x_cf):
    """Host pad for the blocked-slab (v2) kernels: D halo (1,1), one top H
    halo row + window slack, W untouched. Shared between the forward and
    the dx/dw backward so the pad pass is paid ONCE per tensor."""
    h = x_cf.shape[3]
    _, _, h_pad = _hgeom(h)
    return jnp.pad(x_cf, ((0, 0), (1, 1), (0, 0), (1, h_pad - h - 1),
                          (0, 0)))


def _conv3d_v2_pre(xp, d: int, h: int, w: int, wk, scale_p, bias_p,
                   relu: bool, interpret: bool, cout: int):
    """v2 blocked-slab pallas_call on a PREPADDED input (see _pad_v2).

    xp: (B, d+2, Cin, h_pad, w); wk: packed weights (3*cpad, 9*Cin);
    scale_p/bias_p: (cpad,) affine already zero-padded to the 8-aligned
    block size. Returns (B, d, Cout, h, w)."""
    bsz, _, cin, h_pad, _ = xp.shape
    hc, _, _ = _hgeom(h)
    wkl = _wk_of(w)
    kernel = functools.partial(_conv3d_kernel, h=h, w=w, cin=cin,
                               cout=cout, relu=relu)
    mk_slab = lambda off: pl.BlockSpec(
        (1, 1, cin, h_pad, w),
        functools.partial(lambda b, dd, o: (b, dd + o, 0, 0, 0), o=off),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz, d),
        in_specs=[
            mk_slab(0), mk_slab(1), mk_slab(2),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (3cpad, 9C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale (cpad, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias  (cpad, 1)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, h, w), lambda b, dd: (b, dd, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, cout, h, w), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((9 * cin, hc * wkl), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, xp, wk, scale_p.reshape(-1, 1), bias_p.reshape(-1, 1))


def _conv3d_pallas_cf(x_cf, wk, scale, bias, relu: bool, interpret: bool):
    """Channel-first core. x_cf: (B, D, C, H, W); wk: (Cout, 27*Cin)
    tap-major; returns (B, D, Cout, H, W)."""
    bsz, d, cin, h, w = x_cf.shape
    cout = scale.shape[0]
    cpad = _cpad_of(cout)
    scale = jnp.pad(scale, (0, cpad - cout))
    bias = jnp.pad(bias, (0, cpad - cout))
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    h_pad = (h - hc) + win  # >= h + 2
    wkl = _wk_of(w)

    # VMEM estimate for the blocked-slab (v2) variant: 3 slabs x double
    # buffering + patches; fall over to the H-tiled manual-DMA (v3)
    # variant when it exceeds the budget (large shapes, e.g. eval)
    import os

    # v4 (D-blocked, manual DMA): one (db+2)-deep window per grid step
    # serves db output D-slices — input traffic (db+2)/db instead of 3x.
    # Default OFF: measured 23.2 vs 22.4 ms full fwd at the train geometry
    # (v5e) — the extra VMEM slab shrinks the H chunking win, and at eval
    # geometry the slab exceeds the VMEM budget so v4 never engages.
    force_v3 = os.environ.get("RAG_TPU_CONV3D_V3") == "1"
    if (os.environ.get("RAG_TPU_CONV3D_V4", "0") == "1" and h % 8 == 0
            and not force_v3):
        for db in (8, 4, 2):
            v4_bytes = ((db + 2) * cin * h_pad * wkl
                        + 9 * cin * hc * wkl
                        + 2 * db * cout * h * w) * 4
            if d % db == 0 and v4_bytes <= 12 * 1024 * 1024:
                xp = jnp.pad(
                    x_cf, ((0, 0), (1, 1), (0, 0), (1, h_pad - h - 1),
                           (0, wkl - w)))
                kernel = functools.partial(_conv3d_kernel_v4, db=db, h=h,
                                           w=w, cin=cin, cout=cout,
                                           relu=relu)
                return pl.pallas_call(
                    kernel,
                    grid=(bsz, d // db),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.HBM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, db, cout, h, w), lambda b, k: (b, k, 0, 0, 0),
                        memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((bsz, d, cout, h, w),
                                                   x_cf.dtype),
                    scratch_shapes=[
                        pltpu.VMEM((db + 2, cin, h_pad, wkl), x_cf.dtype),
                        pltpu.VMEM((9 * cin, hc * wkl), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                    ],
                    interpret=interpret,
                )(xp, wk, scale.reshape(-1, 1), bias.reshape(-1, 1))

    v2_bytes = (3 * 2 * cin * (h_pad + 2) * w + 9 * cin * hc * wkl
                + 2 * cout * h * w) * 4
    if v2_bytes <= 12 * 1024 * 1024 and h % 8 == 0 and not force_v3:
        xp = _pad_v2(x_cf)
        return _conv3d_v2_pre(xp, d, h, w, wk, scale, bias, relu, interpret,
                              cout)

    # v3: grid over (B, D, H-tiles); row windows [ih*hb, ih*hb + hb + 8)
    # of the host-padded rows must stay in bounds; W host-padded to the
    # lane tile (DMA lane extents must be 128-aligned)
    hb = 8
    assert h % hb == 0, (h, hb)
    h_pad3 = h + 16  # 1 top halo + >=1 bottom halo + window slack
    xp = jnp.pad(x_cf, ((0, 0), (1, 1), (0, 0), (1, h_pad3 - h - 1),
                        (0, wkl - w)))
    kernel = functools.partial(_conv3d_kernel_v3, hb=hb, w=w, cin=cin,
                               cout=cout, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(bsz, d, h // hb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cout, hb, w), lambda b, dd, ih: (b, dd, 0, ih, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, cout, h, w), x_cf.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, cin, hb + 8, wkl), x_cf.dtype),
            pltpu.VMEM((9 * cin, hb * wkl), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xp, wk, scale.reshape(-1, 1), bias.reshape(-1, 1))


def pack_weights(w):
    """(3,3,3,Cin,Cout) -> (3*cpad, 9*Cin): rows dw-major in 8-aligned
    blocks of cpad rows (zero rows pad each Cout block so the stacked
    matmul result slices at aligned sublane offsets), cols (dd,dh)-major
    matching the roll-free patches."""
    kd, kh, kw, cin, cout = w.shape
    assert (kd, kh, kw) == (3, 3, 3)
    cpad = _cpad_of(cout)
    w2 = jnp.transpose(w, (2, 4, 0, 1, 3))  # (dw, cout, dd, dh, cin)
    w2 = jnp.pad(w2, ((0, 0), (0, cpad - cout), (0, 0), (0, 0), (0, 0)))
    return w2.reshape(3 * cpad, 9 * cin)


def _xla_conv3d(x, w):
    # non-f32: accumulate via the operand dtype so the conv transpose
    # never mixes a f32 cotangent with bf16 operands (MXU still
    # accumulates f32 internally; see rag_tpu.ops.convbr._conv)
    pet = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pet)
    return y.astype(x.dtype)


def _interp_forced() -> bool:
    """RAG_TPU_KERNEL_INTERPRET=1 routes the kernel paths through the
    Pallas interpreter on any backend — CPU tests use it to exercise the
    exact TPU code paths (fast backward included)."""
    import os

    return os.environ.get("RAG_TPU_KERNEL_INTERPRET") == "1"


def _on_tpu() -> bool:
    if _interp_forced():
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _conv3d_pallas(x, wk, scale, bias, relu: bool, interpret: bool):
    """Channels-last wrapper: x (B,D,H,W,C) -> (B,D,H,W,Cout)."""
    x_cf = jnp.transpose(x, (0, 1, 4, 2, 3))
    y_cf = _conv3d_pallas_cf(x_cf, wk, scale, bias, relu, interpret)
    return jnp.transpose(y_cf, (0, 1, 3, 4, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv3d_brc(x, w, scale, bias, relu=True):
    """Fused 3x3x3 stride-1 conv + affine (BN) + ReLU.

    x: (B,D,H,W,Cin); w: (3,3,3,Cin,Cout); scale/bias: (Cout,).
    Pallas on TPU, XLA elsewhere.
    """
    if _on_tpu():
        return _conv3d_pallas(x, pack_weights(w), scale, bias, relu,
                              interpret=_interp_forced())
    y = _xla_conv3d(x, w) * scale + bias
    return jnp.maximum(y, 0.0) if relu else y


def _fwd(x, w, scale, bias, relu):
    return conv3d_brc(x, w, scale, bias, relu), (x, w, scale, bias)


def _bwd(relu, res, g):
    x, w, scale, bias = res
    # exact backward through the XLA formulation
    def f(x_, w_, scale_, bias_):
        y = _xla_conv3d(x_, w_) * scale_ + bias_
        return jnp.maximum(y, 0.0) if relu else y

    _, vjp = jax.vjp(f, x, w, scale, bias)
    return vjp(g)


conv3d_brc.defvjp(_fwd, _bwd)


# -- weight gradient kernel -------------------------------------------------


def _conv3d_dw_kernel(s0_ref, s1_ref, s2_ref, dz_ref, out_ref, patches,
                      *, h: int, w: int, cin: int, cout: int,
                      dz_padded: bool):
    """dw[dw_tap, (dd,dh,ci), co] += patches @ shift_inv(dz)^T, accumulated
    across the whole (B, D) grid into the single revisited output block.
    Roll-free patches; the inverse dw shift lands on the small dz.

    dz_padded: dz_ref carries the same _pad_v2 halo as the input slabs
    (the fast backward shares ONE padded dz between the dx and dw
    kernels) — rows shift by the 1-row top halo; halo rows are zero so
    they contribute nothing even when read."""
    b = pl.program_id(0)
    d = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    slabs = (s0_ref, s1_ref, s2_ref)
    hc = HC if h % HC == 0 and h > HC else h
    win = _win(hc)
    wk = _wk_of(w)

    def chunk_body(c, _):
        h0 = pl.multiple_of(c * hc, 8)
        bases = [slabs[dd][0, 0, :, pl.ds(h0, win), :].astype(jnp.float32)
                 for dd in range(3)]
        if wk != w:
            bases = [jnp.pad(b_, ((0, 0), (0, 0), (0, wk - w)))
                     for b_ in bases]
        t = 0
        for dd in range(3):
            for dh in range(3):
                rows = bases[dd][:, dh:dh + hc, :]
                patches[t * cin:(t + 1) * cin, :] = rows.reshape(cin, hc * wk)
                t += 1
        if dz_padded:
            # pad the aligned window BEFORE the offset-1 row slice: Mosaic
            # cannot lane-concat (pad) a value that carries a sublane
            # offset ("result/input offset mismatch on non-concat dim")
            dzw = dz_ref[0, 0, :, pl.ds(h0, win), :].astype(jnp.float32)
            if wk != w:
                dzw = jnp.pad(dzw, ((0, 0), (0, 0), (0, wk - w)))
            dzc = dzw[:, 1:1 + hc, :]
        else:
            dzc = dz_ref[0, 0, :, pl.ds(h0, hc), :].astype(jnp.float32)
            if wk != w:
                dzc = jnp.pad(dzc, ((0, 0), (0, 0), (0, wk - w)))
        # dL/dW[dw] pairs x[i] with dz[i - (dw-1)]: stack the 3
        # inverse-shifted dz copies along N so the contraction runs as ONE
        # matmul (N=3*cout instead of 3 matmuls at N=cout, which left 90%
        # of the MXU columns idle at cout<=48); the (9cin, 3cout) output
        # block accumulates whole — no in-kernel slicing
        dzs = jnp.concatenate(
            [_shift_w(dzc, 2 - dw_, w).reshape(cout, hc * wk)
             for dw_ in range(3)], axis=0)
        out_ref[...] += jax.lax.dot_general(
            patches[:], dzs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, h // hc, chunk_body, 0)


def conv3d_dw_pallas(x_cf, dz_cf, interpret: bool = False):
    """Weight gradient for the 3x3x3 stride-1 cf conv.

    x_cf: (B, D, Cin, H, W); dz_cf: (B, D, Cout, H, W) cotangent of the
    pre-affine conv output. Returns dw (3,3,3,Cin,Cout)."""
    h = x_cf.shape[3]
    return conv3d_dw_pallas_pre(_pad_v2(x_cf), dz_cf, h, dz_padded=False,
                                interpret=interpret or _interp_forced())


def conv3d_dw_pallas_pre(xp, dz, h: int, dz_padded: bool,
                         interpret: bool = False):
    """dw kernel on a PREPADDED input (and optionally prepadded dz).

    xp: (B, D+2, Cin, h_pad, W) from _pad_v2; dz: either the raw
    (B, D, Cout, h, W) cotangent or its _pad_v2 form (dz_padded=True) —
    the fast backward passes the SAME padded dz to both the dx conv and
    this kernel, paying the pad pass once."""
    bsz, dp2, cin, h_pad, w = xp.shape
    d = dp2 - 2
    cout = dz.shape[2]
    hc, _, _ = _hgeom(h)

    kernel = functools.partial(_conv3d_dw_kernel, h=h, w=w, cin=cin,
                               cout=cout, dz_padded=dz_padded)
    mk_slab = lambda off: pl.BlockSpec(
        (1, 1, cin, h_pad, w),
        functools.partial(lambda b, dd, o: (b, dd + o, 0, 0, 0), o=off),
        memory_space=pltpu.VMEM)
    if dz_padded:
        dz_spec = pl.BlockSpec((1, 1, cout, h_pad, w),
                               lambda b, dd: (b, dd + 1, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        dz_spec = pl.BlockSpec((1, 1, cout, h, w),
                               lambda b, dd: (b, dd, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    dw = pl.pallas_call(
        kernel,
        grid=(bsz, d),
        in_specs=[mk_slab(0), mk_slab(1), mk_slab(2), dz_spec],
        out_specs=pl.BlockSpec((9 * cin, 3 * cout), lambda b, dd: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, 3 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9 * cin, hc * _wk_of(w)), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, xp, dz)
    # [(dd, dh, ci), (dw, co)] -> (dd, dh, dw, ci, co)
    return dw.reshape(3, 3, cin, 3, cout).transpose(0, 1, 3, 2, 4)


# -- channel-first entry (B, D, C, H, W), used by the native-cf matching
#    path (rag_tpu.ops.convbr_cf) ------------------------------------------


def _xla_conv3d_cf(x_cf, w):
    xt = jnp.transpose(x_cf, (0, 2, 1, 3, 4))       # (B, C, D, H, W)
    wt = jnp.transpose(w, (4, 3, 0, 1, 2))          # (O, I, kd, kh, kw)
    pet = jnp.float32 if x_cf.dtype == jnp.float32 else x_cf.dtype
    y = jax.lax.conv_general_dilated(
        xt, wt.astype(x_cf.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=pet)
    return jnp.transpose(y, (0, 2, 1, 3, 4)).astype(x_cf.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def conv3d_brc_cf(x_cf, w, scale, bias, relu=True):
    """Fused conv+affine+ReLU on a channel-first (B,D,C,H,W) volume."""
    if _on_tpu():
        return _conv3d_pallas_cf(x_cf, pack_weights(w), scale, bias, relu,
                                 interpret=_interp_forced())
    y = _xla_conv3d_cf(x_cf, w).astype(jnp.float32) \
        * scale.reshape(1, 1, -1, 1, 1) + bias.reshape(1, 1, -1, 1, 1)
    y = jnp.maximum(y, 0.0) if relu else y
    return y.astype(x_cf.dtype)


def _pallas_ok(x_cf) -> bool:
    # any W (the kernel lane-pads tiles internally); H must tile by 8
    return _on_tpu() and x_cf.shape[3] % 8 == 0


def _conv_only_cf(x_cf, w):
    cout = w.shape[-1]
    if _pallas_ok(x_cf):
        return _conv3d_pallas_cf(
            x_cf, pack_weights(w), jnp.ones((cout,), jnp.float32),
            jnp.zeros((cout,), jnp.float32), False, _interp_forced())
    return _xla_conv3d_cf(x_cf, w)


def _v2_fits(cin: int, cout: int, h: int, w: int) -> bool:
    hc, _, h_pad = _hgeom(h)
    wkl = _wk_of(w)
    v2_bytes = (3 * 2 * cin * (h_pad + 2) * w + 9 * cin * hc * wkl
                + 2 * cout * h * w) * 4
    return v2_bytes <= 12 * 1024 * 1024 and h % 8 == 0


def _fast_bwd_ok(x_cf, cin: int, cout: int) -> bool:
    """The shared-pad fast backward engages when the v2 blocked-slab
    kernel fits for BOTH conv directions (fwd/dw: cin->cout, dx:
    cout->cin) and no env var forces another variant."""
    import os

    if (os.environ.get("RAG_TPU_CONV3D_V3") == "1"
            or os.environ.get("RAG_TPU_CONV3D_V4", "0") == "1"):
        return False
    h, w = x_cf.shape[3], x_cf.shape[4]
    return (_pallas_ok(x_cf) and _v2_fits(cin, cout, h, w)
            and _v2_fits(cout, cin, h, w))


def _id_affine(cout: int):
    cpad = _cpad_of(cout)
    ones = jnp.pad(jnp.ones((cout,), jnp.float32), (0, cpad - cout))
    return ones, jnp.zeros((cpad,), jnp.float32)


def _fwd_cf(x, w, scale, bias, relu):
    """Differentiated forward: keep the pre-affine conv output z as the
    residual so the backward needs NO forward recompute (the naive
    jax.vjp-of-XLA backward re-ran the conv just to get the ReLU mask).

    On the fast path the residual input is the PADDED x (see _pad_v2):
    the dw kernel consumes it directly, so the pad pass is paid once in
    the forward instead of again in the backward."""
    cin, cout = w.shape[3], w.shape[4]
    if _fast_bwd_ok(x, cin, cout):
        xp = _pad_v2(x)
        ones, zeros = _id_affine(cout)
        z = _conv3d_v2_pre(xp, x.shape[1], x.shape[3], x.shape[4],
                           pack_weights(w), ones, zeros, False,
                           _interp_forced(), cout)
        res_x = xp
    else:
        z = _conv_only_cf(x, w)
        res_x = x
    sh = (1, 1, -1, 1, 1)
    y = z.astype(jnp.float32) * scale.reshape(sh) + bias.reshape(sh)
    out = jnp.maximum(y, 0.0) if relu else y
    return out.astype(x.dtype), (res_x, w, scale, bias, z)


def _bwd_cf(relu, res, g):
    res_x, w, scale, bias, z = res
    cin, cout = w.shape[3], w.shape[4]
    sh = (1, 1, -1, 1, 1)
    if relu:
        y = z.astype(jnp.float32) * scale.reshape(sh) + bias.reshape(sh)
        gm = g * (y > 0).astype(g.dtype)
    else:
        gm = g
    axes = (0, 1, 3, 4)
    # param grads accumulate f32 regardless of the activation dtype
    dbias = jnp.sum(gm.astype(jnp.float32), axis=axes)
    dscale = jnp.sum(gm.astype(jnp.float32) * z.astype(jnp.float32),
                     axis=axes)
    wf = jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    if res_x.shape[1] != z.shape[1]:
        # fast path (padded residual): ONE padded relu-masked cotangent
        # feeds both the dx conv and the dw kernel (XLA fuses the mask
        # into the pad write); the affine scale folds into the flipped
        # dx weights and post-scales dw, so dz = g*scale never
        # materializes as its own pass
        dzp = _pad_v2(gm)
        b, d, _, h, wdt = z.shape
        wf_s = wf * scale.reshape(1, 1, 1, -1, 1)
        ones_i, zeros_i = _id_affine(cin)
        dx = _conv3d_v2_pre(dzp, d, h, wdt, pack_weights(wf_s),
                            ones_i, zeros_i, False, _interp_forced(), cin)
        dw = conv3d_dw_pallas_pre(res_x, dzp, h, dz_padded=True,
                                  interpret=_interp_forced())
        dw = dw * scale.reshape(1, 1, 1, 1, -1)
        return dx, dw, dscale, dbias
    dz = (gm.astype(jnp.float32) * scale.reshape(sh)).astype(res_x.dtype)
    # dL/dx = conv(dz, spatially-flipped io-transposed w) — 3x3x3 stride-1
    # again, so the Pallas kernel handles it too
    dx = _conv_only_cf(dz, wf)
    if _pallas_ok(res_x):
        dw = conv3d_dw_pallas(res_x, dz)
    else:
        # XLA's conv-weight-gradient (a big spatial reduction)
        _, vjp_w = jax.vjp(lambda w_: _xla_conv3d_cf(res_x, w_), w)
        (dw,) = vjp_w(dz)
    return dx, dw, dscale, dbias


conv3d_brc_cf.defvjp(_fwd_cf, _bwd_cf)
