"""Pallas TPU kernels for the hot ops.

Fused soft-argmin disparity regression
--------------------------------------
The reference's Disp head (src/models/rag_model.py:32-44) trilinearly
upsamples the (D, h, w) matching cost to (maxdisp, 3h, 3w), softmins over
disparity and takes the expectation. Done naively that materializes a
(B, 192, 3h, 3w) volume in HBM several times — at the 384x192 train crop
that is ~450 MB per intermediate, and the op is purely memory bound.

This kernel fuses the whole head: for each (batch, row-tile) grid step it
DMAs the needed input rows (+1-row halo) into VMEM, performs the three
interpolations as MXU matmuls against trace-time constant interpolation
matrices, and reduces softmin+expectation in VMEM, writing only the final
(3h, 3w) disparity tile. HBM traffic drops from O(maxdisp * 9hw) to
O(D * hw + 9hw).

The op is exposed with a custom VJP. On TPU the backward is a fused
Pallas kernel (_disp_bwd_kernel: recompute softmin + the analytic
d(out)/d(y_k) = -p_k (k - out) chain in VMEM, contracted back through the
transposed interpolation matrices); elsewhere the same analytic gradient
runs in plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_tpu.ops.pallas_conv3d import _interp_forced
from rag_tpu.ops.resize import _interp_matrix_np


def _on_tpu() -> bool:
    if _interp_forced():
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _row_tile(h: int) -> int:
    """Input-row tile: 8 keeps the (3*th) output rows 8-aligned (Mosaic
    block constraint); fall back to the whole axis for tiny inputs."""
    return 8 if h % 8 == 0 and h > 8 else h


def _wblock(w_out: int) -> int:
    """Output-width block: 384 lanes (3x128 — dynamic lane offsets must be
    128-aligned) unless the output is narrower."""
    return 384 if w_out >= 384 else w_out


def _disp_kernel(x_hbm, u_d_ref, u_h_ref, u_w_ref, out_ref, scratch, sem,
                 *, th: int, tin: int, h: int, maxdisp: int, w_out: int):
    b = pl.program_id(0)
    it = pl.program_id(1)
    # x is host-padded by one row top/bottom, so every tile's haloed window
    # starts at the aligned offset it*th (Mosaic faults on unaligned
    # dynamic DMA offsets).
    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(it * th, tin), :], scratch, sem)
    dma.start()
    dma.wait()
    xt = scratch[:]                                   # (D, TIN, w_pad)

    rows_out = 3 * th
    chunk = 8 if rows_out % 8 == 0 and rows_out > 8 else rows_out
    wblk = _wblock(w_out)
    dvals = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, maxdisp), 2).astype(jnp.float32)

    # NOTE: python-unrolled chunk loops make Mosaic stack every chunk's
    # buffers in VMEM simultaneously (observed 34 MB at eval geometry), so
    # both loops are real fori_loops with dynamic-but-8/128-aligned slices.
    def row_body(c, _):
        r0 = pl.multiple_of(c * chunk, 8)
        u_h = u_h_ref[0, pl.ds(r0, chunk), :]          # (chunk, tin)
        xh = jax.lax.dot_general(                      # (chunk, D, w_pad)
            u_h, xt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        def col_block(uw_blk, c0_static, wb_dyn):
            lw = jax.lax.dot_general(                  # (chunk, D, wblk)
                xh, uw_blk, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jax.lax.dot_general(              # (chunk, wblk, maxdisp)
                lw, u_d_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(-logits, axis=-1)
            vals = jnp.sum(p * dvals, axis=-1)
            if c0_static is not None:
                out_ref[0, pl.ds(r0, chunk),
                        c0_static:c0_static + wblk] = vals
            else:
                out_ref[0, pl.ds(r0, chunk), pl.ds(wb_dyn, wblk)] = vals

        if w_out == wblk:
            # single W block: static slices (dynamic lane indices must be
            # provably 128-aligned, which wblk<384 widths are not)
            col_block(u_w_ref[:, :], 0, None)
        else:
            def col_body(wb, _):
                c0 = pl.multiple_of(wb * wblk, 128)
                col_block(u_w_ref[:, pl.ds(c0, wblk)], None, c0)
                return 0

            jax.lax.fori_loop(0, w_out // wblk, col_body, 0)
        return 0

    jax.lax.fori_loop(0, rows_out // chunk, row_body, 0)


def _disp_pallas_raw(x, maxdisp: int, scale: int, interpret: bool):
    """x: (B, D, h, w) -> (B, scale*h, scale*w)."""
    b, d, h, w = x.shape
    th = _row_tile(h)
    # 8-aligned haloed window: DMA offsets (it*th) and sizes (th+8) must
    # both be sublane-aligned or Mosaic faults at runtime
    tin = th + 8 if th >= 8 else th + 2
    u_d = jnp.asarray(_interp_matrix_np(d, maxdisp, False))

    # lane alignment: Mosaic can only collapse (… , D, w) into a matmul
    # operand when w is a multiple of 128, so pad the input W; the output
    # width pads to a multiple of the 384-lane W block (dynamic lane
    # offsets must be 128-aligned) and is sliced back on the host. Padded
    # rows/cols carry zero weight in u_w.
    w_pad = max(-(-w // 128) * 128, 128) if w > 8 else w
    w_out = w * scale
    wblk = _wblock(w_out)
    w_out_pad = -(-w_out // wblk) * wblk
    u_w_np = np.zeros((w_pad, w_out_pad), np.float32)
    u_w_np[:w, :w_out] = _interp_matrix_np(w, w_out, False).T
    u_w = jnp.asarray(u_w_np)                            # (w_pad, w_out_pad)

    # row padding keeps every tile's haloed DMA window in bounds: real row
    # r lives at padded index r+1; window [it*th, it*th+tin)
    x = jnp.pad(x, ((0, 0), (0, 0), (1, tin - th - 1), (0, w_pad - w)))

    # pre-blocked H matrix: one (3th, tin) window per row tile in PADDED
    # row coordinates (padded index j <-> real row it*th - 1 + j); padding
    # rows carry zero weight. This avoids dynamic lane-dim slicing inside
    # the kernel (Mosaic requires 128-aligned dynamic indices there).
    u_h_full = _interp_matrix_np(h, h * scale, False)
    n_tiles = h // th
    u_h_blocks = np.zeros((n_tiles, 3 * th, tin), np.float32)
    for it in range(n_tiles):
        for j in range(tin):
            real = it * th - 1 + j
            if 0 <= real < h:
                u_h_blocks[it, :, j] = u_h_full[
                    it * 3 * th:(it + 1) * 3 * th, real]
    u_h = jnp.asarray(u_h_blocks)

    kernel = functools.partial(
        _disp_kernel, th=th, tin=tin, h=h, maxdisp=maxdisp, w_out=w_out_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u_d
            pl.BlockSpec((1, 3 * th, tin), lambda bb, tt: (tt, 0, 0),
                         memory_space=pltpu.VMEM),  # u_h per-tile block
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u_w
        ],
        out_specs=pl.BlockSpec(
            (1, scale * th, w_out_pad), lambda bb, tt: (bb, tt, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, scale * h, w_out_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, tin, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, u_d, u_h, u_w)
    return out[:, :, :w_out] if w_out_pad != w_out else out


def _disp_bwd_kernel(x_hbm, g_hbm, u_d_ref, u_fw_ref, u_bw_ref, u_w_ref,
                     dx_ref, xw, gw, acc, semx, semg,
                     *, th: int, txin: int, tgin: int, maxdisp: int,
                     w_out: int):
    """Backward tile: recompute softmin over the haloed out-row window,
    form dy = -p (K - out) g, and pull it back through the transposed
    interpolations. Each input-row tile receives ALL its contributions
    from its own out-row window (halo 8), so there is no cross-tile
    accumulation."""
    b = pl.program_id(0)
    it = pl.program_id(1)

    dmx = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(it * th, txin), :], xw, semx)
    dmg = pltpu.make_async_copy(
        g_hbm.at[b, pl.ds(it * 3 * th, tgin), :], gw, semg)
    dmx.start()
    dmg.start()
    dmx.wait()
    dmg.wait()

    acc[...] = jnp.zeros_like(acc)
    wblk = _wblock(w_out)
    dvals = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, maxdisp), 2).astype(jnp.float32)
    chunk = 8 if tgin % 8 == 0 and tgin > 8 else tgin

    def row_body(c, _):
        r0 = pl.multiple_of(c * chunk, 8)
        u_fw = u_fw_ref[0, pl.ds(r0, chunk), :]        # (chunk, txin)
        xh = jax.lax.dot_general(                      # (chunk, D, w_pad)
            u_fw, xw[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        def col_body(wb, _):
            c0 = pl.multiple_of(wb * wblk, 128 if wblk % 128 == 0 else wblk)
            u_w_blk = u_w_ref[:, pl.ds(c0, wblk)]      # (w_pad, wblk)
            lw = jax.lax.dot_general(                  # (chunk, D, wblk)
                xh, u_w_blk, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jax.lax.dot_general(              # (chunk, wblk, MD)
                lw, u_d_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(-logits, axis=-1)
            outv = jnp.sum(p * dvals, axis=-1)         # (chunk, wblk)
            gblk = gw[pl.ds(r0, chunk), pl.ds(c0, wblk)]
            dy = -p * (dvals - outv[..., None]) * gblk[..., None]
            dlw = jax.lax.dot_general(                 # (chunk, wblk, D)
                dy, u_d_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(             # (chunk, wblk->w_pad)
                dlw, u_w_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (chunk, D, w_pad)
            acc[pl.ds(r0, chunk), :, :] += contrib
            return 0

        jax.lax.fori_loop(0, w_out // wblk, col_body, 0)
        return 0

    jax.lax.fori_loop(0, tgin // chunk, row_body, 0)

    dx_t = jax.lax.dot_general(                        # (th, D, w_pad)
        u_bw_ref[0], acc[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0] = jnp.transpose(dx_t, (1, 0, 2))


def _disp_bwd_pallas(x, g, maxdisp: int, scale: int, interpret: bool):
    """x: (B, D, h, w); g: (B, scale*h, scale*w) -> dx (B, D, h, w)."""
    b, d, h, w = x.shape
    th = _row_tile(h)
    if th != 8:
        # tiny inputs: analytic jnp backward is fine
        return None
    txin = th + 16   # x-row window with halo 8 each side
    tgin = 3 * th + 16

    w_pad = max(-(-w // 128) * 128, 128)
    w_out = w * scale
    wblk = _wblock(w_out)
    w_out_pad = -(-w_out // wblk) * wblk

    u_d = jnp.asarray(_interp_matrix_np(d, maxdisp, False))
    u_w_np = np.zeros((w_pad, w_out_pad), np.float32)
    u_w_np[:w, :w_out] = _interp_matrix_np(w, w_out, False).T
    u_w = jnp.asarray(u_w_np)

    u_h_full = _interp_matrix_np(h, h * scale, False)
    n_tiles = h // th
    u_fw = np.zeros((n_tiles, tgin, txin), np.float32)   # out-window x window
    u_bw = np.zeros((n_tiles, th, tgin), np.float32)     # x-tile x out-window
    for it in range(n_tiles):
        for a in range(tgin):
            out_row = it * 3 * th - 8 + a
            if not (0 <= out_row < h * scale):
                continue
            for j in range(txin):
                xr = it * th - 8 + j
                if 0 <= xr < h:
                    u_fw[it, a, j] = u_h_full[out_row, xr]
            for r in range(th):
                u_bw[it, r, a] = u_h_full[out_row, it * th + r]

    xpad = jnp.pad(x, ((0, 0), (0, 0), (8, 8), (0, w_pad - w)))
    gpad = jnp.pad(g, ((0, 0), (8, 8), (0, w_out_pad - w_out)))

    kernel = functools.partial(
        _disp_bwd_kernel, th=th, txin=txin, tgin=tgin, maxdisp=maxdisp,
        w_out=w_out_pad)
    dx = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # g (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u_d
            pl.BlockSpec((1, tgin, txin), lambda bb, tt: (tt, 0, 0),
                         memory_space=pltpu.VMEM),  # u_fw block
            pl.BlockSpec((1, th, tgin), lambda bb, tt: (tt, 0, 0),
                         memory_space=pltpu.VMEM),  # u_bw block
            pl.BlockSpec(memory_space=pltpu.VMEM),  # u_w
        ],
        out_specs=pl.BlockSpec(
            (1, d, th, w_pad), lambda bb, tt: (bb, 0, tt, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, txin, w_pad), jnp.float32),   # x window
            pltpu.VMEM((tgin, w_out_pad), jnp.float32),  # g window
            pltpu.VMEM((tgin, d, w_pad), jnp.float32),   # accumulator
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xpad, gpad, u_d, jnp.asarray(u_fw), jnp.asarray(u_bw), u_w)
    return dx[:, :, :, :w] if w_pad != w else dx


def _disp_reference(x, maxdisp: int, scale: int):
    """Plain-XLA forward (also the basis of the backward pass)."""
    b, d, h, w = x.shape
    u_d = jnp.asarray(_interp_matrix_np(d, maxdisp, False))
    u_h = jnp.asarray(_interp_matrix_np(h, h * scale, False))
    u_w = jnp.asarray(_interp_matrix_np(w, w * scale, False))
    y = jnp.einsum("Dd,bdhw->bDhw", u_d, x)
    y = jnp.einsum("Hh,bDhw->bDHw", u_h, y)
    y = jnp.einsum("Ww,bDHw->bDHW", u_w, y)
    p = jax.nn.softmax(-y, axis=1)
    dvals = jnp.arange(maxdisp, dtype=x.dtype)
    out = jnp.einsum("d,bdHW->bHW", dvals, p)
    return out, (p, dvals, u_d, u_h, u_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_soft_argmin(x, maxdisp: int, scale: int):
    """Fused disparity head. x: (B, D, h, w) 1-channel matching cost."""
    if _on_tpu():
        return _disp_pallas_raw(x, maxdisp, scale, interpret=_interp_forced())
    return _disp_reference(x, maxdisp, scale)[0]


def _fsa_fwd(x, maxdisp, scale):
    return fused_soft_argmin(x, maxdisp, scale), x


def _fsa_bwd(maxdisp, scale, x, g):
    if _on_tpu():
        dx = _disp_bwd_pallas(x, g, maxdisp, scale, interpret=_interp_forced())
        if dx is not None:
            return (dx,)
    # analytic fallback: d(out)/d(y_k) = -p_k (k - out), chained through
    # the three interpolations.
    out, (p, dvals, u_d, u_h, u_w) = _disp_reference(x, maxdisp, scale)
    dy = -p * (dvals[None, :, None, None] - out[:, None]) * g[:, None]
    dx = jnp.einsum("Dd,bDHW->bdHW", u_d, dy)
    dx = jnp.einsum("Hh,bdHW->bdhW", u_h, dx)
    dx = jnp.einsum("Ww,bdhW->bdhw", u_w, dx)
    return (dx,)


fused_soft_argmin.defvjp(_fsa_fwd, _fsa_bwd)


def soft_argmin_disparity_fused(cost, maxdisp: int, scale: int = 3):
    """Drop-in for rag_tpu.ops.disparity.soft_argmin_disparity:
    cost (B, D, h, w, 1) -> (B, scale*h, scale*w).

    The head always runs f32 (softmin over 192 levels amplifies noise —
    ops/precision.py policy); a bf16 cost is upcast here so every caller
    gets the policy regardless of the matching net's storage dtype (the
    kernel's DMA scratch is f32 and Mosaic rejects mixed-dtype DMA)."""
    return fused_soft_argmin(cost[..., 0].astype(jnp.float32), maxdisp, scale)
