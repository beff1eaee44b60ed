"""Jitted train/eval steps and the SGD + cosine optimizer stack.

The reference trains with SGD(momentum .9, weight decay), cosine LR, grad
clip 5, masked smooth-L1 (src/approaches/rag.py:107-219). We keep those
semantics but fix the reference's scheduler bug (`scheduler.step(valid_loss)`
passes a loss where an epoch is expected, rag.py:146 — see SURVEY.md quirks):
our cosine decay is a real cosine over epochs.

Freezing: the reference freezes reused units by excluding their params from
the optimizer and putting their BN in eval mode. Functionally we (a) pass
train_sites to the forward so frozen BN uses running stats, and (b) zero the
gradients of frozen leaves before the optimizer — momentum and weight decay
then never touch them (torch equivalence: params absent from the optimizer).

Data parallelism (green-field; the reference is single-GPU, SURVEY.md §2.4):
every step maker takes ``mesh=None``. With a dp mesh the SAME step body runs
under ``jax.shard_map`` over the 'data' axis — parameters replicated, batch
sharded, and every cross-shard statistic reduced explicitly (grads psum'd,
BatchNorm batch stats pmean'd via rag_tpu.parallel.axis.bn_collective,
masked losses/metrics psum'd by parts) — so the sharded step reproduces the
single-device semantics exactly. shard_map (not GSPMD in_shardings) is
load-bearing: the Pallas kernels dispatch per shard, keeping the full
kernel speedup in multi-chip training (GSPMD treats the custom calls as
unpartitionable).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import optax

from rag_tpu.metrics.stereo import stereo_metrics
from rag_tpu.models.stereo import stereo_forward
from rag_tpu.parallel.axis import bn_collective, data_axis, shard_jit
from rag_tpu.train.losses import smooth_l1_masked

MAXDISP = 192


def cosine_lr(base_lr: float, total_epochs: int, epoch: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR closed form."""
    if total_epochs <= 0:
        return base_lr
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / total_epochs)) / 2


def make_optimizer(weight_decay: float, clip: float = 5.0):
    """Gradient transform matching torch SGD(momentum=.9, wd) after a global
    clip — lr is injected per-step (host-computed cosine)."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=0.9, nesterov=False),
    )


def _freeze_mask(params, trainable: Callable[[str], bool]):
    """0/1 mask tree: top-level key = site name."""
    return {
        site: jax.tree_util.tree_map(
            lambda _: jnp.asarray(1.0 if trainable(site) else 0.0), sub
        )
        for site, sub in params.items()
    }


def supervised_loss(disp, disp_gt, maxdisp: int = MAXDISP, axis=None):
    mask = (disp_gt > 0) & (disp_gt < maxdisp)
    return smooth_l1_masked(disp, disp_gt, mask, axis=axis), mask


def _psum_grads(grads, axis):
    """Replicated params used on every shard: the true gradient is the sum
    of the per-shard partials of the (already-global) loss."""
    if axis is None:
        return grads
    return jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)


def _sgd_apply(optimizer, params, grads, opt_state, lr, mask_fn):
    """Shared masked-SGD tail: freeze-mask grads AND updates (weight decay
    never touches frozen leaves), then the lr step."""
    m = mask_fn(params)
    grads = jax.tree_util.tree_map(lambda g, mm: g * mm, grads, m)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u, mm: u * mm, updates, m)
    params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
    return params, opt_state


def make_train_step(specs: Mapping, bn_sites: frozenset, optimizer,
                    trainable_sites: frozenset = None,
                    forward=stereo_forward, maxdisp: int = MAXDISP,
                    mesh=None):
    """Returns jitted step(params, stats, opt, lr, batch) ->
    (params, stats, opt, scalars).

    bn_sites: sites whose BatchNorm runs in train mode (batch stats +
    running update). trainable_sites: sites whose params receive updates;
    defaults to bn_sites (the fine-tune stage couples the two, rag.py:
    159-201), while op search decouples them (all BN frozen, only new
    units train — rag.py:344-368).

    mesh: optional dp mesh — the step runs shard_map'd over 'data' with
    exact single-device semantics (see module docstring)."""

    if trainable_sites is None:
        trainable_sites = bn_sites
    mask_fn = partial(_freeze_mask, trainable=lambda s: s in trainable_sites)
    axis = data_axis(mesh)

    def step(params, stats, opt_state, lr, left, right, disp_gt):
        def loss_fn(p):
            # fused_head in training: round-1 measured the Pallas fwd+bwd
            # head pair SLOWER in the full step (the opaque kernel boundary
            # blocked XLA fusion); re-measured neutral in round 3 —
            # override with RAG_TPU_TRAIN_FUSED_HEAD=1.
            import os

            fh = os.environ.get("RAG_TPU_TRAIN_FUSED_HEAD", "0") == "1"
            disp, new_stats = forward(specs, p, stats, left, right,
                                      train_sites=bn_sites, fused_head=fh,
                                      maxdisp=maxdisp)
            loss, mask = supervised_loss(disp, disp_gt, maxdisp, axis=axis)
            return loss, (disp, new_stats, mask)

        with bn_collective(axis):
            (loss, (disp, new_stats, mask)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        grads = _psum_grads(grads, axis)
        params, opt_state = _sgd_apply(optimizer, params, grads, opt_state,
                                       lr, mask_fn)
        scalars = {"loss": loss, **stereo_metrics(disp, disp_gt, mask, axis)}
        return params, new_stats, opt_state, scalars

    if axis is None:
        return jax.jit(step)
    return shard_jit(mesh, step, "rrrsddd")


def make_eval_step(specs: Mapping, forward=stereo_forward,
                   maxdisp: int = MAXDISP, mesh=None):
    axis = data_axis(mesh)

    def step(params, stats, left, right, disp_gt):
        disp, _ = forward(specs, params, stats, left, right,
                          train_sites=frozenset(), fused_head=True,
                          maxdisp=maxdisp)
        loss, mask = supervised_loss(disp, disp_gt, maxdisp, axis=axis)
        return {"loss": loss, **stereo_metrics(disp, disp_gt, mask, axis)}

    if axis is None:
        return jax.jit(step)
    return shard_jit(mesh, step, "rrddd")


def make_selfsup_train_step(specs: Mapping, bn_sites: frozenset, optimizer,
                            trainable_sites: frozenset = None,
                            maxdisp: int = MAXDISP, mesh=None):
    """Photometric (self-supervised) train step: the src_self variant's
    train_epoch(..., supervise=False) (src_self/approaches/rag.py:215-280).
    Ground truth, when present in the batch, is used for monitoring metrics
    only — the loss never sees it."""
    from rag_tpu.train.losses import photometric_loss

    if trainable_sites is None:
        trainable_sites = bn_sites
    mask_fn = partial(_freeze_mask, trainable=lambda s: s in trainable_sites)
    axis = data_axis(mesh)

    def step(params, stats, opt_state, lr, left, right, disp_gt):
        def loss_fn(p):
            disp, new_stats = stereo_forward(specs, p, stats, left, right,
                                             train_sites=bn_sites,
                                             maxdisp=maxdisp)
            loss = photometric_loss(disp, left, right, axis=axis)
            return loss, (disp, new_stats)

        with bn_collective(axis):
            (loss, (disp, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        grads = _psum_grads(grads, axis)
        params, opt_state = _sgd_apply(optimizer, params, grads, opt_state,
                                       lr, mask_fn)
        mask = (disp_gt > 0) & (disp_gt < maxdisp)
        scalars = {"loss": loss, **stereo_metrics(disp, disp_gt, mask, axis)}
        return params, new_stats, opt_state, scalars

    if axis is None:
        return jax.jit(step)
    return shard_jit(mesh, step, "rrrsddd")


# ---------------------------------------------------------------------------
# Depth variant steps (silog objective, depth metric suite)
# ---------------------------------------------------------------------------


def make_depth_train_step(specs: Mapping, bn_sites: frozenset, optimizer,
                          trainable_sites: frozenset = None, mesh=None):
    from rag_tpu.metrics.depth import depth_metrics
    from rag_tpu.models.depth import depth_forward
    from rag_tpu.train.losses import silog_loss

    if trainable_sites is None:
        trainable_sites = bn_sites
    mask_fn = partial(_freeze_mask, trainable=lambda s: s in trainable_sites)
    axis = data_axis(mesh)

    def step(params, stats, opt_state, lr, image, depth_gt):
        def loss_fn(p):
            pred, new_stats = depth_forward(specs, p, stats, image,
                                            train_sites=bn_sites)
            mask = depth_gt > 0
            loss = silog_loss(pred, depth_gt, mask, axis=axis)
            return loss, (pred, new_stats, mask)

        with bn_collective(axis):
            (loss, (pred, new_stats, mask)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        grads = _psum_grads(grads, axis)
        params, opt_state = _sgd_apply(optimizer, params, grads, opt_state,
                                       lr, mask_fn)
        scalars = {"loss": loss, **depth_metrics(pred, depth_gt, mask, axis)}
        return params, new_stats, opt_state, scalars

    if axis is None:
        return jax.jit(step)
    return shard_jit(mesh, step, "rrrsdd")


def make_depth_eval_step(specs: Mapping, mesh=None):
    from rag_tpu.metrics.depth import depth_metrics
    from rag_tpu.models.depth import depth_forward
    from rag_tpu.train.losses import silog_loss

    axis = data_axis(mesh)

    def step(params, stats, image, depth_gt):
        pred, _ = depth_forward(specs, params, stats, image)
        mask = depth_gt > 0
        loss = silog_loss(pred, depth_gt, mask, axis=axis)
        return {"loss": loss, **depth_metrics(pred, depth_gt, mask, axis)}

    if axis is None:
        return jax.jit(step)
    return shard_jit(mesh, step, "rrdd")
