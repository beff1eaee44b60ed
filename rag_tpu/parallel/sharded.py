"""Mesh-sharded train/eval steps.

Two regimes (the reference is single-GPU — SURVEY.md §2.4 — so this layer
is the green-field scaling plane of the north star):

* **Pure data parallelism (model axis == 1, the production path):**
  dispatch to the trainer's shard_map steps
  (rag_tpu.train.trainer.make_*_step with mesh=...). The whole per-device
  program runs per shard, which keeps the Pallas cost-volume/conv3d
  kernels dispatching locally — batch sharded, params replicated, grads
  psum'd, BN batch statistics pmean'd (exact single-device semantics).

* **Spatial (model-axis) sharding of the cost volume:** GSPMD steps with
  a with_sharding_constraint on the (B, D, H, W, 2C) volume — XLA inserts
  the halo exchanges for the 3D convolutions. This path cannot run the
  Pallas kernels (GSPMD treats their custom calls as unpartitionable), so
  it exists for the memory-giant regime where the volume itself must
  shard; the cf/kernel path is disabled by the cost_constraint hook
  (models/stereo.py).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from rag_tpu.metrics.stereo import stereo_metrics
from rag_tpu.models.stereo import stereo_forward
from rag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, cost_volume_spec
from rag_tpu.train.trainer import (
    _freeze_mask,
    make_eval_step,
    make_train_step,
    supervised_loss,
)


def _model_size(mesh) -> int:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get(MODEL_AXIS, 1)


def _constrainer(mesh):
    spec = cost_volume_spec(mesh)

    def constrain(cost):
        return jax.lax.with_sharding_constraint(
            cost, NamedSharding(mesh, spec))

    return constrain


def make_sharded_train_step(mesh, specs: Mapping, bn_sites: frozenset,
                            optimizer, trainable_sites: frozenset = None,
                            maxdisp: int = 192):
    """Mesh-sharded train step. Pure-dp meshes go through the shard_map
    path (Pallas kernels intact); meshes with a model axis > 1 take the
    GSPMD cost-volume-sharding path."""
    if _model_size(mesh) == 1:
        return make_train_step(specs, bn_sites, optimizer,
                               trainable_sites=trainable_sites,
                               maxdisp=maxdisp, mesh=mesh)
    if trainable_sites is None:
        trainable_sites = bn_sites
    mask_fn = partial(_freeze_mask, trainable=lambda s: s in trainable_sites)
    constrain = _constrainer(mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit,
             in_shardings=(repl, repl, repl, None, data, data, data),
             out_shardings=(repl, repl, repl, repl))
    def step(params, stats, opt_state, lr, left, right, disp_gt):
        def loss_fn(p):
            disp, new_stats = stereo_forward(
                specs, p, stats, left, right, train_sites=bn_sites,
                cost_constraint=constrain, maxdisp=maxdisp)
            loss, mask = supervised_loss(disp, disp_gt, maxdisp)
            return loss, (disp, new_stats, mask)

        (loss, (disp, new_stats, mask)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        m = mask_fn(grads)
        grads = jax.tree_util.tree_map(lambda g, mm: g * mm, grads, m)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u, mm: u * mm, updates, m)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
        scalars = {"loss": loss, **stereo_metrics(disp, disp_gt, mask)}
        return params, new_stats, opt_state, scalars

    return step


def make_sharded_eval_step(mesh, specs: Mapping, maxdisp: int = 192):
    if _model_size(mesh) == 1:
        return make_eval_step(specs, maxdisp=maxdisp, mesh=mesh)
    constrain = _constrainer(mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, in_shardings=(repl, repl, data, data, data),
             out_shardings=repl)
    def step(params, stats, left, right, disp_gt):
        disp, _ = stereo_forward(specs, params, stats, left, right,
                                 cost_constraint=constrain, maxdisp=maxdisp)
        loss, mask = supervised_loss(disp, disp_gt, maxdisp)
        return {"loss": loss, **stereo_metrics(disp, disp_gt, mask)}

    return step
