"""Mesh-sharded train/eval steps.

Data-parallel + spatial-parallel training: params/opt state replicated,
batch sharded over 'data', the cost volume sharding-constrained over
'model'. Gradients reduce via the collectives XLA inserts for the
replicated-out params (psum over ICI) — no hand-written NCCL analog, per
the scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from rag_tpu.metrics.stereo import stereo_metrics
from rag_tpu.models.stereo import stereo_forward
from rag_tpu.parallel.mesh import DATA_AXIS, cost_volume_spec
from rag_tpu.train.trainer import _freeze_mask, supervised_loss


def _constrainer(mesh):
    spec = cost_volume_spec(mesh)

    def constrain(cost):
        return jax.lax.with_sharding_constraint(
            cost, NamedSharding(mesh, spec))

    return constrain


def make_sharded_train_step(mesh, specs: Mapping, bn_sites: frozenset,
                            optimizer, trainable_sites: frozenset = None):
    """Like trainer.make_train_step but jitted with explicit mesh shardings:
    batch in over P('data'), params/opt replicated, scalars replicated."""
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
                cost_constraint=constrain)
            loss, mask = supervised_loss(disp, disp_gt)
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


def make_sharded_eval_step(mesh, specs: Mapping):
    constrain = _constrainer(mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, in_shardings=(repl, repl, data, data, data),
             out_shardings=repl)
    def step(params, stats, left, right, disp_gt):
        disp, _ = stereo_forward(specs, params, stats, left, right,
                                 cost_constraint=constrain)
        loss, mask = supervised_loss(disp, disp_gt)
        return {"loss": loss, **stereo_metrics(disp, disp_gt, mask)}

    return step
