"""Scene-parallel cell search: every scene's MdeNAS search runs at once.

The reference's continual loop is strictly sequential (its per-task
pipeline at src/approaches/rag.py:79-105), but stage 1 — cell search —
builds a FRESH throwaway supernet per task (src/approaches/rag.py:224)
that depends only on that scene's own data, so the searches for all
scenes are mutually independent. This module exploits that on a TPU
mesh: a 'scene' axis holds one supernet replica per scene, every train /
eval step runs all scenes' sampled paths simultaneously under
``jax.shard_map`` (zero collectives — the work is embarrassingly
parallel and rides separate cores/chips), and the tiny MdeNAS
probability updates run host-side, vectorized over the scene dimension
(``mdenas_update`` already broadcasts over leading axes).

shard_map rather than vmap is load-bearing: the supernet dispatches each
edge with ``lax.cond`` on a *traced* op index (rag_tpu/models/supernet.py),
and vmap would batch the predicate, lowering the cond to a ``select``
that executes BOTH ops on every edge. Under shard_map each scene shard
keeps a scalar predicate, so the single-path property — the whole point
of MdeNAS sampling — survives.

Multi-host: with ``jax.distributed`` initialized (rag_tpu.parallel.
multihost) the same mesh spans hosts and each host feeds its local
scene's data — "search 4 genotypes on 4 hosts", the capability the
reference's sequential loop cannot express (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_tpu.data.stereo_dataset import split_half
from rag_tpu.metrics.meters import AverageMeterDict
from rag_tpu.metrics.stereo import stereo_metrics
from rag_tpu.models.supernet import NUM_EDGES, init_supernet, supernet_forward
from rag_tpu.search.genotype import Genotype, parse_genotype
from rag_tpu.search.mdenas import CellSearchConfig, mdenas_update
from rag_tpu.train.trainer import cosine_lr, make_optimizer, supervised_loss

SCENE_AXIS = "scene"


def make_scene_mesh(num_scenes: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh with one device (or device group) per scene."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= num_scenes, (len(devices), num_scenes)
    arr = np.asarray(devices[:num_scenes])
    return Mesh(arr, (SCENE_AXIS,))


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class SceneParallelCellSearch:
    """Searches one Genotype per scene, all scenes concurrently.

    Semantics per scene are identical to ``rag_tpu.search.mdenas.
    CellSearch`` (same init seed, same per-task sampling streams, same
    pairwise update, same best-by-valid-loss genotype) — pinned by
    tests/test_scene_parallel.py against the sequential engine.
    """

    def __init__(self, config: CellSearchConfig, num_scenes: int,
                 mesh: Optional[Mesh] = None,
                 log: Optional[Callable] = print,
                 scene_seeds: Optional[Sequence[int]] = None):
        self.cfg = config
        self.num_scenes = num_scenes
        self.mesh = mesh if mesh is not None else make_scene_mesh(num_scenes)
        assert self.mesh.shape[SCENE_AXIS] == num_scenes, \
            (dict(self.mesh.shape), num_scenes)
        self.log = log or (lambda *_: None)
        # per-scene seeds reproduce the driver's sequential behavior
        # (ContinualDriver.search_cell seeds scene t with cell.seed + t)
        self.scene_seeds = list(scene_seeds) if scene_seeds is not None \
            else [config.seed] * num_scenes
        assert len(self.scene_seeds) == num_scenes

        # each sequential CellSearch inits its fresh supernet from
        # PRNGKey(its config seed) — replicate per scene
        inits = [init_supernet(jax.random.PRNGKey(s))
                 for s in self.scene_seeds]
        self.optimizer = make_optimizer(config.weight_decay, config.grad_clip)
        n = num_scenes
        rep = NamedSharding(self.mesh, P(SCENE_AXIS))
        put = lambda t: jax.device_put(t, rep)
        self.params = put(_stack([p for p, _ in inits]))
        self.stats = put(_stack([s for _, s in inits]))
        self.opt_state = put(_stack(
            [self.optimizer.init(p) for p, _ in inits]))
        # per-scene categorical distributions, (S, edges, ops)
        self.p = {
            k: np.full((n, NUM_EDGES, config.num_ops),
                       1.0 / config.num_ops)
            for k in ("normal", "reduce")
        }
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()

    # -- sharded step builders ------------------------------------------

    def _specs(self):
        sh = lambda spec: NamedSharding(self.mesh, spec)
        scene = sh(P(SCENE_AXIS))
        return scene, sh(P())

    def _make_train_step(self):
        optimizer = self.optimizer
        maxdisp = self.cfg.maxdisp
        mesh = self.mesh

        def one_scene(params, stats, opt_state, lr, left, right, disp_gt,
                      fea_ops, mat_ops):
            # blocks carry a leading scene axis of local size 1
            params, stats, opt_state = jax.tree_util.tree_map(
                lambda x: x[0], (params, stats, opt_state))
            left, right, disp_gt = left[0], right[0], disp_gt[0]
            fea_ops, mat_ops = fea_ops[0], mat_ops[0]

            def loss_fn(p):
                disp, new_stats = supernet_forward(
                    p, stats, left, right, fea_ops, mat_ops, train=True,
                    maxdisp=maxdisp)
                loss, mask = supervised_loss(disp, disp_gt, maxdisp)
                return loss, (disp, new_stats, mask)

            (loss, (disp, new_stats, mask)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda q, u: q - lr * u,
                                            params, updates)
            scalars = {"loss": loss, **stereo_metrics(disp, disp_gt, mask)}
            ex = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
            return ex(params), ex(new_stats), ex(opt_state), ex(scalars)

        s = P(SCENE_AXIS)
        sharded = jax.shard_map(
            one_scene, mesh=mesh,
            in_specs=(s, s, s, P(), s, s, s, s, s),
            out_specs=(s, s, s, s))
        return jax.jit(sharded)

    def _make_eval_step(self):
        maxdisp = self.cfg.maxdisp
        mesh = self.mesh

        def one_scene(params, stats, left, right, disp_gt, fea_ops, mat_ops):
            params, stats = jax.tree_util.tree_map(
                lambda x: x[0], (params, stats))
            disp, _ = supernet_forward(
                params, stats, left[0], right[0], fea_ops[0], mat_ops[0],
                train=False, maxdisp=maxdisp)
            loss, mask = supervised_loss(disp, disp_gt[0], maxdisp)
            scalars = {"loss": loss,
                       **stereo_metrics(disp, disp_gt[0], mask)}
            return jax.tree_util.tree_map(lambda x: x[None], scalars)

        s = P(SCENE_AXIS)
        sharded = jax.shard_map(one_scene, mesh=mesh,
                                in_specs=(s, s, s, s, s, s, s),
                                out_specs=s)
        return jax.jit(sharded)

    # -- search loop ----------------------------------------------------

    def genotypes(self) -> List[Genotype]:
        return [parse_genotype(self.p["normal"][i], self.p["reduce"][i])
                for i in range(self.num_scenes)]

    def search(self, train_datas: Sequence) -> List[Genotype]:
        """Run all scenes' searches; returns the per-scene best-by-valid
        genotypes. train_datas: one dataset per scene (StereoDataset /
        SyntheticStereoDataset facade)."""
        cfg = self.cfg
        n = self.num_scenes
        assert len(train_datas) == n, (len(train_datas), n)
        # mirror CellSearch.search's per-task streams exactly
        rngs = [np.random.default_rng(self.scene_seeds[t] + 1000 * t)
                for t in range(n)]
        splits = [split_half(len(d), seed=self.scene_seeds[t] + 1000 * t)
                  for t, d in enumerate(train_datas)]

        h_e = {k: np.zeros((n, NUM_EDGES, cfg.num_ops), np.int64)
               for k in self.p}
        h_a = {k: np.zeros((n, NUM_EDGES, cfg.num_ops), np.float64)
               for k in self.p}
        best_loss = np.full(n, np.inf)
        best_p = [None] * n
        best_params = self.params

        rep = NamedSharding(self.mesh, P(SCENE_AXIS))
        put = lambda a: jax.device_put(jnp.asarray(a), rep)

        for epoch in range(cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch, cfg.lr_min)
            ops = {
                k: np.stack([
                    np.array([rngs[t].choice(cfg.num_ops, p=self.p[k][t][e])
                              for e in range(NUM_EDGES)], np.int32)
                    for t in range(n)])
                for k in self.p
            }
            fea_ops = put(ops["normal"])
            mat_ops = put(ops["reduce"])

            train_m = [AverageMeterDict() for _ in range(n)]
            iters = [d.batches(cfg.batch, True, seed=epoch,
                               indices=splits[t][0])
                     for t, d in enumerate(train_datas)]
            for bs in zip(*iters):
                left = put(np.stack([b["left"] for b in bs]))
                right = put(np.stack([b["right"] for b in bs]))
                gt = put(np.stack([b["disparity"] for b in bs]))
                self.params, self.stats, self.opt_state, scalars = \
                    self._train_step(self.params, self.stats,
                                     self.opt_state, lr, left, right, gt,
                                     fea_ops, mat_ops)
                sc = jax.device_get(scalars)
                for t in range(n):
                    train_m[t].update({k: float(v[t])
                                       for k, v in sc.items()})

            valid_m = [AverageMeterDict() for _ in range(n)]
            iters = [d.batches(cfg.batch, False, seed=0,
                               indices=splits[t][1])
                     for t, d in enumerate(train_datas)]
            for bs in zip(*iters):
                left = put(np.stack([b["left"] for b in bs]))
                right = put(np.stack([b["right"] for b in bs]))
                gt = put(np.stack([b["disparity"] for b in bs]))
                scalars = self._eval_step(self.params, self.stats, left,
                                          right, gt, fea_ops, mat_ops)
                sc = jax.device_get(scalars)
                for t in range(n):
                    valid_m[t].update({k: float(v[t])
                                       for k, v in sc.items()})

            for t in range(n):
                vm = valid_m[t].mean()
                quality = 1.0 - min(max(vm.get("D1", 1.0), 0.0), 1.0)
                self.log(f"[scene-par search t{t}] epoch {epoch} "
                         f"valid loss {vm.get('loss', 0):.3f} "
                         f"quality {quality:.3f}")
                for k in self.p:
                    for e in range(NUM_EDGES):
                        h_e[k][t, e, ops[k][t][e]] += 1
                        h_a[k][t, e, ops[k][t][e]] = quality
            # vectorized pairwise update over all scenes at once; the
            # best-by-valid snapshot records the UPDATED p (sequential
            # CellSearch order)
            for k in self.p:
                self.p[k] = mdenas_update(self.p[k], h_e[k], h_a[k],
                                          cfg.lr_a)
            vloss = np.array([valid_m[t].mean().get("loss", np.inf)
                              for t in range(n)])
            improved = vloss < best_loss
            for t in np.nonzero(improved)[0]:
                best_loss[t] = vloss[t]
                best_p[t] = {k: self.p[k][t].copy() for k in self.p}
            if improved.any():
                # per-scene best-supernet snapshot (sequential CellSearch
                # restores it at the end), vectorized over the scene axis
                imp = jnp.asarray(improved)
                sel = lambda new, old: jnp.where(
                    imp.reshape((n,) + (1,) * (new.ndim - 1)), new, old)
                best_params = jax.tree_util.tree_map(sel, self.params,
                                                     best_params)

        self.params = best_params
        out = []
        for t in range(n):
            if best_p[t] is not None:
                for k in self.p:
                    self.p[k][t] = best_p[t][k]
            out.append(parse_genotype(self.p["normal"][t],
                                      self.p["reduce"][t]))
            self.log(f"[scene-par search t{t}] best genotype: {out[-1]}")
        return out
