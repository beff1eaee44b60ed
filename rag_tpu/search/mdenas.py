"""MdeNAS: multinomial-sampling architecture search with the pairwise
epoch/accuracy probability update.

Reference: src/automl/mdenas_search.py. Per epoch: sample one op per edge
from the categorical p, train that single path for an epoch, score it on the
held-out half, then update p with the pairwise differential rule
(:124-147):

    dh_e[i,j] = h_e[j] - h_e[i];  dh_a likewise
    vector1[j] = #{i : h_e[j] < h_e[i]  and  h_a[j] > h_a[i]}
    vector2[j] = #{i : h_e[j] > h_e[i]  and  h_a[j] < h_a[i]}
    p += lr_a * (vector1 - vector2);  p = softmax(p)

(op j gains mass when it achieved more with fewer training epochs.)

The update is host-side numpy — tiny state, no reason to trace it. The
trained supernet runs as ONE compiled executable across all epochs (op
choices are traced inputs — see rag_tpu.models.supernet).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag_tpu.metrics.stereo import stereo_metrics
from rag_tpu.models.supernet import NUM_EDGES, init_supernet, supernet_forward
from rag_tpu.search.genotype import Genotype, parse_genotype
from rag_tpu.train.trainer import cosine_lr, make_optimizer, supervised_loss
from rag_tpu.metrics.meters import AverageMeterDict
from rag_tpu.data.stereo_dataset import split_half


def mdenas_update(p: np.ndarray, h_e: np.ndarray, h_a: np.ndarray,
                  lr_a: float) -> np.ndarray:
    """One pairwise probability update (vectorized over leading dims).

    p, h_e, h_a: (..., num_ops). Returns the new softmaxed p.
    """
    dh_e = h_e[..., None, :] - h_e[..., :, None]  # [.., i, j] = h[j]-h[i]
    dh_a = h_a[..., None, :] - h_a[..., :, None]
    v1 = np.sum((dh_e < 0) & (dh_a > 0), axis=-2)
    v2 = np.sum((dh_e > 0) & (dh_a < 0), axis=-2)
    p = p + lr_a * (v1 - v2).astype(np.float64)
    e = np.exp(p - p.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


@dataclasses.dataclass
class CellSearchConfig:
    epochs: int = 100
    batch: int = 8
    lr: float = 0.002
    lr_a: float = 0.01
    weight_decay: float = 3e-4
    lr_min: float = 0.001
    grad_clip: float = 5.0
    num_ops: int = 2
    seed: int = 0
    maxdisp: int = 192


class CellSearch:
    """Searches one Genotype per task on a fresh supernet (the reference
    throws the supernet away between tasks, rag.py:224).

    mesh: optional dp mesh — the supernet train/eval steps run shard_map'd
    over 'data' with exact single-device semantics (grads psum'd, BN batch
    stats pmean'd, masked losses/metrics psum'd by parts; see
    rag_tpu.parallel.axis). The sampled ops stay replicated host-side
    numpy, so every shard trains the SAME single path."""

    def __init__(self, config: CellSearchConfig, log: Optional[Callable] = print,
                 mesh=None):
        self.cfg = config
        self.log = log or (lambda *_: None)
        self.mesh = mesh
        key = jax.random.PRNGKey(config.seed)
        self.params, self.stats = self._init_net(key)
        self.optimizer = make_optimizer(config.weight_decay, config.grad_clip)
        self.opt_state = self.optimizer.init(self.params)
        self.p = {
            "normal": np.full((NUM_EDGES, config.num_ops), 1.0 / config.num_ops),
            "reduce": np.full((NUM_EDGES, config.num_ops), 1.0 / config.num_ops),
        }
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()

    @staticmethod
    def _init_net(key):
        return init_supernet(key)

    @staticmethod
    def _batch_args(b):
        return (b["left"], b["right"], b["disparity"])

    @staticmethod
    def _quality(vm):
        """Reward quality in [0,1], higher=better (1 - valid_D1)."""
        return 1.0 - min(max(vm.get("D1", 1.0), 0.0), 1.0)

    def _make_train_step(self):
        from rag_tpu.parallel.axis import bn_collective, data_axis, shard_jit

        optimizer = self.optimizer
        maxdisp = self.cfg.maxdisp
        axis = data_axis(self.mesh)

        def step(params, stats, opt_state, lr, left, right, disp_gt,
                 fea_ops, mat_ops):
            def loss_fn(p):
                disp, new_stats = supernet_forward(
                    p, stats, left, right, fea_ops, mat_ops, train=True,
                    maxdisp=maxdisp)
                loss, mask = supervised_loss(disp, disp_gt, maxdisp,
                                             axis=axis)
                return loss, (disp, new_stats, mask)

            with bn_collective(axis):
                (loss, (disp, new_stats, mask)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            if axis is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.psum(g, axis), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda q, u: q - lr * u, params, updates)
            scalars = {"loss": loss,
                       **stereo_metrics(disp, disp_gt, mask, axis)}
            return params, new_stats, opt_state, scalars

        if axis is None:
            return jax.jit(step)
        return shard_jit(self.mesh, step, "rrrsdddrr")

    def _make_eval_step(self):
        from rag_tpu.parallel.axis import data_axis, shard_jit

        maxdisp = self.cfg.maxdisp
        axis = data_axis(self.mesh)

        def step(params, stats, left, right, disp_gt, fea_ops, mat_ops):
            disp, _ = supernet_forward(
                params, stats, left, right, fea_ops, mat_ops, train=False,
                maxdisp=maxdisp)
            loss, mask = supervised_loss(disp, disp_gt, maxdisp, axis=axis)
            return {"loss": loss, **stereo_metrics(disp, disp_gt, mask, axis)}

        if axis is None:
            return jax.jit(step)
        return shard_jit(self.mesh, step, "rrdddrr")

    def genotype(self) -> Genotype:
        return parse_genotype(self.p["normal"], self.p["reduce"])

    # -- mid-search checkpointing (SURVEY.md §5: the reference loses any
    #    crash back to the last per-task ckpt; search state included here).
    #    The checkpoint carries EVERYTHING the loop depends on — including
    #    the numpy Generator bit state and the best-by-valid snapshot — so
    #    an interrupted+resumed search is bit-identical to an uninterrupted
    #    one (pinned in tests/test_resume.py).

    def save_state(self, path: str, epoch: int, h_e, h_a, rng,
                   best_loss, best_p, best_params):
        import json as _json
        import numpy as _np
        import os as _os

        d = _os.path.dirname(path)
        if d:
            # defensive: a vanished/missing parent dir must not kill a
            # 100-epoch stage (the round-2 canonical_r2b crash)
            _os.makedirs(d, exist_ok=True)
        flat, _ = jax.tree_util.tree_flatten((self.params, self.stats,
                                              self.opt_state))
        extras = {}
        if best_p is not None:
            extras["bestp_normal"] = best_p["normal"]
            extras["bestp_reduce"] = best_p["reduce"]
        if best_params is not None:
            bflat, _ = jax.tree_util.tree_flatten(best_params)
            extras.update({f"bleaf_{i}": _np.asarray(l)
                           for i, l in enumerate(bflat)})
        tmp = path + ".tmp.npz"
        _np.savez(tmp,
                  epoch=epoch,
                  rng_state=_json.dumps(rng.bit_generator.state),
                  best_loss=best_loss,
                  p_normal=self.p["normal"], p_reduce=self.p["reduce"],
                  he_normal=h_e["normal"], he_reduce=h_e["reduce"],
                  ha_normal=h_a["normal"], ha_reduce=h_a["reduce"],
                  **extras,
                  **{f"leaf_{i}": _np.asarray(l) for i, l in enumerate(flat)})
        _os.replace(tmp, path)

    def load_state(self, path: str, rng):
        """Restores p/params/stats/opt and the rng bit state; returns
        (start_epoch, h_e, h_a, best_loss, best_p, best_params)."""
        import json as _json
        import numpy as _np

        data = _np.load(path)
        self.p = {"normal": data["p_normal"], "reduce": data["p_reduce"]}
        h_e = {"normal": data["he_normal"], "reduce": data["he_reduce"]}
        h_a = {"normal": data["ha_normal"], "reduce": data["ha_reduce"]}
        _, treedef = jax.tree_util.tree_flatten((self.params, self.stats,
                                                 self.opt_state))
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
        self.params, self.stats, self.opt_state = \
            jax.tree_util.tree_unflatten(treedef, leaves)
        if "rng_state" in data.files:
            rng.bit_generator.state = _json.loads(str(data["rng_state"]))
        best_loss = float(data["best_loss"]) if "best_loss" in data.files \
            else np.inf
        best_p = None
        if "bestp_normal" in data.files:
            best_p = {"normal": data["bestp_normal"],
                      "reduce": data["bestp_reduce"]}
        best_params = None
        nb = len([k for k in data.files if k.startswith("bleaf_")])
        if nb:
            _, ptreedef = jax.tree_util.tree_flatten(self.params)
            bleaves = [jnp.asarray(data[f"bleaf_{i}"]) for i in range(nb)]
            best_params = jax.tree_util.tree_unflatten(ptreedef, bleaves)
        return (int(data["epoch"]) + 1, h_e, h_a, best_loss, best_p,
                best_params)

    def search(self, train_data, writer=None, task: int = 0,
               checkpoint_path: str = None, checkpoint_every: int = 10,
               resume: bool = False,
               stop_after: Optional[int] = None) -> Genotype:
        """Run the full MdeNAS loop; returns the best-by-valid-loss genotype.

        train_data: dataset exposing .batches(batch, shuffle, seed, indices).
        checkpoint_path: optional .npz for mid-search state; resume=True
        continues from it.
        """
        import os as _os

        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed + 1000 * task)
        train_idx, valid_idx = split_half(len(train_data),
                                          seed=cfg.seed + 1000 * task)

        h_e = {k: np.zeros((NUM_EDGES, cfg.num_ops), np.int64) for k in self.p}
        h_a = {k: np.zeros((NUM_EDGES, cfg.num_ops), np.float64) for k in self.p}
        best_loss, best_p, best_params = np.inf, None, None
        start_epoch = 0
        if resume and checkpoint_path and _os.path.exists(checkpoint_path):
            (start_epoch, h_e, h_a, best_loss, best_p, best_params) = \
                self.load_state(checkpoint_path, rng)
            self.log(f"[cell-search t{task}] resumed at epoch {start_epoch}")

        for epoch in range(start_epoch, cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch, cfg.lr_min)
            ops = {
                k: np.array([rng.choice(cfg.num_ops, p=self.p[k][e])
                             for e in range(NUM_EDGES)], np.int32)
                for k in self.p
            }
            fea_ops = jnp.asarray(ops["normal"])
            mat_ops = jnp.asarray(ops["reduce"])

            # fetches are deferred to one bulk transfer per loop: a
            # per-step float() fetch serializes every step on a relay
            # round trip (values are bit-identical either way)
            outs = []
            for b in train_data.batches(cfg.batch, True, seed=epoch,
                                        indices=train_idx):
                self.params, self.stats, self.opt_state, scalars = self._train_step(
                    self.params, self.stats, self.opt_state, lr,
                    *self._batch_args(b), fea_ops, mat_ops)
                outs.append(scalars)
            train_m = AverageMeterDict().update_batched(outs)

            valid_m = AverageMeterDict().update_batched(
                [self._eval_step(self.params, self.stats,
                                 *self._batch_args(b), fea_ops, mat_ops)
                 for b in train_data.batches(cfg.batch, False, seed=0,
                                             indices=valid_idx)])

            tm, vm = train_m.mean(), valid_m.mean()
            quality = self._quality(vm)
            self.log(
                f"[cell-search t{task}] epoch {epoch} lr {lr:.4f} "
                f"train loss {tm.get('loss', 0):.3f} "
                f"valid loss {vm.get('loss', 0):.3f} quality {quality:.3f}")
            if writer is not None:
                writer.scalars(f"search_cell/task{task}",
                               {"train_loss": tm.get("loss", 0.0),
                                "valid_loss": vm.get("loss", 0.0),
                                "quality": quality}, step=epoch)

            # h_e / h_a bookkeeping and the pairwise update (per cell type)
            for k in self.p:
                for e in range(NUM_EDGES):
                    h_e[k][e, ops[k][e]] += 1
                    h_a[k][e, ops[k][e]] = quality
                self.p[k] = mdenas_update(self.p[k], h_e[k], h_a[k], cfg.lr_a)

            if vm.get("loss", np.inf) < best_loss:
                best_loss = vm.get("loss", np.inf)
                best_p = {k: v.copy() for k, v in self.p.items()}
                best_params = jax.tree_util.tree_map(lambda x: x, self.params)

            if checkpoint_path and (epoch + 1) % checkpoint_every == 0:
                self.save_state(checkpoint_path, epoch, h_e, h_a, rng,
                                best_loss, best_p, best_params)
            if stop_after is not None and epoch + 1 >= stop_after:
                # fault injection for resume tests: simulate a kill AFTER
                # the checkpoint write (no best-restore happens)
                return self.genotype()

        if best_p is not None:
            self.p = best_p
        if best_params is not None:
            self.params = best_params
        geno = self.genotype()
        self.log(f"[cell-search t{task}] best genotype: {geno}")
        return geno


class DepthCellSearch(CellSearch):
    """MdeNAS over the depth supernet (rag_depth variant): monocular input,
    2D matching half, silog objective, delta1 reward quality."""

    @staticmethod
    def _init_net(key):
        from rag_tpu.models.supernet import init_depth_supernet

        return init_depth_supernet(key)

    @staticmethod
    def _batch_args(b):
        return (b["image"], b["depth"])

    @staticmethod
    def _quality(vm):
        return min(max(vm.get("d1", 0.0), 0.0), 1.0)

    def _make_train_step(self):
        from rag_tpu.metrics.depth import depth_metrics
        from rag_tpu.models.supernet import depth_supernet_forward
        from rag_tpu.parallel.axis import bn_collective, data_axis, shard_jit
        from rag_tpu.train.losses import silog_loss

        optimizer = self.optimizer
        axis = data_axis(self.mesh)

        def step(params, stats, opt_state, lr, image, depth_gt,
                 fea_ops, mat_ops):
            def loss_fn(p):
                pred, new_stats = depth_supernet_forward(
                    p, stats, image, fea_ops, mat_ops, train=True)
                mask = depth_gt > 0
                loss = silog_loss(pred, depth_gt, mask, axis=axis)
                return loss, (pred, new_stats, mask)

            with bn_collective(axis):
                (loss, (pred, new_stats, mask)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            if axis is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.psum(g, axis), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda q, u: q - lr * u,
                                            params, updates)
            scalars = {"loss": loss,
                       **depth_metrics(pred, depth_gt, mask, axis)}
            return params, new_stats, opt_state, scalars

        if axis is None:
            return jax.jit(step)
        return shard_jit(self.mesh, step, "rrrsddrr")

    def _make_eval_step(self):
        from rag_tpu.metrics.depth import depth_metrics
        from rag_tpu.models.supernet import depth_supernet_forward
        from rag_tpu.parallel.axis import data_axis, shard_jit
        from rag_tpu.train.losses import silog_loss

        axis = data_axis(self.mesh)

        def step(params, stats, image, depth_gt, fea_ops, mat_ops):
            pred, _ = depth_supernet_forward(
                params, stats, image, fea_ops, mat_ops, train=False)
            mask = depth_gt > 0
            loss = silog_loss(pred, depth_gt, mask, axis=axis)
            return {"loss": loss, **depth_metrics(pred, depth_gt, mask, axis)}

        if axis is None:
            return jax.jit(step)
        return shard_jit(self.mesh, step, "rrddrr")
