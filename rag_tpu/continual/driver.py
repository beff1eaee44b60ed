"""The continual-learning driver: the per-task search -> grow -> select ->
fine-tune pipeline and the forgetting-matrix evaluation loop.

Reference: src/approaches/rag.py (Appr) + src/run.py task loop. Per task t:
  1. cell search on a FRESH supernet -> genotype          (rag.py:221-236)
  2. t>0: expand; op search over reuse-vs-new; select     (rag.py:85-102)
  3. fine-tune archis[t] with SGD+cosine, best-by-valid-loss rollback
                                                          (rag.py:107-153)
After each task, evaluate every past task u<=t into the forgetting matrix
(run.py:175-192) and checkpoint (run.py:194-196 — plus the restore path the
reference never shipped; see rag_tpu.continual.state).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from rag_tpu.data.stereo_dataset import split_half
from rag_tpu.metrics.meters import AverageMeterDict, ForgettingMatrix
from rag_tpu.models.growable import GrowableStereoNet
from rag_tpu.search.genotype import Genotype, default_genotype
from rag_tpu.search.growth import OpSearch, OpSearchConfig
from rag_tpu.search.mdenas import CellSearch, CellSearchConfig
from rag_tpu.train.trainer import (
    cosine_lr,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from rag_tpu.utils.logging import MetricWriter


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 400
    batch: int = 4
    lr: float = 0.001
    weight_decay: float = 0.003
    grad_clip: float = 5.0


@dataclasses.dataclass
class ExperimentConfig:
    cell: CellSearchConfig = dataclasses.field(default_factory=CellSearchConfig)
    op: OpSearchConfig = dataclasses.field(default_factory=OpSearchConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    num_tasks: int = 4
    seed: int = 0
    skip_cell_search: bool = False  # use default_genotype() per task
    maxdisp: int = 192              # cost-volume depth = maxdisp // 3
    # Scene Router (paper capability the reference left dormant,
    # rag_model.py:369): train it incrementally per task inside the driver
    # and persist it with the checkpoints
    use_router: bool = False
    router_epochs: int = 3
    router_batch: int = 8
    # run every scene's (independent, fresh-supernet) cell search at once
    # over a 'scene' device mesh axis before the sequential grow/select/
    # fine-tune loop — a capability the reference's sequential loop can't
    # express (rag_tpu.search.scene_parallel); needs >= num_tasks devices
    scene_parallel_search: bool = False
    # device mesh for the experiment itself (green-field; the reference is
    # single-GPU, SURVEY.md §2.4): mesh_data-way data parallelism threads
    # through EVERY stage (cell search, op search, fine-tune) as shard_map
    # dp steps — Pallas kernels dispatch per shard, batch stats/grads/
    # losses reduce exactly (rag_tpu.parallel.axis). mesh_model > 1
    # additionally H-shards the cost volume in the stereo fine-tune via
    # the GSPMD path (rag_tpu.parallel.sharded). Stage batches that do not
    # divide by mesh_data fall back to single-device steps with a warning.
    mesh_data: int = 1
    mesh_model: int = 1


def _save_finetune_state(path, params, stats, opt_state, best, best_loss,
                         epoch):
    """Mid-fine-tune snapshot: live + best (params, stats), opt state,
    epoch. Arrays flattened under deterministic leaf indices."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten(
        (params, stats, opt_state, best[0], best[1]))
    tmp = path + ".tmp.npz"
    np.savez(tmp, epoch=epoch, best_loss=best_loss,
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(flat)})
    os.replace(tmp, path)


def _load_finetune_state(path, template):
    """template: (params, stats, opt_state) with the right treedef."""
    import jax.numpy as jnp

    data = np.load(path)
    params, stats, opt_state = template
    _, treedef = jax.tree_util.tree_flatten(
        (params, stats, opt_state, params, stats))
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    params, stats, opt_state, bp, bs = jax.tree_util.tree_unflatten(
        treedef, leaves)
    return (params, stats, opt_state, (bp, bs), float(data["best_loss"]),
            int(data["epoch"]) + 1)


class ContinualDriver:
    def __init__(self, config: ExperimentConfig,
                 writer: Optional[MetricWriter] = None,
                 log: Optional[Callable] = print,
                 checkpoint_dir: Optional[str] = None):
        self.cfg = config
        self.writer = writer or MetricWriter()
        self.log = log or (lambda *_: None)
        # absolute: a cwd change (or any relative-path confusion) mid-run
        # must not strand the 100-epoch stage checkpoints (round-2
        # canonical_r2b died writing to a relative stage-ckpt path)
        self.checkpoint_dir = (os.path.abspath(checkpoint_dir)
                               if checkpoint_dir else None)
        # mid-STAGE checkpoint cadence (epochs) for the long stages — the
        # reference loses any crash back to the last per-task ckpt
        # (SURVEY.md §5); 0 disables.
        self.stage_checkpoint_every = 10
        # fault-injection hook: stop fine-tune after this many epochs
        # (right after the mid-stage checkpoint write) — resume tests
        self._finetune_stop_after: Optional[int] = None
        self.net: Optional[GrowableStereoNet] = None
        self.router = None  # SceneRouter when cfg.use_router
        self.router_eval = None  # routed-vs-oracle report (router_report)
        # all six per-cell eval scalars — the reference prints the full
        # D1/EPE/Thres1-3 table per task (src/run.py:149-234)
        self.matrix = ForgettingMatrix(
            config.num_tasks,
            ("D1", "EPE", "loss", "Thres1", "Thres2", "Thres3"))
        self._eval_cache = {}
        # completed forgetting-row evals, {t: {u: {metric: float}}} —
        # persisted in every checkpoint's extra so a resumed slice never
        # re-runs a (t, u) eval whose result is already on disk (the r4
        # canonical run's post-wedge slices re-evaluated finished rows)
        self._eval_rows = {}
        # resume bookkeeping: the restored checkpoint's stage + task, so
        # train_task can skip a fine-tune that already completed
        self._resume_stage: Optional[str] = None
        self._resume_task: Optional[int] = None
        self.mesh = None
        if config.mesh_data * config.mesh_model > 1:
            from rag_tpu.parallel.mesh import make_mesh

            n = config.mesh_data * config.mesh_model
            avail = len(jax.devices())
            if n > avail:
                raise ValueError(
                    f"mesh {config.mesh_data}x{config.mesh_model} needs "
                    f"{n} devices, have {avail}")
            self.mesh = make_mesh(data=config.mesh_data,
                                  model=config.mesh_model,
                                  devices=jax.devices()[:n])
            self.log(f"[mesh] {config.mesh_data}-way dp"
                     + (f" x {config.mesh_model}-way spatial"
                        if config.mesh_model > 1 else "")
                     + f" over {n} devices")
        self._mesh_warned = set()

    # -- variant hooks (depth/selfsup drivers override these; everything
    #    else — stage checkpoints, resume, fault injection, eval caching —
    #    is shared machinery) ----------------------------------------------

    variant = "stereo"

    def _new_net(self, key, genotype):
        return GrowableStereoNet(key, genotype)

    def _cell_search_cls(self):
        return CellSearch

    def _mesh_for(self, batch: int, stage: str, dp_only: bool = True):
        """The mesh a stage's steps should shard over, or None.

        Falls back to single-device (with a one-time warning) when the
        stage's batch does not divide by mesh_data, or when the stage only
        supports shard_map dp (dp_only) but mesh_model > 1."""
        if self.mesh is None:
            return None
        reason = None
        if batch % self.cfg.mesh_data != 0:
            reason = (f"batch {batch} not divisible by "
                      f"mesh_data {self.cfg.mesh_data}")
        elif dp_only and self.cfg.mesh_model > 1:
            reason = (f"stage supports dp only; mesh_model="
                      f"{self.cfg.mesh_model}")
        if reason is not None:
            if stage not in self._mesh_warned:
                self._mesh_warned.add(stage)
                self.log(f"[mesh] {stage}: {reason} -> single-device steps")
            return None
        if dp_only and self.cfg.mesh_model == 1:
            return self.mesh
        if not dp_only:
            return self.mesh
        return None

    def _ft_steps(self, specs, trainable, optimizer):
        """(train_step, eval_step) for the fine-tune stage: BN stats update
        only for the task's own new units (frozen-BN reuse semantics).
        With a mesh, the steps shard over it (pure-dp keeps the Pallas
        kernels; mesh_model>1 H-shards the cost volume via GSPMD)."""
        mesh = self._mesh_for(self.cfg.train.batch, "fine-tune",
                              dp_only=False)
        if mesh is not None:
            from rag_tpu.parallel.sharded import (
                make_sharded_eval_step,
                make_sharded_train_step,
            )

            return (make_sharded_train_step(mesh, specs, trainable,
                                            optimizer,
                                            maxdisp=self.cfg.maxdisp),
                    make_sharded_eval_step(mesh, specs,
                                           maxdisp=self.cfg.maxdisp))
        return (make_train_step(specs, trainable, optimizer,
                                maxdisp=self.cfg.maxdisp),
                make_eval_step(specs, maxdisp=self.cfg.maxdisp))

    def _eval_step_for(self, specs):
        return make_eval_step(specs, maxdisp=self.cfg.maxdisp)

    def _batch_args(self, b):
        return (b["left"], b["right"], b["disparity"])

    def _ft_tag(self) -> str:
        return "train"

    def _ft_log_line(self, v) -> str:
        return (f"D1 {100*v.get('D1', 0):.1f}% EPE {v.get('EPE', 0):.3f}"
                if "D1" in v else
                f"silog {v.get('silog', 0):.3f} d1 {v.get('d1', 0):.3f}")

    # -- stages ------------------------------------------------------------

    def _stage_ckpt(self, name: str) -> Optional[str]:
        """Path for a mid-stage checkpoint file (None when disabled)."""
        if not self.checkpoint_dir or not self.stage_checkpoint_every:
            return None
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        return os.path.join(self.checkpoint_dir, name)

    def parallel_cell_search(self, train_datasets: Sequence) -> None:
        """Stage-1 hoist: all scenes' cell searches in one wall-clock pass
        over a 'scene' mesh axis. Results land in the same per-task
        genotype artifacts search_cell consumes, so the sequential loop
        (and resume) picks them up transparently."""
        from rag_tpu.search.scene_parallel import SceneParallelCellSearch

        n = self.cfg.num_tasks
        todo = [t for t in range(n) if not self._have_genotype(t)]
        if not todo or self.cfg.skip_cell_search:
            return
        if len(jax.devices()) < n:
            self.log(f"[scene-par] only {len(jax.devices())} devices for "
                     f"{n} scenes; falling back to sequential searches")
            return
        sp = SceneParallelCellSearch(
            dataclasses.replace(self.cfg.cell, maxdisp=self.cfg.maxdisp),
            num_scenes=n, log=self.log,
            scene_seeds=[self.cfg.cell.seed + t for t in range(n)])
        genos = sp.search(list(train_datasets[:n]))
        self._pre_genotypes = dict(enumerate(genos))
        for t, geno in enumerate(genos):
            geno_file = self._stage_ckpt(f"genotype_t{t}.json")
            if geno_file:
                from rag_tpu.continual.state import _geno_json
                import json

                with open(geno_file, "w") as f:
                    json.dump(_geno_json(geno), f)

    def _have_genotype(self, t: int) -> bool:
        if getattr(self, "_pre_genotypes", {}).get(t) is not None:
            return True
        geno_file = self._stage_ckpt(f"genotype_t{t}.json")
        return bool(geno_file and os.path.exists(geno_file))

    def search_cell(self, t: int, train_data) -> Genotype:
        if self.cfg.skip_cell_search:
            return default_genotype()
        pre = getattr(self, "_pre_genotypes", {}).get(t)
        if pre is not None:
            self.log(f"[task {t}] using scene-parallel searched genotype")
            return pre
        # stage-result artifact: a completed cell search never re-runs on
        # resume (its mid-stage ckpt is consumed below)
        geno_file = self._stage_ckpt(f"genotype_t{t}.json")
        if geno_file and os.path.exists(geno_file):
            from rag_tpu.continual.state import _geno_from
            import json

            with open(geno_file) as f:
                geno = _geno_from(json.load(f))
            self.log(f"[task {t}] loaded searched genotype from {geno_file}")
            return geno
        cs = self._cell_search_cls()(
            dataclasses.replace(self.cfg.cell,
                                seed=self.cfg.cell.seed + t,
                                maxdisp=self.cfg.maxdisp),
            log=self.log,
            mesh=self._mesh_for(self.cfg.cell.batch, "cell-search"))
        ckpt = self._stage_ckpt(f"cellsearch_t{t}.npz")
        geno = cs.search(train_data, writer=self.writer, task=t,
                         checkpoint_path=ckpt,
                         checkpoint_every=self.stage_checkpoint_every,
                         resume=bool(ckpt and os.path.exists(ckpt)))
        if geno_file:
            from rag_tpu.continual.state import _geno_json
            import json

            with open(geno_file, "w") as f:
                json.dump(_geno_json(geno), f)
        if ckpt and os.path.exists(ckpt):
            os.remove(ckpt)
        return geno

    def _op_search_cfg(self) -> OpSearchConfig:
        """The op-search config for this variant (selfsup overrides the
        split fraction + proxy-eval truncation)."""
        return dataclasses.replace(self.cfg.op, maxdisp=self.cfg.maxdisp)

    def _search_data_for(self, t: int, train_data):
        """Data the op search trains/scores on (selfsup: color-matched
        proxy pairs, src_self/approaches/rag.py:313-317)."""
        return train_data

    def _op_search_variant(self) -> str:
        """Key into rag_tpu.search.growth.VARIANTS (selfsup searches with
        the supervised stereo steps on proxy data, like the reference)."""
        return "depth" if self.variant == "depth" else "stereo"

    def _pre_finetune(self, t: int) -> None:
        """Hook before the fine-tune stage (selfsup: supervised pretrain)."""

    def train_task(self, t: int, train_data, valid_data):
        """Full per-task pipeline (Appr.train, rag.py:79-105). ONE
        implementation for every variant — the deltas live in the _op_*/
        _pre_finetune/_ft_* hooks."""
        if self.net is not None and len(self.net.archis) > t:
            if self._resume_stage == "trained" and self._resume_task == t:
                # fine-tune completed and was written back before the
                # kill; only the forgetting-row evals remain (run() does
                # them). Re-entering fine_tune here would restart the
                # stage from epoch 0 — its mid-stage file is gone.
                self._resume_stage = None
                self.log(f"[task {t}] resumed post-fine-tune; "
                         f"evaluation only")
                return
            # resumed mid-task AFTER select (archis[t] exists): the search
            # stages are done, go straight to the fine-tune stage.
            self.log(f"[task {t}] resumed post-select; fine-tune only")
            self.writer.scalars("model_size_m",
                                {"params_m": self.net.size_m()}, step=t)
            self._pre_finetune(t)
            self.fine_tune(t, train_data, valid_data)
            return
        genotype = self.search_cell(t, train_data)
        key = jax.random.PRNGKey(self.cfg.seed + 31 * t)
        if t == 0:
            self.net = self._new_net(key, genotype)
        else:
            self.net.expand(key, t, genotype)
            ckpt = self._stage_ckpt(f"opsearch_t{t}.npz")
            op_cfg = self._op_search_cfg()
            OpSearch(self.net, op_cfg, log=self.log,
                     variant=self._op_search_variant(),
                     mesh=self._mesh_for(op_cfg.batch, "op-search")).search(
                t, self._search_data_for(t, train_data), writer=self.writer,
                checkpoint_path=ckpt,
                checkpoint_every=self.stage_checkpoint_every,
                resume=bool(ckpt and os.path.exists(ckpt)))
            if ckpt and os.path.exists(ckpt):
                os.remove(ckpt)
            best = self.net.select(t)
            self.log(f"[task {t}] best_archi = {best}")
            self.writer.text(f"archi/task{t}", str(best))
        if self.checkpoint_dir:
            # mid-task stage checkpoint: a crash during fine-tune resumes
            # here instead of redoing the searches
            from rag_tpu.continual.state import save_checkpoint
            save_checkpoint(self.checkpoint_dir, self.net, task=t,
                            extra=self._ckpt_extra(stage="selected"))
        self.writer.scalars("model_size_m", {"params_m": self.net.size_m()},
                            step=t)
        self._pre_finetune(t)
        self.fine_tune(t, train_data, valid_data)

    def fine_tune(self, t: int, train_data, valid_data):
        """Stage-3 training of archis[t] (rag.py:107-153). Shared across
        variants through the _ft_* hooks — so stage checkpoints / resume /
        fault injection exist on EVERY fine-tune path, not just the
        supervised stereo one."""
        cfg = self.cfg.train
        net = self.net
        arch = net.archis[t]
        trainable = net.trainable_sites(t)
        specs, params, stats = net.path(arch)
        optimizer = make_optimizer(cfg.weight_decay, cfg.grad_clip)
        train_step, eval_step = self._ft_steps(specs, trainable, optimizer)
        opt_state = optimizer.init(params)
        tag = self._ft_tag()

        best_loss = np.inf
        best = (params, stats)
        start_epoch = 0
        ckpt = self._stage_ckpt(f"finetune_t{t}.npz")
        if ckpt and os.path.exists(ckpt):
            params, stats, opt_state, best, best_loss, start_epoch = \
                _load_finetune_state(ckpt, (params, stats, opt_state))
            self.log(f"[{tag} t{t}] resumed at epoch {start_epoch}")
        for epoch in range(start_epoch, cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch)
            for b in train_data.batches(cfg.batch, True, seed=epoch):
                params, stats, opt_state, _ = train_step(
                    params, stats, opt_state, lr, *self._batch_args(b))

            # the reference evaluates BOTH the train and the valid loader
            # each epoch (rag.py:129-131); best-by-valid drives rollback.
            # Batched fetch: queue every eval before the single transfer
            # (per-batch float() fetches serialized the loop on relay
            # round trips and dominated canonical epoch wall time).
            tm = AverageMeterDict().update_batched(
                [eval_step(params, stats, *self._batch_args(b))
                 for b in train_data.batches(cfg.batch, False, seed=0)])
            vm = AverageMeterDict().update_batched(
                [eval_step(params, stats, *self._batch_args(b))
                 for b in valid_data.batches(cfg.batch, False, seed=0)])
            tv, v = tm.mean(), vm.mean()
            self.log(f"[{tag} t{t}] epoch {epoch} lr {lr:.5f} "
                     f"train loss {tv.get('loss', 0):.3f} "
                     f"valid loss {v.get('loss', 0):.3f} "
                     + self._ft_log_line(v))
            self.writer.scalars(f"{tag}/task{t}", v, step=epoch)
            self.writer.scalars(f"{tag}/task{t}_trainset", tv, step=epoch)
            if v.get("loss", np.inf) < best_loss:
                best_loss = v.get("loss", np.inf)
                best = (params, stats)
            if ckpt and (epoch + 1) % self.stage_checkpoint_every == 0:
                _save_finetune_state(ckpt, params, stats, opt_state, best,
                                     best_loss, epoch)
            if (self._finetune_stop_after is not None
                    and epoch + 1 >= self._finetune_stop_after):
                return  # simulated kill (after the checkpoint write)
        params, stats = best
        net.write_back(arch, params, stats)
        if self.checkpoint_dir:
            # the fine-tune is DONE: persist it before deleting the
            # mid-stage file. Without this, a kill in the window between
            # stage-file deletion and the post-eval task_done save loses
            # the whole stage — the r4 canonical run redid task 2's
            # 60-epoch fine-tune from scratch twice for exactly this.
            from rag_tpu.continual.state import save_checkpoint
            save_checkpoint(self.checkpoint_dir, net, task=t,
                            extra=self._ckpt_extra(stage="trained"))
        if ckpt and os.path.exists(ckpt):
            os.remove(ckpt)

    def evaluate(self, u: int, test_data, batch: int = 1):
        """Eval task u with its stored path (rag.py:408-441)."""
        net = self.net
        arch = net.archis[u]
        specs, params, stats = net.path(arch)
        key = tuple(sorted((k, s) for k, s in specs.items()))
        if key not in self._eval_cache:
            self._eval_cache[key] = self._eval_step_for(specs)
        eval_step = self._eval_cache[key]
        m = AverageMeterDict().update_batched(
            [eval_step(params, stats, *self._batch_args(b))
             for b in test_data.batches(batch, False, seed=0,
                                        drop_last=False)])
        return m.mean()

    def train_router(self, t: int, train_datasets, test_datasets):
        """Incremental Scene-Router training after task t on all scenes
        seen so far (new build of the paper's dormant hook,
        rag_model.py:369)."""
        from rag_tpu.models.router import SceneRouter

        if t == 0:
            # one path exists — routing is trivial, and single-class
            # training would only skew the classifier toward label 0
            return
        if self.router is None:
            key = "image" if self.variant == "depth" else "left"
            self.router = SceneRouter(self.cfg.num_tasks, seed=self.cfg.seed,
                                      input_key=key)
        self.router.train(train_datasets[:t + 1],
                          epochs=self.cfg.router_epochs,
                          batch=self.cfg.router_batch, log=self.log)
        self.router.trained_task = t  # persisted by save_router: lets a
        # resume detect a router.npz staler than the latest task_done
        acc = self.router.accuracy(test_datasets[:t + 1])
        self.log(f"[router] after task {t}: scene accuracy {100*acc:.1f}%")
        self.writer.scalars("router", {"accuracy": acc}, step=t)

    def _routed_eval(self, u: int, test_data, confusion) -> dict:
        """Per-frame routed evaluation of one scene's test set: route each
        frame, run it through the PREDICTED task's path. Variant-generic
        via the _batch_args/_eval_step_for hooks."""
        n = len(self.net.archis)
        m = AverageMeterDict()
        for b in test_data.batches(1, False, seed=0, drop_last=False):
            pred = self.router.predict(b[self.router.input_key])
            t = min(int(pred[0]), n - 1)
            confusion[u, t] += 1
            arch = self.net.archis[t]
            specs, params, stats = self.net.path(arch)
            key = tuple(sorted((k, s) for k, s in specs.items()))
            if key not in self._eval_cache:
                self._eval_cache[key] = self._eval_step_for(specs)
            scalars = self._eval_cache[key](params, stats,
                                            *self._batch_args(b))
            m.update({k: float(v) for k, v in scalars.items()})
        return m.mean()

    def router_report(self, test_datasets) -> Optional[dict]:
        """Routed-vs-oracle evidence: evaluate every scene's test set (a)
        with per-frame routed paths and (b) with the ground-truth task path,
        plus the router confusion matrix. This is the number the paper's
        Scene-Router claim rests on; the reference's dormant hook
        (src/models/rag_model.py:369, src/run.py:180) never produced it."""
        if self.router is None or self.net is None:
            return None
        n = len(self.net.archis)
        confusion = np.zeros((n, n), np.int64)
        routed, oracle = [], []
        for u in range(n):
            routed.append(self._routed_eval(u, test_datasets[u], confusion))
            oracle.append(self.evaluate(u, test_datasets[u]))
        keys = sorted(set().union(*[set(r) for r in routed + oracle]))
        report = {"routed": {k: [float(r.get(k, 0.0)) for r in routed]
                             for k in keys},
                  "oracle": {k: [float(o.get(k, 0.0)) for o in oracle]
                             for k in keys},
                  "confusion": confusion.tolist(),
                  "router_accuracy": float(np.trace(confusion)
                                           / max(confusion.sum(), 1))}
        head = "D1" if "D1" in keys else ("silog" if "silog" in keys else
                                          keys[0] if keys else None)
        if head is not None:
            delta = float(np.mean(report["routed"][head])
                          - np.mean(report["oracle"][head]))
            report[f"routed_minus_oracle_{head}"] = delta
            # flat aliases for the headline metric (BASELINE.md tables)
            report[f"routed_{head}"] = report["routed"][head]
            report[f"oracle_{head}"] = report["oracle"][head]
            self.log(
                f"[router] routed-vs-oracle {head} delta {delta:+.4f} "
                f"(routed {[f'{x:.4f}' for x in report['routed'][head]]} "
                f"oracle {[f'{x:.4f}' for x in report['oracle'][head]]}); "
                f"confusion diag {np.diag(confusion).tolist()} of "
                f"{confusion.sum(axis=1).tolist()}")
        self.router_eval = report
        return report

    # -- experiment loop ---------------------------------------------------

    def _ckpt_extra(self, stage: str) -> dict:
        return {"stage": stage,
                "matrix": {k: v.tolist() for k, v in self.matrix.m.items()},
                "eval_rows": {str(t): {str(u): dict(s)
                                       for u, s in row.items()}
                              for t, row in self._eval_rows.items()}}

    def resume(self) -> int:
        """Restore the net + forgetting matrix from the latest checkpoint.
        Returns the first task index still to train (0 if no checkpoint); a
        mid-task ("selected") checkpoint re-enters its own task, whose
        fine-tune then resumes from the finetune_t{t}.npz stage file.
        The reference has no load path at all (README.md:83 solicits one)."""
        from rag_tpu.continual.state import latest_task, load_checkpoint

        if not self.checkpoint_dir:
            return 0
        t = latest_task(self.checkpoint_dir)
        if t is None:
            return 0
        self.net, manifest = load_checkpoint(self.checkpoint_dir, t)
        m = manifest.get("extra", {}).get("matrix")
        if m:
            for k, vals in m.items():
                if k in self.matrix.m:
                    arr = np.asarray(vals)
                    n = min(arr.shape[0], self.matrix.num_tasks)
                    self.matrix.m[k][:n, :n] = arr[:n, :n]
        stage = manifest.get("extra", {}).get("stage", "task_done")
        rows = manifest.get("extra", {}).get("eval_rows") or {}
        self._eval_rows = {int(tk): {int(uk): dict(s)
                                     for uk, s in row.items()}
                           for tk, row in rows.items()}
        if self.cfg.use_router:
            from rag_tpu.continual.state import load_router

            self.router = load_router(self.checkpoint_dir)
        self.log(f"[resume] restored task {t} ({stage}) "
                 f"from {self.checkpoint_dir}")
        self._resume_stage, self._resume_task = stage, t
        # "selected": re-enter task t at the fine-tune stage;
        # "trained": re-enter task t at the forgetting-row eval only
        # (fine-tune completed and was written back before the kill);
        # "task_done": task t fully finished, start at t+1.
        return t if stage in ("selected", "trained") else t + 1

    def _dist_data(self, ds):
        """Multi-host feeding: each host reads only its shard of the
        global batch (rag_tpu.parallel.multihost). Single-process runs
        (incl. single-host multi-device) pass batches straight through —
        the sharded steps' in_shardings place them."""
        if self.mesh is None or jax.process_count() == 1:
            return ds
        from rag_tpu.parallel.multihost import MultihostBatcher

        return MultihostBatcher(ds, self.mesh)

    def run(self, train_datasets: Sequence, valid_datasets: Sequence,
            test_datasets: Sequence, resume: bool = False) -> ForgettingMatrix:
        tstart = time.time()
        train_datasets = [self._dist_data(d) for d in train_datasets]
        valid_datasets = [self._dist_data(d) for d in valid_datasets]
        start = self.resume() if resume else 0
        if resume and self.cfg.use_router and start > 1:
            # a kill during a task's router stage resumes past train_router
            # (task_done predates it by design); detect the stale router
            # via its persisted trained_task marker and catch up, so the
            # final routed-vs-oracle report never uses a router from an
            # earlier task (or none at all)
            done = getattr(self.router, "trained_task", -1) \
                if self.router is not None else -1
            if done < start - 1:
                self.log(f"[router] router.npz trained through task {done} "
                         f"< completed task {start - 1}; re-training")
                self.train_router(start - 1, train_datasets, test_datasets)
                if self.checkpoint_dir and self.router is not None:
                    from rag_tpu.continual.state import save_router
                    save_router(self.checkpoint_dir, self.router)
        if self.cfg.scene_parallel_search:
            self.parallel_cell_search(train_datasets)
        for t in range(start, self.cfg.num_tasks):
            self.log("*" * 60 + f"\nTask {t}\n" + "*" * 60)
            self.train_task(t, train_datasets[t], valid_datasets[t])
            row = self._eval_rows.setdefault(t, {})
            for u in range(t + 1):
                if u in row:
                    # this (t, u) eval already ran in a previous slice and
                    # its result is in the restored checkpoint — record it
                    # into the matrix without re-running (and without a
                    # duplicate tag="test" event)
                    self.matrix.record(t, u, row[u])
                    self.log(f">>> after task {t}: test task {u} "
                             f"(cached from resumed checkpoint)")
                    continue
                scalars = {k: float(v) for k, v in
                           self.evaluate(u, test_datasets[u]).items()}
                row[u] = scalars
                self.matrix.record(t, u, scalars)
                if "D1" in scalars:
                    head = (f"D1 {100*scalars['D1']:.2f}% "
                            f"EPE {scalars.get('EPE', 0):.3f}")
                else:  # depth variant: silog + delta<1.25 accuracy
                    head = (f"silog {scalars.get('silog', 0):.2f} "
                            f"d1 {scalars.get('d1', 0):.3f}")
                self.log(f">>> after task {t}: test task {u} {head}")
                self.writer.scalars("test", {f"task{u}_{k}": v
                                             for k, v in scalars.items()},
                                    step=t)
                if self.checkpoint_dir:
                    # per-eval progress: manifest-only rewrite (arrays for
                    # task t are already on disk from the "trained" save)
                    from rag_tpu.continual.state import save_checkpoint
                    save_checkpoint(self.checkpoint_dir, self.net, task=t,
                                    extra=self._ckpt_extra(stage="trained"),
                                    manifest_only=True)
            size_m = self.net.size_m()
            self.log(f">>> model size after task {t}: {size_m:.4f} M params")
            self.writer.scalars("model", {"size_m": size_m}, step=t)
            if self.checkpoint_dir:
                # task_done lands BEFORE router training: the fine-tune's
                # mid-stage file is already deleted at this point, so a
                # kill during the (minutes-long) router stage must not
                # fall back to the pre-fine-tune "selected" checkpoint
                # and redo the whole stage
                from rag_tpu.continual.state import save_checkpoint
                save_checkpoint(self.checkpoint_dir, self.net, task=t,
                                extra=self._ckpt_extra(stage="task_done"))
            if self.cfg.use_router:
                self.train_router(t, train_datasets, test_datasets)
                if self.checkpoint_dir and self.router is not None:
                    from rag_tpu.continual.state import save_router
                    save_router(self.checkpoint_dir, self.router)
        if self.cfg.use_router and self.router is not None:
            self.router_report(test_datasets)
        hours = (time.time() - tstart) / 3600
        headline = "D1" if "D1" in self.matrix.metric_names else \
            self.matrix.metric_names[-1]
        self.log(f"mean {headline} after {self.cfg.num_tasks} tasks: "
                 f"{self.matrix.mean_final(headline):.4f}  "
                 f"elapsed {hours:.2f} h")
        return self.matrix
