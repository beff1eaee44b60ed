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


class ContinualDriver:
    def __init__(self, config: ExperimentConfig,
                 writer: Optional[MetricWriter] = None,
                 log: Optional[Callable] = print,
                 checkpoint_dir: Optional[str] = None):
        self.cfg = config
        self.writer = writer or MetricWriter()
        self.log = log or (lambda *_: None)
        self.checkpoint_dir = checkpoint_dir
        self.net: Optional[GrowableStereoNet] = None
        self.matrix = ForgettingMatrix(config.num_tasks,
                                       ("D1", "EPE", "loss", "Thres1"))
        self._eval_cache = {}

    # -- stages ------------------------------------------------------------

    def search_cell(self, t: int, train_data) -> Genotype:
        if self.cfg.skip_cell_search:
            return default_genotype()
        cs = CellSearch(dataclasses.replace(self.cfg.cell,
                                            seed=self.cfg.cell.seed + t),
                        log=self.log)
        return cs.search(train_data, writer=self.writer, task=t)

    def train_task(self, t: int, train_data, valid_data):
        """Full per-task pipeline (Appr.train, rag.py:79-105)."""
        genotype = self.search_cell(t, train_data)
        key = jax.random.PRNGKey(self.cfg.seed + 31 * t)
        if t == 0:
            self.net = GrowableStereoNet(key, genotype)
        else:
            self.net.expand(key, t, genotype)
            OpSearch(self.net, self.cfg.op, log=self.log).search(
                t, train_data, writer=self.writer)
            best = self.net.select(t)
            self.log(f"[task {t}] best_archi = {best}")
            self.writer.text(f"archi/task{t}", str(best))
        self.writer.scalars("model_size_m", {"params_m": self.net.size_m()},
                            step=t)
        self.fine_tune(t, train_data, valid_data)

    def fine_tune(self, t: int, train_data, valid_data):
        """Stage-3 supervised training of archis[t] (rag.py:107-153)."""
        cfg = self.cfg.train
        net = self.net
        arch = net.archis[t]
        trainable = net.trainable_sites(t)
        specs, params, stats = net.path(arch)
        optimizer = make_optimizer(cfg.weight_decay, cfg.grad_clip)
        train_step = make_train_step(specs, trainable, optimizer)
        eval_step = make_eval_step(specs)
        opt_state = optimizer.init(params)

        best_loss = np.inf
        best = (params, stats)
        for epoch in range(cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch)
            for b in train_data.batches(cfg.batch, True, seed=epoch):
                params, stats, opt_state, _ = train_step(
                    params, stats, opt_state, lr,
                    b["left"], b["right"], b["disparity"])

            vm = AverageMeterDict()
            for b in valid_data.batches(cfg.batch, False, seed=0):
                vm.update({k: float(v) for k, v in eval_step(
                    params, stats, b["left"], b["right"], b["disparity"]
                ).items()})
            v = vm.mean()
            self.log(f"[train t{t}] epoch {epoch} lr {lr:.5f} "
                     f"valid loss {v.get('loss', 0):.3f} "
                     f"D1 {100*v.get('D1', 0):.1f}% EPE {v.get('EPE', 0):.3f}")
            self.writer.scalars(f"train/task{t}", v, step=epoch)
            if v.get("loss", np.inf) < best_loss:
                best_loss = v.get("loss", np.inf)
                best = (params, stats)
        params, stats = best
        net.write_back(arch, params, stats)

    def evaluate(self, u: int, test_data, batch: int = 1):
        """Eval task u with its stored path (rag.py:408-441)."""
        net = self.net
        arch = net.archis[u]
        specs, params, stats = net.path(arch)
        key = tuple(sorted((k, s) for k, s in specs.items()))
        if key not in self._eval_cache:
            self._eval_cache[key] = make_eval_step(specs)
        eval_step = self._eval_cache[key]
        m = AverageMeterDict()
        for b in test_data.batches(batch, False, seed=0, drop_last=False):
            m.update({k: float(v) for k, v in eval_step(
                params, stats, b["left"], b["right"], b["disparity"]).items()})
        return m.mean()

    # -- experiment loop ---------------------------------------------------

    def resume(self) -> int:
        """Restore the net + forgetting matrix from the latest checkpoint.
        Returns the first task index still to train (0 if no checkpoint).
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
        self.log(f"[resume] restored task {t} from {self.checkpoint_dir}")
        return t + 1

    def run(self, train_datasets: Sequence, valid_datasets: Sequence,
            test_datasets: Sequence, resume: bool = False) -> ForgettingMatrix:
        tstart = time.time()
        start = self.resume() if resume else 0
        for t in range(start, self.cfg.num_tasks):
            self.log("*" * 60 + f"\nTask {t}\n" + "*" * 60)
            self.train_task(t, train_datasets[t], valid_datasets[t])
            for u in range(t + 1):
                scalars = self.evaluate(u, test_datasets[u])
                self.matrix.record(t, u, scalars)
                self.log(f">>> after task {t}: test task {u} "
                         f"D1 {100*scalars.get('D1', 0):.2f}% "
                         f"EPE {scalars.get('EPE', 0):.3f}")
                self.writer.scalars("test", {f"task{u}_{k}": v
                                             for k, v in scalars.items()},
                                    step=t)
            if self.checkpoint_dir:
                from rag_tpu.continual.state import save_checkpoint
                save_checkpoint(
                    self.checkpoint_dir, self.net, task=t,
                    extra={"matrix": {k: v.tolist()
                                      for k, v in self.matrix.m.items()}})
        hours = (time.time() - tstart) / 3600
        headline = "D1" if "D1" in self.matrix.metric_names else \
            self.matrix.metric_names[-1]
        self.log(f"mean {headline} after {self.cfg.num_tasks} tasks: "
                 f"{self.matrix.mean_final(headline):.4f}  "
                 f"elapsed {hours:.2f} h")
        return self.matrix
