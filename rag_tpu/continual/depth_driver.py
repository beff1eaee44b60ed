"""Continual monocular-depth driver (the rag_depth variant).

Same search -> grow -> select -> fine-tune pipeline as the stereo driver,
over GrowableDepthNet with silog training and the depth metric suite
(reference: rag_depth/src/approaches/rag.py, run.py — per-metric 4x4
matrices). Cell search runs MdeNAS over the dedicated monocular 2D depth
supernet (DepthCellSearch -> rag_tpu.models.supernet.init_depth_supernet:
no right image, matching half rewired to 2D, DispHead sigmoid x max_depth —
rag_depth/src/automl/mdenas_basicmodel.py:100-121).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig
from rag_tpu.metrics.depth import DEPTH_METRIC_NAMES
from rag_tpu.metrics.meters import AverageMeterDict, ForgettingMatrix
from rag_tpu.models.growable import GrowableDepthNet
from rag_tpu.search.growth import OpSearch
from rag_tpu.train.trainer import (
    cosine_lr,
    make_depth_eval_step,
    make_depth_train_step,
    make_optimizer,
)


class SyntheticDepthDataset:
    """Fixed, seeded set of images with a depth cue (brightness ~ 1/depth)
    + exact gt depth. Samples are generated once and epochs re-visit them
    shuffled — the reference protocol trains on a fixed per-scene set."""

    def __init__(self, num_samples: int, h: int, w: int, seed: int = 0,
                 max_depth: float = 60.0):
        self.num_samples = num_samples
        self.h, self.w = h, w
        self.seed = seed
        self.max_depth = max_depth
        self._cache = None

    def __len__(self):
        return self.num_samples

    def _samples(self):
        if self._cache is None:
            rng = np.random.default_rng(self.seed)
            n = self.num_samples
            th, tw = max(self.h // 4, 1), max(self.w // 4, 1)
            tiles = rng.uniform(2.0, self.max_depth,
                                (n, (self.h + th - 1) // th,
                                 (self.w + tw - 1) // tw))
            depth = np.repeat(np.repeat(tiles, th, 1), tw, 2)
            depth = depth[:, :self.h, :self.w].astype(np.float32)
            base = rng.standard_normal(
                (n, self.h, self.w, 3)).astype(np.float32) * 0.3
            cue = (1.0 / depth)[..., None] * 10.0
            self._cache = {"image": (base + cue).astype(np.float32),
                           "depth": depth}
        return self._cache

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                indices=None, drop_last: bool = True):
        data = self._samples()
        idx = np.asarray(indices if indices is not None
                         else np.arange(self.num_samples))
        if shuffle:
            idx = np.random.default_rng(self.seed + seed).permutation(idx)
        n = len(idx)
        stop = n - (n % batch_size) if drop_last else n
        for i in range(0, stop, batch_size):
            sel = idx[i:i + batch_size]
            yield {k: v[sel] for k, v in data.items()}


class DepthContinualDriver(ContinualDriver):
    def __init__(self, config: ExperimentConfig, **kw):
        super().__init__(config, **kw)
        self.matrix = ForgettingMatrix(config.num_tasks,
                                       ("loss",) + DEPTH_METRIC_NAMES)

    def train_task(self, t: int, train_data, valid_data):
        genotype = self.search_cell(t, train_data)
        key = jax.random.PRNGKey(self.cfg.seed + 31 * t)
        if t == 0:
            self.net = GrowableDepthNet(key, genotype)
        else:
            self.net.expand(key, t, genotype)
            OpSearch(self.net, self.cfg.op, log=self.log,
                     variant="depth").search(t, train_data,
                                             writer=self.writer)
            best = self.net.select(t)
            self.log(f"[task {t}] best_archi = {best}")
        self.writer.scalars("model_size_m", {"params_m": self.net.size_m()},
                            step=t)
        self.fine_tune(t, train_data, valid_data)

    def search_cell(self, t: int, train_data):
        if self.cfg.skip_cell_search:
            from rag_tpu.search.genotype import default_genotype

            return default_genotype()
        import dataclasses as _dc

        from rag_tpu.search.mdenas import DepthCellSearch

        cs = DepthCellSearch(_dc.replace(self.cfg.cell,
                                         seed=self.cfg.cell.seed + t),
                             log=self.log)
        return cs.search(train_data, writer=self.writer, task=t)

    def fine_tune(self, t: int, train_data, valid_data):
        cfg = self.cfg.train
        net = self.net
        arch = net.archis[t]
        trainable = net.trainable_sites(t)
        specs, params, stats = net.path(arch)
        optimizer = make_optimizer(cfg.weight_decay, cfg.grad_clip)
        step = make_depth_train_step(specs, trainable, optimizer)
        eval_step = make_depth_eval_step(specs)
        opt_state = optimizer.init(params)

        best_loss, best = np.inf, (params, stats)
        for epoch in range(cfg.epochs):
            lr = cosine_lr(cfg.lr, cfg.epochs, epoch)
            for b in train_data.batches(cfg.batch, True, seed=epoch):
                params, stats, opt_state, _ = step(
                    params, stats, opt_state, lr, b["image"], b["depth"])
            vm = AverageMeterDict()
            for b in valid_data.batches(cfg.batch, False, seed=0):
                vm.update({k: float(v) for k, v in eval_step(
                    params, stats, b["image"], b["depth"]).items()})
            v = vm.mean()
            self.log(f"[depth t{t}] epoch {epoch} valid silog "
                     f"{v.get('silog', 0):.3f} d1 {v.get('d1', 0):.3f}")
            self.writer.scalars(f"depth_train/task{t}", v, step=epoch)
            if v.get("loss", np.inf) < best_loss:
                best_loss, best = v.get("loss", np.inf), (params, stats)
        params, stats = best
        net.write_back(arch, params, stats)

    def evaluate(self, u: int, test_data, batch: int = 1):
        net = self.net
        specs, params, stats = net.path(net.archis[u])
        key = tuple(sorted((k, s) for k, s in specs.items()))
        if key not in self._eval_cache:
            self._eval_cache[key] = make_depth_eval_step(specs)
        eval_step = self._eval_cache[key]
        m = AverageMeterDict()
        for b in test_data.batches(batch, False, seed=0, drop_last=False):
            m.update({k: float(v) for k, v in eval_step(
                params, stats, b["image"], b["depth"]).items()})
        return m.mean()
