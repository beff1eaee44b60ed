"""Self-supervised continual stereo driver (the src_self variant).

Deltas vs the supervised driver (SURVEY.md §2.3):
  * per task: a SUPERVISED pretrain stage on synthetic (SceneFlow-style)
    data before the photometric fine-tune (src_self/approaches/rag.py:
    104-111, 163-215; hard-coded batch 8 / 9 epochs in the reference —
    configurable here);
  * fine-tune uses the photometric loss (no ground truth);
  * op search runs on color-matched PROXY data (synthetic pairs whose color
    statistics are transferred to the current scene's left images,
    src_self/approaches/rag.py:313-317 + sceneflow_driving_dataset);
  * search_eval may be truncated to a few batches (the reference left
    ``if step > 10: break`` active, :529-530 — here an explicit config).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from rag_tpu.continual.driver import ContinualDriver, ExperimentConfig
from rag_tpu.data.transfer import ColorTransferDataset
from rag_tpu.train.trainer import (
    cosine_lr,
    make_eval_step,
    make_optimizer,
    make_selfsup_train_step,
    make_train_step,
)


@dataclasses.dataclass
class SelfSupConfig(ExperimentConfig):
    pretrain_epochs: int = 9
    pretrain_batch: int = 8
    pretrain_lr: float = 0.001
    # src_self op-search deltas: 0.8 weight-train split
    # (src_self/approaches/rag.py:317) and the ACTIVE 10-batch proxy
    # validation truncation (:529-530)
    op_split_frac: float = 0.8
    op_eval_max_batches: Optional[int] = 10


class SelfSupContinualDriver(ContinualDriver):
    """train_task pipeline with pretrain + photometric fine-tune.

    pretrain_data: one supervised synthetic dataset (shared across tasks);
    proxy_search_data: synthetic pairs for op search, color-matched per
    task when ``real_pool`` images are provided.
    """

    def __init__(self, config: SelfSupConfig, pretrain_data=None,
                 proxy_search_data=None, **kw):
        super().__init__(config, **kw)
        self.pretrain_data = pretrain_data
        self.proxy_search_data = proxy_search_data

    def _proxy_for(self, t: int, train_data):
        if self.proxy_search_data is None:
            return train_data
        # pool of real left images from the current scene for color transfer
        pool = []
        for b in train_data.batches(2, False, seed=0):
            pool.append(b["left"])
            if len(pool) >= 8:
                break
        if not pool:
            return self.proxy_search_data
        real = np.concatenate(pool, axis=0)
        return ColorTransferDataset(self.proxy_search_data, real)

    # -- variant hooks: train_task itself is the BASE implementation —
    #    the selfsup deltas live entirely in these overrides, so the
    #    expand/op-search/select/save pipeline exists exactly once
    #    (round-3 advisor: the copy-adapted train_task had already
    #    drifted from the base) ---------------------------------------------

    def _ft_steps(self, specs, trainable, optimizer):
        mesh = self._mesh_for(self.cfg.train.batch, "fine-tune")
        return (make_selfsup_train_step(specs, trainable, optimizer,
                                        maxdisp=self.cfg.maxdisp, mesh=mesh),
                make_eval_step(specs, maxdisp=self.cfg.maxdisp, mesh=mesh))

    def _ft_tag(self) -> str:
        return "selfsup"

    def _op_search_cfg(self):
        return dataclasses.replace(
            self.cfg.op, maxdisp=self.cfg.maxdisp,
            split_frac=self.cfg.op_split_frac,
            eval_max_batches=self.cfg.op_eval_max_batches)

    def _search_data_for(self, t: int, train_data):
        return self._proxy_for(t, train_data)

    def _pre_finetune(self, t: int) -> None:
        if self._should_pretrain(t):
            self.pretrain(t)

    def _should_pretrain(self, t: int) -> bool:
        """Skip the supervised warm-up when a mid-fine-tune checkpoint
        exists: the fine-tune will resume from checkpointed params, so a
        re-run pretrain would be wasted compute."""
        if self.pretrain_data is None:
            return False
        import os

        ckpt = self._stage_ckpt(f"finetune_t{t}.npz")
        return not (ckpt and os.path.exists(ckpt))

    def pretrain(self, t: int):
        """Supervised warm-up on synthetic data (pretrain_t)."""
        cfg = self.cfg
        net = self.net
        arch = net.archis[t]
        trainable = net.trainable_sites(t)
        specs, params, stats = net.path(arch)
        optimizer = make_optimizer(cfg.train.weight_decay, cfg.train.grad_clip)
        step = make_train_step(specs, trainable, optimizer,
                               maxdisp=self.cfg.maxdisp,
                               mesh=self._mesh_for(cfg.pretrain_batch,
                                                   "pretrain"))
        opt_state = optimizer.init(params)
        for epoch in range(cfg.pretrain_epochs):
            lr = cosine_lr(cfg.pretrain_lr, cfg.pretrain_epochs, epoch)
            for b in self.pretrain_data.batches(cfg.pretrain_batch, True,
                                                seed=epoch):
                params, stats, opt_state, sc = step(
                    params, stats, opt_state, lr,
                    b["left"], b["right"], b["disparity"])
            self.log(f"[pretrain t{t}] epoch {epoch} "
                     f"loss {float(sc['loss']):.3f}")
        net.write_back(arch, params, stats)

