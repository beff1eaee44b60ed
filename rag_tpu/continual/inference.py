"""Serving-time inference over a grown network, with Scene-Router path
selection and cross-domain evaluation.

The reference evaluates only with ground-truth task ids (src/run.py:180);
the paper's adaptive per-frame path selection is realized here: the router
classifies each left frame, and the frame runs through the winning task's
compiled executable. Cross-domain evaluation (the src_self KITTI/
Cityscapes lists) is the same entry point pointed at foreign filename
lists.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from rag_tpu.metrics.meters import AverageMeterDict
from rag_tpu.models.growable import GrowableStereoNet
from rag_tpu.models.router import SceneRouter
from rag_tpu.train.trainer import make_eval_step


class RoutedInference:
    """Per-frame path selection + disparity prediction/evaluation."""

    def __init__(self, net: GrowableStereoNet,
                 router: Optional[SceneRouter] = None,
                 maxdisp: int = 192):
        self.net = net
        self.router = router
        self.maxdisp = maxdisp
        self._steps: Dict = {}
        self._fwd: Dict = {}

    def _eval_step(self, t: int):
        if t not in self._steps:
            specs, _, _ = self.net.path(self.net.archis[t])
            self._steps[t] = make_eval_step(specs, maxdisp=self.maxdisp)
        return self._steps[t]

    def _forward(self, t: int):
        if t not in self._fwd:
            import jax

            from rag_tpu.models.stereo import stereo_forward

            specs, _, _ = self.net.path(self.net.archis[t])

            md = self.maxdisp

            @jax.jit
            def fwd(params, stats, left, right):
                disp, _ = stereo_forward(specs, params, stats, left, right,
                                         fused_head=True, maxdisp=md)
                return disp

            self._fwd[t] = fwd
        return self._fwd[t]

    def route(self, left) -> np.ndarray:
        """(B,) task ids for a batch of left frames."""
        if self.router is None:
            return np.zeros(left.shape[0], np.int64)
        return self.router.predict(left)

    def predict(self, left, right, task: Optional[int] = None) -> np.ndarray:
        """Disparity for a batch; task=None -> per-frame routing."""
        if task is not None:
            _, params, stats = self.net.path(self.net.archis[task])
            return np.asarray(self._forward(task)(params, stats, left, right))
        tasks = self.route(left)
        out = np.zeros(left.shape[:3], np.float32)
        for t in np.unique(tasks):
            idx = np.nonzero(tasks == t)[0]
            _, params, stats = self.net.path(self.net.archis[int(t)])
            disp = self._forward(int(t))(params, stats, left[idx], right[idx])
            out[idx] = np.asarray(disp)
        return out

    def evaluate(self, dataset, task: Optional[int] = None,
                 batch: int = 1) -> Dict[str, float]:
        """Evaluate a dataset: fixed task path, or routed when task=None.
        Routed evaluation runs per-frame through the predicted paths."""
        if task is not None:
            # fixed-path eval: queue every batch, ONE device fetch
            # (AverageMeterDict.update_batched — per-batch float()
            # fetches serialize the loop on relay round trips)
            _, params, stats = self.net.path(self.net.archis[task])
            step = self._eval_step(task)
            return AverageMeterDict().update_batched(
                [step(params, stats, b["left"], b["right"], b["disparity"])
                 for b in dataset.batches(batch, False, seed=0,
                                          drop_last=False)]).mean()
        # routed eval: the per-batch route() fetch is inherent (the host
        # picks each frame's path), but the metric fetches still batch
        m = AverageMeterDict()
        for b in dataset.batches(batch, False, seed=0, drop_last=False):
            tasks = self.route(b["left"])
            outs = []
            for t in np.unique(tasks):
                idx = np.nonzero(tasks == t)[0]
                _, params, stats = self.net.path(self.net.archis[int(t)])
                outs.append(self._eval_step(int(t))(
                    params, stats, b["left"][idx], b["right"][idx],
                    b["disparity"][idx]))
            m.update_batched(outs)
        return m.mean()
