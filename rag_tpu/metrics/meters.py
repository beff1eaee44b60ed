"""Host-side metric aggregation and the continual-forgetting matrix.

AverageMeterDict mirrors src/utilstool/experiment.py:126-151;
ForgettingMatrix is the structured artifact behind the reference's 4x4
upper-triangular result matrices (src/run.py:149-192, 203-234).
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np


class AverageMeterDict:
    def __init__(self):
        self.data: Dict[str, float] = {}
        self.count = 0

    def update(self, scalars: Dict[str, float]):
        self.count += 1
        for k, v in scalars.items():
            self.data[k] = self.data.get(k, 0.0) + float(v)

    def mean(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}

    def update_batched(self, outs) -> "AverageMeterDict":
        """Feed a LIST of per-batch jax scalar dicts with ONE device
        fetch.

        Through the axon relay every `float(jax_scalar)` is a full host
        round trip; a per-batch fetch inside an epoch loop serializes the
        loop on ~N round trips (measured: the per-epoch eval loops, not
        compute, dominated canonical epoch time). Stacking the queued
        outputs and fetching once transfers the SAME f32 scalars — every
        value fed to update() is bit-identical to the unbatched path —
        so meters, logs, and matrices do not change by a single bit.
        """
        if not outs:
            return self
        keys = sorted(outs[0])
        import jax.numpy as jnp

        stacked = np.asarray(jnp.stack(
            [jnp.stack([o[k] for k in keys]) for o in outs]))  # (N, K)
        for row in stacked:
            self.update({k: float(v) for k, v in zip(keys, row)})
        return self


class ForgettingMatrix:
    """matrix[t, u] = metric on task u after training task t (u <= t)."""

    def __init__(self, num_tasks: int, metrics=("D1", "EPE", "loss")):
        self.num_tasks = num_tasks
        self.metric_names = tuple(metrics)
        self.m = {k: np.zeros((num_tasks, num_tasks), np.float64) for k in metrics}

    def record(self, t: int, u: int, scalars: Dict[str, float]):
        for k in self.metric_names:
            if k in scalars:
                self.m[k][t, u] = float(scalars[k])

    def mean_final(self, metric: str, upto: int | None = None) -> float:
        """Mean of the last completed row (reference's Mean_D1_All,
        src/run.py:226)."""
        t = self.num_tasks - 1 if upto is None else upto
        return float(np.mean(self.m[metric][t, : t + 1]))

    def forgetting(self, metric: str) -> float:
        """Average increase of the metric on old tasks from when they were
        learned to after the final task (standard forgetting measure)."""
        t = self.num_tasks - 1
        if t == 0:
            return 0.0
        diffs = [self.m[metric][t, u] - self.m[metric][u, u] for u in range(t)]
        return float(np.mean(diffs))

    def to_json(self) -> str:
        return json.dumps({k: v.tolist() for k, v in self.m.items()}, indent=2)

    def format(self, metric: str, scale: float = 1.0, fmt: str = "{:7.3f}") -> str:
        lines: List[str] = []
        for i in range(self.num_tasks):
            lines.append(" ".join(fmt.format(self.m[metric][i, j] * scale)
                                  for j in range(self.num_tasks)))
        return "\n".join(lines)
