"""Rebuild the canonical depth artifact with the FULL 9-metric suite +
Scene-Router evidence (VERDICT r4 missing #3 / next-round #4).

The committed canonical depth run (logs/canonical_depth_r3b) predates the
full-suite persistence fix (cli.py "every tracked forgetting matrix lands
in result.json") — its result.json carries only silog+d1 matrices, and no
router was ever trained for the depth variant. The reference prints the
whole 9-matrix suite per task (rag_depth/src/run.py:149-273). Rather than
burn a fresh multi-hour chip run, this script re-derives the complete
artifact from the run's own per-task checkpoints:

  1. for each t in 0..3: load arrays_task{t}.npz, evaluate every task
     u <= t with the current 10-metric depth eval step (loss + silog,
     abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3) on the exact r3b
     protocol datasets (synthetic seeds 30+t, 64 pairs, 384x768);
  2. train the mean+std Scene Router after task 3 and produce the
     routed-vs-oracle report (src/models/rag_model.py:369 dormant hook);
  3. merge everything into the run's result.json and save router.npz.

Column-constancy of the rebuilt matrices doubles as a checkpoint-integrity
check: frozen growth means m[t,u] must equal m[u,u] bit-for-bit.

Run: python scripts/rebuild_depth_result_r5.py   (on the TPU chip)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rag_tpu.continual.depth_driver import (  # noqa: E402
    DepthContinualDriver,
    SyntheticDepthDataset,
)
from rag_tpu.continual.driver import ExperimentConfig, TrainConfig  # noqa: E402
from rag_tpu.continual.state import load_checkpoint, save_router  # noqa: E402
from rag_tpu.metrics.depth import DEPTH_METRIC_NAMES  # noqa: E402
from rag_tpu.metrics.meters import ForgettingMatrix  # noqa: E402
from rag_tpu.search.growth import OpSearchConfig  # noqa: E402
from rag_tpu.search.mdenas import CellSearchConfig  # noqa: E402
from rag_tpu.utils.logging import MetricWriter  # noqa: E402

CKPT = "logs/canonical_depth_r3b"
RESULT = "logs/drivingstereo_rag_0_canonical_depth_r3b/result.json"
NUM_TASKS = 4
ROUTER_EPOCHS = 6


def main():
    # exact r3b protocol data (cli.make_depth_datasets): 384x768, train
    # 64 pairs seed 10+t, test **8** pairs seed 30+t — the eval size was
    # recovered by matching the run's own printed task-0 silog: n=8
    # reproduces 52.846 vs the run's 52.886 (CPU-vs-TPU numerics), while
    # n=64 gives 61.8 (different RNG stream => different pixels)
    train = [SyntheticDepthDataset(64, 384, 768, seed=10 + t)
             for t in range(NUM_TASKS)]
    test = [SyntheticDepthDataset(8, 384, 768, seed=30 + t)
            for t in range(NUM_TASKS)]

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=5, batch=16, seed=0),
        op=OpSearchConfig(epochs=4, batch=12, seed=0),
        train=TrainConfig(epochs=10, batch=8),
        num_tasks=NUM_TASKS, seed=0,
        use_router=True, router_epochs=ROUTER_EPOCHS)
    writer = MetricWriter("logs/depth_rebuild_r5", echo=False)
    driver = DepthContinualDriver(cfg, writer=writer, log=print,
                                  checkpoint_dir=CKPT)

    matrix = ForgettingMatrix(NUM_TASKS, ("loss",) + DEPTH_METRIC_NAMES)
    for t in range(NUM_TASKS):
        driver.net, _ = load_checkpoint(CKPT, t)
        for u in range(t + 1):
            scalars = driver.evaluate(u, test[u])
            matrix.record(t, u, scalars)
            print(f"[rebuild] after task {t}: test task {u} "
                  f"silog {scalars['silog']:.3f} d1 {scalars['d1']:.4f} "
                  f"rms {scalars['rms']:.3f}")

    # frozen growth => every column must be constant below the diagonal
    columns_constant = True
    for k in matrix.metric_names:
        m = matrix.m[k]
        for u in range(NUM_TASKS):
            col = m[u:, u]
            if not np.all(col == col[0]):
                columns_constant = False
                print(f"[rebuild] WARNING column {u} of {k} not constant: "
                      f"{col} — frozen-growth guarantee violated")
    if columns_constant:
        print("[rebuild] all columns bit-constant "
              "(frozen-growth check passed)")

    # Scene Router after the final task + routed-vs-oracle report
    driver.router = None
    driver.train_router(NUM_TASKS - 1, train, test)
    report = driver.router_report(test)

    result = {}
    if os.path.exists(RESULT):
        with open(RESULT) as f:
            result = json.load(f)
    result.update({k: v.tolist() for k, v in matrix.m.items()})
    result["mean_silog"] = matrix.mean_final("silog")
    result["model_size_m"] = driver.net.size_m()
    result["router"] = report
    result["rebuilt_full_suite"] = True
    result["columns_constant"] = columns_constant
    os.makedirs(os.path.dirname(RESULT), exist_ok=True)
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)
    save_router(CKPT, driver.router)
    print(f"[rebuild] wrote {RESULT} "
          f"({len(matrix.metric_names)} matrices + router) and "
          f"{CKPT}/router.npz")


if __name__ == "__main__":
    main()
