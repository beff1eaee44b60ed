"""Retrain the Scene Router of the committed canonical_r3 checkpoint with
the current (mean+std pooling) router and append the new routed-vs-oracle
report to the run's result.json under "router_meanstd".

The canonical_r3 run (logs/canonical_r3_run.log) trained its router BEFORE
the mean+std-pooling fix landed (commit c593012): variance-only appearance
styles (rain noise) were invisible to mean pooling and the confusion matrix
collapsed clean<->rainy (router_accuracy 0.5). This script re-derives the
router evidence from the same frozen checkpoint + the same synthetic scenes
(seeds 10+t / 30+t, identical to rag_tpu.cli.make_datasets with the flags in
BASELINE.md), leaving the network and matrices untouched.

Run: python scripts/retrain_router_r3.py  (on the TPU chip; ~2 min)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_tpu.continual.driver import (ContinualDriver, ExperimentConfig,
                                      TrainConfig)
from rag_tpu.data.synthetic import WEATHER_STYLES, SyntheticStereoDataset
from rag_tpu.search.growth import OpSearchConfig
from rag_tpu.search.mdenas import CellSearchConfig
from rag_tpu.utils.logging import MetricWriter

CKPT = "logs/canonical_r3"
RESULT = "logs/drivingstereo_rag_0_canonical_r3/result.json"
ROUTER_EPOCHS = 6


def main():
    md = min(64.0, 192 / 3)
    style = lambda t: WEATHER_STYLES[t % len(WEATHER_STYLES)]
    mk = lambda s, t, hh, ww, nn: SyntheticStereoDataset(
        nn, hh, ww, seed=s, max_disp=md, style=style(t))
    train = [mk(10 + t, t, 192, 384, 64) for t in range(4)]
    test = [mk(30 + t, t, 480, 960, 8) for t in range(4)]

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=10, batch=8, seed=0),
        op=OpSearchConfig(epochs=8, batch=6, seed=0),
        train=TrainConfig(epochs=20, batch=4),
        num_tasks=4, seed=0, maxdisp=192,
        use_router=True, router_epochs=ROUTER_EPOCHS)
    writer = MetricWriter("logs/router_retrain_r3", echo=False)
    driver = ContinualDriver(cfg, writer=writer, log=print,
                             checkpoint_dir=CKPT)
    start = driver.resume()
    assert start == 4, f"expected a finished 4-task checkpoint, got {start}"

    driver.router = None  # discard the mean-only router; train fresh
    driver.train_router(3, train, test)
    report = driver.router_report(test)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}, indent=2))

    with open(RESULT) as f:
        result = json.load(f)
    result["router_meanstd"] = report
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)

    from rag_tpu.continual.state import save_router
    # distinct filename: never clobber the checkpoint's committed
    # router.npz (round-3 advisor finding — the original r3 run's
    # mean-only router was lost to an in-place overwrite)
    save_router(CKPT, driver.router, name="router_meanstd.npz")
    print(f"updated {RESULT} (router_meanstd) and {CKPT}/router_meanstd.npz")


if __name__ == "__main__":
    main()
