"""Train + evaluate the Scene Router on the committed canonical depth
checkpoint (VERDICT r3 #5: routed-vs-oracle evidence for a second
variant).

Resumes the depth registry from logs/canonical_depth_r3b (the corrected
column-constant canonical run), trains the mean+std router on the same
synthetic depth scenes that run used (seeds 10+t / 30+t, 384x768 — see
BASELINE.md depth section), and appends the routed-vs-oracle report to
the run's result.json under "router". The router lands in
logs/canonical_depth_r3b/router.npz (no prior router existed there —
nothing is overwritten).

Run: python scripts/train_depth_router_r4.py   (on the TPU chip)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag_tpu.continual.depth_driver import (  # noqa: E402
    DepthContinualDriver,
    SyntheticDepthDataset,
)
from rag_tpu.continual.driver import ExperimentConfig, TrainConfig  # noqa: E402
from rag_tpu.search.growth import OpSearchConfig  # noqa: E402
from rag_tpu.search.mdenas import CellSearchConfig  # noqa: E402
from rag_tpu.utils.logging import MetricWriter  # noqa: E402

CKPT = "logs/canonical_depth_r3b"
RESULT = "logs/drivingstereo_rag_0_canonical_depth_r3b/result.json"
ROUTER_EPOCHS = 6


def main():
    mk = lambda s: SyntheticDepthDataset(64, 384, 768, seed=s)
    train = [mk(10 + t) for t in range(4)]
    test = [mk(30 + t) for t in range(4)]

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=5, batch=16, seed=0),
        op=OpSearchConfig(epochs=4, batch=12, seed=0),
        train=TrainConfig(epochs=10, batch=8),
        num_tasks=4, seed=0,
        use_router=True, router_epochs=ROUTER_EPOCHS)
    writer = MetricWriter("logs/depth_router_r4", echo=False)
    driver = DepthContinualDriver(cfg, writer=writer, log=print,
                                  checkpoint_dir=CKPT)
    start = driver.resume()
    assert start == 4, f"expected a finished 4-task checkpoint, got {start}"

    driver.router = None
    driver.train_router(3, train, test)
    report = driver.router_report(test)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, dict)}, indent=2))

    with open(RESULT) as f:
        result = json.load(f)
    result["router"] = report
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1)

    from rag_tpu.continual.state import save_router
    save_router(CKPT, driver.router)
    print(f"updated {RESULT} (router) and {CKPT}/router.npz")


if __name__ == "__main__":
    main()
