"""Extend a stereo run's result.json to the FULL 6-metric matrix suite
from its own events.jsonl — no re-evaluation, exact on-chip values.

Every `tag=="test"` event already records all six eval scalars
(D1/EPE/Thres1/Thres2/Thres3/loss) per (t, u) cell; the ForgettingMatrix
historically tracked only four, so committed result.json files carry a
subset. This script rebuilds all six matrices from the event stream
(last record wins — resumed slices re-logged identical values) and
merges them into result.json. Column-constancy is re-checked across the
dedup: any (t, u) re-log that DIFFERS from the first is an error, not a
dedup candidate.

Usage: python scripts/extend_stereo_result_r5.py logs/drivingstereo_rag_0_canonical_learn_r4
"""
import json
import sys

import numpy as np

METRICS = ("D1", "EPE", "loss", "Thres1", "Thres2", "Thres3")


def main(run_dir: str):
    events = f"{run_dir}/events.jsonl"
    result_path = f"{run_dir}/result.json"

    cells = {}  # (t, u, metric) -> value
    for line in open(events):
        rec = json.loads(line)
        if rec.get("tag") != "test":
            continue
        t = int(rec["step"])
        for key, val in rec["values"].items():
            task, metric = key.split("_", 1)
            u = int(task.removeprefix("task"))
            prev = cells.get((t, u, metric))
            assert prev is None or prev == val, (
                f"re-logged cell ({t},{u},{metric}) differs: {prev} vs {val}")
            cells[(t, u, metric)] = val

    n = 1 + max(t for t, _, _ in cells)
    mats = {m: np.zeros((n, n)) for m in METRICS}
    for (t, u, metric), val in cells.items():
        if metric in mats:
            mats[metric][t, u] = val

    with open(result_path) as f:
        result = json.load(f)
    for m in METRICS:
        old = result.get(m)
        if old is not None:
            assert np.allclose(np.asarray(old), mats[m]), (
                f"existing {m} matrix disagrees with the event stream")
        result[m] = mats[m].tolist()
    result["mean_D1"] = float(np.mean(mats["D1"][n - 1, :n]))
    with open(result_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[extend] {result_path}: all {len(METRICS)} matrices from "
          f"{len(cells)} event cells (n={n})")


if __name__ == "__main__":
    main(sys.argv[1])
