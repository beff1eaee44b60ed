"""CLI smoke tests: the canonical entry (run.py equivalent) must run the
full continual pipeline end to end from argv. Regression guard for the
main() os-shadowing crash (any non-bf16 run raised UnboundLocalError)."""

import pytest

import json
import os


@pytest.mark.slow
def test_cli_synthetic_smoke(tmp_path):
    from rag_tpu.cli import main

    out = str(tmp_path / "logs")
    main([
        "--synthetic", "--synthetic-hw", "24", "48",
        "--synthetic-size", "4", "--synthetic-eval-size", "2",
        "--c_epochs", "1", "--o_epochs", "1", "--epochs", "1",
        "--c_batch", "2", "--o_batch", "2", "--batch", "2",
        "--num-tasks", "2", "--seed", "0", "--id", "smoke",
        "--output", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ])
    exp = os.path.join(out, "drivingstereo_rag_0_smoke")
    with open(os.path.join(exp, "result.json")) as f:
        res = json.load(f)
    d1 = res["D1"]
    assert len(d1) == 2 and len(d1[1]) == 2
    # lower triangle (u <= t) measured and finite
    for t in range(2):
        for u in range(t + 1):
            assert d1[t][u] == d1[t][u]  # not NaN
    assert res["model_size_m"] > 0


@pytest.mark.slow
def test_cli_selfsup_smoke(tmp_path):
    """--variant selfsup drives pretrain + photometric fine-tune + proxy
    op-search end to end from argv (src_self / run_rag_self.sh parity)."""
    from rag_tpu.cli import main

    out = str(tmp_path / "logs")
    main([
        "--variant", "selfsup",
        "--synthetic", "--synthetic-hw", "24", "48",
        "--synthetic-size", "4", "--synthetic-eval-size", "2",
        "--c_epochs", "1", "--o_epochs", "1", "--epochs", "1",
        "--c_batch", "2", "--o_batch", "2", "--batch", "2",
        "--pretrain-epochs", "1", "--pretrain-batch", "2",
        "--num-tasks", "2", "--seed", "0", "--id", "smoke",
        "--output", out,
    ])
    exp = os.path.join(out, "drivingstereo_rag_0_smoke")
    with open(os.path.join(exp, "result.json")) as f:
        res = json.load(f)
    assert len(res["D1"]) == 2 and res["model_size_m"] > 0
