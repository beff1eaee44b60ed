"""scripts/run_sliced.sh — the committed form of the r4 canonical runs'
operating procedure (time-boxed slices through the axon relay wedge)."""

import os
import subprocess

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "run_sliced.sh")


def _run(tmp_path, env_extra, *cmd):
    env = {**os.environ, "LOG": str(tmp_path / "run.log"),
           "STALL_COOLDOWN": "1", **env_extra}
    return subprocess.run(["bash", SCRIPT, *cmd], env=env,
                          capture_output=True, text=True, timeout=120)


def test_completion_exits_zero(tmp_path):
    r = _run(tmp_path, {}, "true")
    assert r.returncode == 0
    assert "completed in slice 1" in r.stdout


def test_wedge_detected_by_no_progress(tmp_path):
    # a command that consumes its whole time box without writing anything
    # or touching the checkpoint dir is a wedged relay session: exit 75
    r = _run(tmp_path, {"SLICE": "2", "MAX_STALLS": "2",
                        "CKPT": str(tmp_path / "ckpt")}, "sleep", "60")
    assert r.returncode == 75
    log = (tmp_path / "run.log").read_text()
    assert "wedged" in log


def test_persistent_failure_propagates_rc(tmp_path):
    r = _run(tmp_path, {"MAX_FAILS": "2"}, "false")
    assert r.returncode == 1
    assert "aborting after 2 consecutive failures" in r.stdout


def test_timeout_slices_resume_until_done(tmp_path):
    # each slice appends a line; the 4th slice completes — progress is
    # detected so no stall abort, and the final rc is 0
    marker = tmp_path / "count"
    script = tmp_path / "job.sh"
    script.write_text(
        "#!/bin/bash\n"
        "echo tick            # stdout -> LOG: the progress signal\n"
        f"echo tick >> {marker}\n"
        f"n=$(wc -l < {marker})\n"
        "if [ \"$n\" -ge 4 ]; then echo done; exit 0; fi\n"
        "sleep 60\n")
    r = _run(tmp_path, {"SLICE": "2", "MAX_SLICES": "6", "MAX_STALLS": "3"},
             "bash", str(script), "--resume")
    assert r.returncode == 0
    assert marker.read_text().count("tick") == 4
