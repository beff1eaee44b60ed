#!/usr/bin/env bash
# Round-5 chip follow-up queue: waits for the canonical selfsup run
# (PID in /tmp/selfsup.pid) to release the chip, then runs the shear
# kernel measurement (VERDICT r4 missing #4) and the final bench —
# strictly serialized: the relay wedges if two processes share the chip
# (BASELINE.md relay-wedge row).
set -u
PID=$(cat /tmp/selfsup.pid)
while kill -0 "$PID" 2>/dev/null; do sleep 10; done
sleep 15  # let the relay session settle after the big run exits
echo "[queue] selfsup pid $PID exited $(date -u +%H:%M:%S)"
timeout 580 /opt/venv/bin/python -u scripts/measure_shear_r4.py \
  > logs/measure_shear_r5.log 2>&1
echo "[queue] shear measurement rc=$? $(date -u +%H:%M:%S)"
timeout 580 /opt/venv/bin/python -u bench.py > logs/bench_r5.log 2>&1
echo "[queue] bench rc=$? $(date -u +%H:%M:%S)"
