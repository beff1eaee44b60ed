#!/usr/bin/env bash
# Time-boxed slice supervisor for long canonical runs.
#
# This is the committed form of the operating procedure every round-4
# canonical run actually used (BASELINE.md "relay session wedge" row): the
# axon TPU relay wedges after ~3 h of continuous use, so long experiments
# run as bounded slices of `timeout $SLICE <cli ... --resume>`; each slice
# resumes from the driver's stage checkpoints (rag_tpu/continual/state.py)
# and loses at most stage_checkpoint_every epochs. Stall detection catches
# the wedge variant where the process hangs without consuming its time box.
#
# Usage:
#   LOG=logs/run.log CKPT=logs/ckptdir scripts/run_sliced.sh \
#     python -u -m rag_tpu.cli --synthetic ... \
#       --checkpoint-dir logs/ckptdir --resume
#
# Env knobs:
#   SLICE       seconds per slice (default 1500 — under the ~3 h wedge and
#               long enough to amortize the ~40 s compile per stage)
#   MAX_SLICES  give up after this many slices (default 60)
#   MAX_FAILS   consecutive non-timeout failures tolerated (default 3)
#   MAX_STALLS  consecutive no-progress slices tolerated (default 2)
#   STALL_COOLDOWN  seconds to sleep after a no-progress slice before
#               retrying (default 300): a wedged relay session resets
#               only after QUIET time — measured ~8 min on 2026-08-20;
#               immediately respawning keeps it wedged
#   LOG         run log (required; command stdout/stderr appends here)
#   CKPT        checkpoint dir to watch for progress (optional)
#
# Exit: 0 = the command completed; 75 = wedged/exhausted (EX_TEMPFAIL);
# otherwise the command's own failing exit code.
set -u

SLICE=${SLICE:-1500}
MAX_SLICES=${MAX_SLICES:-60}
MAX_FAILS=${MAX_FAILS:-3}
MAX_STALLS=${MAX_STALLS:-2}
STALL_COOLDOWN=${STALL_COOLDOWN:-300}
LOG=${LOG:?usage: LOG=run.log [CKPT=dir] run_sliced.sh <command...>}
CKPT=${CKPT:-}

if [ $# -eq 0 ]; then
  echo "run_sliced.sh: no command given" >&2
  exit 64
fi
case " $* " in
  *" --resume "*) ;;
  *) echo "[run_sliced] WARNING: command has no --resume; every slice" \
          "after the first will restart from scratch" | tee -a "$LOG" ;;
esac

mkdir -p "$(dirname "$LOG")"

progress_sig() {
  # log byte count + checkpoint-dir listing (names, sizes, mtimes): if
  # neither moved across a whole slice, the run is wedged, not working
  local sig=""
  [ -f "$LOG" ] && sig="log:$(wc -c < "$LOG")"
  if [ -n "$CKPT" ] && [ -d "$CKPT" ]; then
    sig="$sig ckpt:$(ls -la --time-style=full-iso "$CKPT" | cksum)"
  fi
  printf '%s' "$sig"
}

fails=0
stalls=0
for i in $(seq 1 "$MAX_SLICES"); do
  echo "[run_sliced] slice $i/$MAX_SLICES $(date -u +%FT%TZ): $*" >> "$LOG"
  before=$(progress_sig)
  timeout -k 30 "$SLICE" "$@" >> "$LOG" 2>&1
  rc=$?
  after=$(progress_sig)
  if [ "$rc" -eq 0 ]; then
    echo "[run_sliced] completed in slice $i" | tee -a "$LOG"
    exit 0
  elif [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    # hit the time box (124 = TERM, 137 = needed the -k KILL): expected;
    # the next slice resumes from the stage checkpoints
    echo "[run_sliced] slice $i hit the ${SLICE}s box (rc=$rc)" >> "$LOG"
    fails=0
  else
    fails=$((fails + 1))
    echo "[run_sliced] slice $i failed rc=$rc" \
         "($fails/$MAX_FAILS consecutive)" | tee -a "$LOG"
    if [ "$fails" -ge "$MAX_FAILS" ]; then
      echo "[run_sliced] aborting after $fails consecutive failures" \
        | tee -a "$LOG"
      exit "$rc"
    fi
  fi
  if [ "$before" = "$after" ]; then
    stalls=$((stalls + 1))
    echo "[run_sliced] slice $i made NO progress" \
         "($stalls/$MAX_STALLS)" | tee -a "$LOG"
    if [ "$stalls" -ge "$MAX_STALLS" ]; then
      echo "[run_sliced] wedged: $MAX_STALLS no-progress slices" \
        | tee -a "$LOG"
      exit 75
    fi
    echo "[run_sliced] cooling down ${STALL_COOLDOWN}s (wedged sessions" \
         "reset only when quiet)" >> "$LOG"
    sleep "$STALL_COOLDOWN"
  else
    stalls=0
  fi
done
echo "[run_sliced] exhausted $MAX_SLICES slices without completing" \
  | tee -a "$LOG"
exit 75
