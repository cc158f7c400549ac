#!/usr/bin/env bash
# Stall-tolerant train.py supervisor for the axon TPU tunnel.
#
# The axon client can wedge mid-run (threads parked in futex/ep_poll, host
# idle, metrics.jsonl frozen, no error — see CLAUDE.md). Training
# auto-resumes from the last epoch checkpoint, so the fix is mechanical:
# kill the wedged python and relaunch. This wrapper does that until the
# run reaches TARGET_STEP or exits cleanly.
#
#   TARGET_STEP=90000 LOGDIR=log/... STALL_S=600 \
#     tools/supervise_train.sh python train.py --config_file ... --set ...
set -u
cd "$(dirname "$0")/.."

LOGDIR="${LOGDIR:?set LOGDIR to the runs LOGGING.DIR}"
TARGET_STEP="${TARGET_STEP:-90000}"
STALL_S="${STALL_S:-600}"
METRICS="$LOGDIR/metrics.jsonl"

last_step() {
  [ -f "$METRICS" ] || { echo 0; return; }
  tail -1 "$METRICS" | grep -o '"step": [0-9]*' | grep -o '[0-9]*' || echo 0
}

# NB: `kill -0` succeeds on a zombie (exited, unreaped) child — check the
# /proc state so a clean exit is noticed immediately, not via a fake STALL.
alive() {
  local st
  st=$(awk '{print $3}' "/proc/$1/stat" 2>/dev/null) || return 1
  [ -n "$st" ] && [ "$st" != "Z" ]
}

attempt=0
while :; do
  attempt=$((attempt + 1))
  # Attempts after the first are CRASH RECOVERY: force auto-resume so a
  # wrapped demo script (tools/run_*.sh) cannot rm -rf its logdir and
  # restart the schedule from scratch (observed r5: a wedge restart
  # without RESUME=1 wiped 7 epochs of a PDS seed run).
  [ "$attempt" -gt 1 ] && export RESUME=1
  echo "=== supervise: attempt $attempt (step $(last_step)/$TARGET_STEP) ==="
  # setsid: the command gets its own process GROUP, so a stall kill reaches
  # every descendant. Killing only $PID is not enough when the command is a
  # wrapper script (tools/run_*.sh): the wrapper dies but the wedged python
  # child survives, still holding the TPU, and the relaunch blocks behind
  # it forever (the single-TPU-process rule — see CLAUDE.md).
  setsid "$@" &
  PID=$!
  started=$(date +%s)
  while alive "$PID"; do
    sleep 30
    alive "$PID" || break
    # Progress reference = the LATER of this attempt's start and the last
    # metrics write: a stale mtime from the previous attempt must not
    # count against a fresh process that is still compiling/restoring.
    last=$started
    if [ -f "$METRICS" ]; then
      mt=$(stat -c %Y "$METRICS")
      [ "$mt" -gt "$last" ] && last=$mt
    fi
    age=$(( $(date +%s) - last ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "=== supervise: STALL (no progress for ${age}s) — restarting ==="
      kill -- "-$PID" 2>/dev/null; sleep 5
      kill -9 -- "-$PID" 2>/dev/null; sleep 3
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  step=$(last_step)
  if [ "$step" -ge "$TARGET_STEP" ]; then
    echo "=== supervise: done (step $step, rc=$rc) ==="
    exit 0
  fi
  # A clean exit below target means the CLI finished its epoch budget or
  # failed outright; don't loop forever on real errors.
  if [ "$rc" -eq 0 ]; then
    echo "=== supervise: exited rc=0 at step $step < $TARGET_STEP ==="
    exit 0
  fi
  sleep 5
done
