#!/bin/bash
# Hang-aware TPU tool runner for the axon tunnel environment.
#
# ~50% of fresh TPU process launches hang indefinitely at acquisition,
# BEFORE any output (see memory notes / bench.py's WAVTHRUVEC_BENCH_CHILD
# supervisor).  Every tool in tools/ prints a "devices:" mark to stderr
# right after jax.devices() returns; this wrapper kills and relaunches any
# attempt that fails to print that mark within ACQ_TIMEOUT seconds, up to
# MAX_ATTEMPTS times.  A hard RUN_TIMEOUT bounds the whole attempt.
#
# The hang can also strike AFTER acquisition, on the process's first real
# device transfer (futex wait inside the first D2H fetch — same tunnel
# flake, later symptom).  ACQ_MARK lets callers pick a later progress mark
# their tool prints (e.g. a "mark: service built" line) so those runs are
# killed and retried too.
#
# Usage: tools/tpu_run.sh LOGFILE CMD [ARGS...]
set -u
LOG="$1"; shift
ACQ_TIMEOUT="${ACQ_TIMEOUT:-420}"
RUN_TIMEOUT="${RUN_TIMEOUT:-5400}"
MAX_ATTEMPTS="${MAX_ATTEMPTS:-3}"
ACQ_MARK="${ACQ_MARK:-devices:}"

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  : > "$LOG"
  echo "[tpu_run] attempt $attempt: $*" >> "$LOG"
  timeout "$RUN_TIMEOUT" "$@" >> "$LOG" 2>&1 &
  pid=$!
  acquired=0
  for _ in $(seq 1 $((ACQ_TIMEOUT / 5))); do
    sleep 5
    if ! kill -0 "$pid" 2>/dev/null; then acquired=2; break; fi
    if grep -q "$ACQ_MARK" "$LOG"; then acquired=1; break; fi
  done
  if [ "$acquired" -eq 0 ]; then
    echo "[tpu_run] no '$ACQ_MARK' after ${ACQ_TIMEOUT}s; killing pid $pid" >> "$LOG"
    kill "$pid" 2>/dev/null
    sleep 15
    continue
  fi
  wait "$pid"
  rc=$?
  echo "[tpu_run] attempt $attempt exited rc=$rc" >> "$LOG"
  if [ "$rc" -eq 0 ]; then exit 0; fi
  # nonzero after acquisition: real failure, do not blind-retry TPU tools
  exit "$rc"
done
echo "[tpu_run] all $MAX_ATTEMPTS attempts failed to acquire" >> "$LOG"
exit 1
