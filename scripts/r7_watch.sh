#!/bin/bash
# Tunnel watcher: probe the axon backend in killable subprocesses; the
# moment it answers, run the queued round-7 measurement battery
# (scripts/r7_measure.sh).  Bounded wall time per invocation (default
# 540 s) so a supervising session can relaunch on exit:
#   exit 0  -> battery ran (or had already completed)
#   exit 2  -> tunnel still down after the probe window
# Probes run `jax.devices()` in a fresh process (in-process import jax
# blocks unrecoverably when the tunnel is down — CLAUDE.md round 6/7).
set -u
cd "$(dirname "$0")/.."
WINDOW="${WATCH_WINDOW_S:-540}"
PROBE_TIMEOUT="${PROBE_TIMEOUT_S:-90}"
start=$(date +%s)

if grep -q '"label": "done"' R7_MEASURE.jsonl 2>/dev/null; then
  echo "battery already complete; nothing to do" >&2
  exit 0
fi

while :; do
  if timeout "$PROBE_TIMEOUT" python -c 'import jax; print(jax.devices())' >/dev/null 2>&1; then
    echo "tunnel UP at $(date); launching r7_measure.sh" >&2
    bash scripts/r7_measure.sh
    exit 0
  fi
  now=$(date +%s)
  if (( now - start >= WINDOW )); then
    echo "tunnel still down after ${WINDOW}s of probing" >&2
    exit 2
  fi
  sleep 20
done
