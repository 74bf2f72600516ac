#!/bin/bash
# Round-7b: deep jitter-packing sweep.  Every scene's round-7 autotune
# winner sat at the EDGE of the search space (jitter_pack=8 @
# prog_tile=512 — bunny 14.03 ms vs 15.87 next-best, terrain 84 vs 126,
# 340k 25.3 vs 32.7), and at fixed lane count the trend favored more
# packing + smaller pixel blocks.  This battery re-tunes all three
# bench scenes over the EXTENDED space (16@256, 32@128, 16@512, 32@256
# added to stage 1), persisting winners under the new space hash so the
# driver's cold BENCH_TUNE=auto run applies them, then captures the
# full headline at the new tune.
#
# Run AFTER scripts/r7_measure.sh completes (the min-contrib steps
# there need the OLD space hash to load the round-7 tune).
set -u
cd "$(dirname "$0")/.."
OUT=R7_MEASURE.jsonl
lbl() { echo "{\"label\": \"$1\"}" >> "$OUT"; echo "=== $1 $(date)" >&2; }
run() { timeout "${STEP_TIMEOUT:-7200}" "$@" >> "$OUT" 2>>r7_measure.log; echo "rc=$?" >> "$OUT"; }

lbl packdepth-tune
BENCH_TUNE=1 run python bench.py

lbl packdepth-verify-auto
run python bench.py

lbl done-r7b
