#!/bin/bash
# Round-8c: final tune at batch 64 over the v3 space (64-deep packing
# candidates; which1 now tunes under its own key with the aniso VMEM
# fix), persisting winners to the committed store, then the warm-auto
# and cold-machine driver scenarios.
set -u
cd "$(dirname "$0")/.."
OUT=R8_MEASURE.jsonl
lbl() { echo "{\"label\": \"$1\"}" >> "$OUT"; echo "=== $1 $(date)" >&2; }
run() { timeout "${STEP_TIMEOUT:-18000}" "$@" >> "$OUT" 2>>r8_measure.log; echo "rc=$?" >> "$OUT"; }

lbl retune-b64
BENCH_TUNE=1 SRT_TUNE_REPO=1 run python bench.py

lbl verify-auto-warm-b64
run python bench.py

lbl verify-cold-machine-b64
SRT_CACHE_DIR=$(mktemp -d /tmp/srt_cold.XXXX) run python bench.py

lbl done-r8c
