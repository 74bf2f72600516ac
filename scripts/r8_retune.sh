#!/bin/bash
# Round-8: re-tune on a freshly imaged host + commit the winners.
#
# The per-round machine re-image wipes ~/.cache/shader_ray_tpu (scene
# cache, XLA compile cache, AND the round-7 tune files), so the
# driver's end-of-round BENCH_TUNE=auto bench would have run untuned
# (~233 Mrays/s instead of the tuned ~340).  This battery re-runs the
# full greedy tune over the round-8 space (pruned + deep-packing
# frontier, see autotune.DEFAULT_SPACE) with SRT_TUNE_REPO=1 so the
# winners persist into <repo>/tunes (committed, survives re-imaging),
# then verifies the exact driver scenario: a pristine cache dir where
# the ONLY warm state is the repo checkout.
set -u
cd "$(dirname "$0")/.."
OUT=R8_MEASURE.jsonl
lbl() { echo "{\"label\": \"$1\"}" >> "$OUT"; echo "=== $1 $(date)" >&2; }
run() { timeout "${STEP_TIMEOUT:-14400}" "$@" >> "$OUT" 2>>r8_measure.log; echo "rc=$?" >> "$OUT"; }

lbl retune
BENCH_TUNE=1 SRT_TUNE_REPO=1 run python bench.py

lbl verify-auto-warm
run python bench.py

lbl verify-cold-machine
# pristine cache dir = next round's driver run: tunes must load from
# the repo store; compiles are cold (measures the driver's worst case)
SRT_CACHE_DIR=$(mktemp -d /tmp/srt_cold.XXXX) run python bench.py

lbl done-r8
