#!/bin/bash
# Round-7 on-TPU measurement battery: everything that landed while the
# axon tunnel was down, measured in dependency order.  Each step is a
# separate process (bench.py waits for the backend itself, in killable
# subprocess probes); results append as labeled JSON lines to
# R7_MEASURE.jsonl so a tunnel flap mid-battery loses nothing.
#
#   1. fresh headline (BENCH_TUNE=auto applies persisted round-6 tunes)
#   2. SBVH A/B (SRT_SPLITS=sbvh) on bunny / occluded terrain / 340k —
#      spatial splits were deprioritized-by-analysis in round 4 but the
#      builder landed in round 7; adopt per scene only if measured faster
#   3. SRT_MIN_CONTRIB: image error (on-device A/B) then frame time at
#      0.003 / 0.01 on the dielectric bench scene (F0=0.05 needs
#      >= 0.0026 to retire anything)
#
# Every A/B uses BENCH_OCCLUDED/EXTRAS=0 to isolate one scene per run.
set -u
cd "$(dirname "$0")/.."
OUT=R7_MEASURE.jsonl
lbl() { echo "{\"label\": \"$1\"}" >> "$OUT"; echo "=== $1 $(date)" >&2; }
run() { timeout "${STEP_TIMEOUT:-7200}" "$@" >> "$OUT" 2>>r7_measure.log; echo "rc=$?" >> "$OUT"; }

lbl baseline-fresh
run python bench.py

# tuned baseline: the greedy on-device search PERSISTS its winners per
# (scene key, statics, device) next to the scene cache, so every later
# bench run — including the driver's cold end-of-round one with
# BENCH_TUNE=auto — applies them at zero cost (VERDICT r2 #2)
lbl baseline-tuned
BENCH_TUNE=1 run python bench.py

# on-chip golden gate (now on 0-1-scale tolerances): production frame
# and 5x5-oracle frame must still match the committed goldens
lbl golden-verify
run python scripts/make_golden.py --verify

lbl sbvh-bunny
SRT_SPLITS=sbvh BENCH_OCCLUDED=0 BENCH_EXTRAS=0 run python bench.py
lbl sbvh-terrain
SRT_SPLITS=sbvh BENCH_EXTRAS=0 run python bench.py
lbl sbvh-340k
SRT_SPLITS=sbvh BENCH_TRIS=340000 BENCH_OCCLUDED=0 BENCH_EXTRAS=0 run python bench.py

lbl min-contrib-error
run python scripts/ab_min_contrib.py 0.003 0.01
lbl min-contrib-0.003
SRT_MIN_CONTRIB=0.003 BENCH_OCCLUDED=0 BENCH_EXTRAS=0 run python bench.py
lbl min-contrib-0.01
SRT_MIN_CONTRIB=0.01 BENCH_OCCLUDED=0 BENCH_EXTRAS=0 run python bench.py

lbl done
