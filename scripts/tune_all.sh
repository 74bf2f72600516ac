#!/bin/bash
# On-TPU runbook: re-tune every bench sub-benchmark's engine knobs and
# record the tuned headline numbers.
#
# BENCH_TUNE=1 runs the greedy on-device autotune (utils/autotune.py)
# for the bunny-class headline, the occluded-terrain scene, and the
# 340k-tri VMEM tier, persisting each winner next to the scene cache
# (~/.cache/shader_ray_tpu/tune-*.json).  A later plain `python
# bench.py` (BENCH_TUNE defaults to "auto") applies those tunes at
# zero cost — including the driver's end-of-round run.
#
# The tune measures ~17 candidates x 3 scenes; each candidate is one
# XLA program (7-260 s cold compile on the axon remote compiler, ~15 s
# with the persistent compile cache), so the first run can take over
# an hour.  Re-runs are cache hits.
set -u
cd "$(dirname "$0")/.."

echo "=== tune + bench $(date) ===" >&2
BENCH_TUNE=1 timeout 10800 python bench.py
rc=$?
echo "=== rc=$rc $(date) ===" >&2
ls -la ~/.cache/shader_ray_tpu/tune-*.json 2>/dev/null >&2
exit $rc
