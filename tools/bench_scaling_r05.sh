#!/bin/bash
# Round-5 scaling-attribution suite. Run DETACHED from a repo snapshot
# so live edits can't leak into workers:
#   rsync -a --exclude .git /root/repo/ /tmp/benchsnap5/
#   cd /tmp/benchsnap5 && setsid nohup bash tools/bench_scaling_r05.sh \
#       > /tmp/scaling_r05_suite.log 2>&1 &
#
# Phase A is the BASELINE.json N->4N evidence: the prescribed
# local[8]->local[32] pair, PINNED cpuset (taskset 0..N-1), fresh JVM
# per sample, symmetric sampling, bandwidth probes (tools/membw.py on
# the same cpuset before AND after each width's samples) — raw
# efficiency AND URLs/s-per-GB/s side by side. Round-5 engine changes
# under test: table seeds (no driver-side seed serialization),
# body-slimmed generation checkpoints, 2-job deterministic-bucket
# ordering.
# Phase A' adds the 4:16 low-contention cross-check pair.
set -u
cd "$(dirname "$0")/.."

echo "=== phase A: pinned + bandwidth-normalized 8->32 pair ==="
BENCH_SCALING_PAIRS=8:32 BENCH_SCALING_SAMPLES=3 \
BENCH_SCALING_KINDS=kernel,engine BENCH_ENGINE_FP=1 \
BENCH_PIN_CPUS=1 BENCH_BW_NORMALIZE=1 \
  python bench.py --scaling 2>/tmp/scaling_r05_A.err | tee /tmp/scaling_r05_A.log

echo "=== phase A': pinned 4->16 cross-check ==="
BENCH_SCALING_PAIRS=4:16 BENCH_SCALING_SAMPLES=2 \
BENCH_SCALING_KINDS=engine BENCH_ENGINE_FP=1 \
BENCH_PIN_CPUS=1 BENCH_BW_NORMALIZE=1 \
  python bench.py --scaling 2>/tmp/scaling_r05_A2.err | tee /tmp/scaling_r05_A2.log

echo "=== suite done ==="
