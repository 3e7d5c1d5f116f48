#!/bin/bash
# Round-3 scaling evidence suite. Run DETACHED from a repo snapshot so
# live edits can't leak into workers:
#   rsync -a --exclude .git /root/repo/ /tmp/benchsnap/
#   cd /tmp/benchsnap && setsid nohup bash tools/bench_scaling_r03.sh \
#       > /tmp/scaling_r03_suite.log 2>&1 &
#
# Phases (each appends JSON lines to its own log under /tmp):
#  A. prescribed pair 8->32, fp128 kernel + fingerprint engine, 3 samples
#  B. intermediate 6->24 and cross-check 4->16 pairs, 2 samples
#  C. kernel thread curve 1..32 (per-thread saturation study)
#  D. numpy STREAM-triad curve (raw host bandwidth, no Spark anywhere)
set -u
cd "$(dirname "$0")/.."

echo "=== phase A: prescribed 8->32 pair (fp128 kernel + fp engine) ==="
BENCH_SCALING_PAIRS=8:32 BENCH_SCALING_SAMPLES=3 \
BENCH_SCALING_KINDS=kernel,engine BENCH_ENGINE_FP=1 \
  python bench.py --scaling 2>/tmp/scaling_r03_A.err | tee /tmp/scaling_r03_A.log

echo "=== phase B: 6->24 intermediate + 4->16 cross-check ==="
BENCH_SCALING_PAIRS=6:24,4:16 BENCH_SCALING_SAMPLES=2 \
BENCH_SCALING_KINDS=kernel,engine BENCH_ENGINE_FP=1 \
  python bench.py --scaling 2>/tmp/scaling_r03_B.err | tee /tmp/scaling_r03_B.log

echo "=== phase C: kernel thread curve ==="
for n in 1 2 4 8 12 16 24 32; do
  SPARK_DRIVER_MEMORY=16g python bench.py --worker "$n" kernel \
    2>>/tmp/scaling_r03_C.err | grep WORKER_JSON \
    | sed "s/^WORKER_JSON:/{\"threads\": $n, \"result\": /;s/$/}/" \
    | tee -a /tmp/scaling_r03_C.log
done

echo "=== phase D: raw memory-bandwidth curve ==="
python tools/membw.py 1 2 4 8 16 24 32 2>/tmp/scaling_r03_D.err \
  | tee /tmp/scaling_r03_D.log

echo "=== suite done ==="
