"""Scaling microbench for the round-4 prefix-sum kernels
(pack_weighted, waterfill) at two parallelism widths.

Purpose: scaling ATTRIBUTION evidence. These kernels are
compute-light (one range shuffle + an Arrow cumsum + O(partitions)
driver metadata) where the frontier kernel is memory-bandwidth-heavy
(wide shuffles of URL rows). If they scale well on the same box
where the frontier kernel reads ~0.58, the gap is the socket's
bandwidth ceiling (tools/membw.py curve), not the plan architecture
— the same attribution argument as BENCH.md round-4 phase A, made
with a second, differently-bound workload.

Methodology (matches tools/bench_scaling_r04.sh phase A): fresh JVM
per width via a child process, pinned to cpus 0..width-1 with
taskset, input synthesized by spark.range (no I/O), first sample
discarded as JVM warmup, JSON line per sample.

Usage:  python tools/bench_pack_scaling.py            # 8 and 32
        python tools/bench_pack_scaling.py --child 8  # one width
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PACK_ROWS = 20_000_000
WF_HOSTS = 4_000_000
SAMPLES = 3  # first is warmup, reported but flagged


def child(width: int) -> None:
    # the interpreter puts tools/ (the script dir) on sys.path, not
    # the repo root — add it so the package imports in the child
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from flyscrape_spark.operators.budget import waterfill
    from flyscrape_spark.operators.mixing import pack_weighted
    from flyscrape_spark.session import get_spark

    spark = get_spark(
        master=f"local[{width}]",
        shuffle_partitions=width,
        app_name=f"packbench{width}",
    )
    for sample in range(SAMPLES):
        base = spark.range(PACK_ROWS).select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 2654435761) % 997 + 1).alias("w"),
        )
        t0 = time.time()
        packed = pack_weighted(base, budget=100_000, weight_col="w",
                               parts=width)
        row = packed.agg(
            F.sum("bin_start").alias("s"), F.max("bin_end").alias("m")
        ).collect()[0]
        dt = time.time() - t0
        print(json.dumps({
            "kernel": "pack_weighted", "width": width, "sample": sample,
            "warmup": sample == 0, "rows": PACK_ROWS,
            "sec": round(dt, 3), "rows_per_s": round(PACK_ROWS / dt),
            "check": int(row["m"]),
        }), flush=True)

        hosts = spark.range(WF_HOSTS).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            (F.col("id") % 1000 + 1).alias("demand"),
            ((F.col("id") % 7 + 1) * 25).alias("cap"),
        )
        t0 = time.time()
        plan = waterfill(hosts, budget=WF_HOSTS * 40, parts=width)
        row = plan.agg(F.sum("alloc").alias("a")).collect()[0]
        dt = time.time() - t0
        print(json.dumps({
            "kernel": "waterfill", "width": width, "sample": sample,
            "warmup": sample == 0, "rows": WF_HOSTS,
            "sec": round(dt, 3), "rows_per_s": round(WF_HOSTS / dt),
            "check": round(float(row["a"])),
        }), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    widths = [int(w) for w in (sys.argv[1:] or ["8", "32"])]
    for w in widths:
        cmd = [
            "taskset", "-c", f"0-{w - 1}",
            sys.executable, os.path.abspath(__file__), "--child", str(w),
        ]
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
