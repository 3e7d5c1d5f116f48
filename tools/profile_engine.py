"""Per-stage profile of the engine scaling kernel at one width.

Runs the scaling-config engine kernel (table seeds, fingerprint mode)
once warm + once timed at local[N], then dumps every stage's
executorRunTime, GC time, shuffle read/write bytes, and memory/disk
spill from the Spark UI REST API — the data that says WHERE the
8->32 scaling efficiency goes (Python parse vs JVM shuffle vs GC vs
spill).

  taskset -c 0-7  python tools/profile_engine.py 8
  taskset -c 0-31 python tools/profile_engine.py 32

Env: BENCH_SCALING_ENGINE_PAGES (default 10_000_000),
     PROFILE_SEEDS (default 500_000), PROFILE_DEPTH (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request


def stages_snapshot(ui_url: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui_url}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(os.environ.get("BENCH_SCALING_ENGINE_PAGES", "10000000"))
    seeds = int(os.environ.get("PROFILE_SEEDS", "500000"))
    depth = int(os.environ.get("PROFILE_DEPTH", "1"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import engine_kernel
    from flyscrape_spark.session import get_spark

    spark = get_spark(
        app_name="flyscrape-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl

    engine_kernel(spark, n_pages, seeds=seeds, depth=depth,
                  fingerprint=True, table_seeds=True)  # warm
    before = {s["stageId"] for s in stages_snapshot(ui)}
    result = engine_kernel(spark, n_pages, seeds=seeds, depth=depth,
                           fingerprint=True, table_seeds=True)
    stages = [s for s in stages_snapshot(ui) if s["stageId"] not in before]

    rows = []
    for s in sorted(stages, key=lambda s: s["stageId"]):
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "run_s": round(s["executorRunTime"] / 1e3, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
            "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6),
            "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6),
            "in_mb": round(s.get("inputBytes", 0) / 1e6),
            "out_rows": s.get("outputRecords", 0),
        })
    tot_run = sum(r["run_s"] for r in rows)
    tot_cpu = sum(r["cpu_s"] for r in rows)
    tot_gc = sum(r["gc_s"] for r in rows)
    print(json.dumps({
        "cpus": cpus,
        "kernel": {k: result[k] for k in
                   ("seen", "fetched", "sec", "urls_per_sec", "gen_secs")},
        "totals": {
            "executor_run_s": round(tot_run, 1),
            "executor_cpu_s": round(tot_cpu, 1),
            "gc_s": round(tot_gc, 1),
            "run_minus_cpu_s": round(tot_run - tot_cpu, 1),
            "wall_x_cpus": round(result["sec"] * cpus, 1),
            "idle_s": round(result["sec"] * cpus - tot_run, 1),
        },
        "stages": rows,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
