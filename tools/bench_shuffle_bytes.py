"""Quantify the seen-join's shuffle traffic: bytes and records shuffled
per frontier URL, exact mode (url_key + URL string through the
shuffle) vs fp128 mode (two 64-bit keys, no strings) — the measured
basis for the round-2 verdict's "make the kernel's bytes-shuffled/URL
drop" item.

One fresh SparkSession per mode (UI enabled); after the kernel runs,
the Spark REST API's completed-stage list is summed for shuffle
read/write bytes and records. Prints one JSON line per mode plus a
comparison line.

Usage: python tools/bench_shuffle_bytes.py [n_urls] [cpus]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")


def _rest(port: int, path: str):
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def measure(mode: str, n_urls: int, cpus: int) -> dict:
    from bench import frontier_kernel
    from flyscrape_spark.session import get_spark

    spark = get_spark(
        app_name=f"shuffle-bytes-{mode}",
        master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.port": "4050"},
    )
    port = int(spark.conf.get("spark.ui.port"))
    try:
        result = frontier_kernel(spark, n_urls, mode=mode)
        app_id = spark.sparkContext.applicationId
        stages = _rest(port, f"applications/{app_id}/stages?status=COMPLETE")
        # the kernel runs its timed count 3x + 1 warm-up; to charge ONE
        # logical execution, divide the aggregate by the number of
        # identical count jobs (4) — every shuffle stage reruns per job
        # because the anti-join output is never cached (that is the
        # benchmarked behavior: one generation = one pass)
        runs = 4
        wb = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        wr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
        rb = sum(s.get("shuffleReadBytes", 0) for s in stages)
        out = {
            "mode": mode,
            "n_urls": n_urls,
            "urls_per_sec": result["urls_per_sec"],
            "shuffle_write_bytes_per_run": wb // runs,
            "shuffle_read_bytes_per_run": rb // runs,
            "shuffle_write_records_per_run": wr // runs,
            "bytes_per_url": round(wb / runs / n_urls, 2),
        }
        print("MODE_JSON:" + json.dumps(out), flush=True)
        return out
    finally:
        spark.stop()


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    exact = measure("exact", n_urls, cpus)
    fp = measure("fp128", n_urls, cpus)
    print("COMPARE_JSON:" + json.dumps({
        "n_urls": n_urls,
        "cpus": cpus,
        "exact_bytes_per_url": exact["bytes_per_url"],
        "fp128_bytes_per_url": fp["bytes_per_url"],
        "reduction": round(1 - fp["bytes_per_url"] / exact["bytes_per_url"], 3)
        if exact["bytes_per_url"] else None,
    }), flush=True)


if __name__ == "__main__":
    main()
