"""Politeness-under-real-I/O bench (round-3 verdict item #6): fetch a
localhost many-vhost server through the FULL politeness schedule
(host fan-out -> salted (host, shard) repartition -> token-bucket
fetch_time offsets -> HttpTransport thread pool awaiting them) and
evidence the north rule's per-host budget with server-side arrival
timestamps.

Many vhosts without DNS: every 127.0.0.x loopback address routes to
the same listener on Linux, so host k is ``127.0.0.{k+2}:PORT`` — a
distinct URL host (distinct politeness key, distinct token bucket)
on one real socket. The server records (Host header, monotonic
arrival time) per request; after each crawl the grid row reports

- achieved pages/sec vs the per-host-budget theoretical ceiling
  (hosts * 1 page per interval once buckets drain),
- per-host SUSTAINED rate: (pages-1) / (last_arrival -
  first_arrival) per host, worst host reported as a ratio to the
  budget 1/interval — the robust compliance metric (single-arrival
  gaps carry accept-queue/GIL jitter of tens of ms: a DELAYED
  earlier request shrinks the next gap without any client-side
  budget violation; the client enforces start-to-start spacing),
- the min same-host inter-arrival gap (informational) and HARD
  violations (gaps < 50% of the interval — a genuine burst, like
  the pre-round-4 clock-anchor bug produced, not jitter).

Run: python tools/bench_politeness.py  (env BENCH_POLITE_GRID to
override, e.g. "4x8:0.2,16x4:0.1" = hosts x pages_per_host : interval)
Prints one JSON line per grid cell + a summary line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARRIVALS: list[tuple[str, float]] = []
_LOCK = threading.Lock()


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        with _LOCK:
            ARRIVALS.append((self.headers.get("Host", "?"),
                             time.monotonic()))
        body = b"<html><body><p>ok</p></body></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def run_cell(spark, port: int, hosts: int, pages: int,
             interval: float) -> dict:
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.transport import HttpTransport

    with _LOCK:
        ARRIVALS.clear()
    seeds = [
        f"http://127.0.0.{h + 2}:{port}/h{h}/p{p}"
        for h in range(hosts)
        for p in range(pages)
    ]
    rate_per_min = 60.0 / interval
    config = CrawlConfig(depth=0, domain_filter=False, rate=rate_per_min,
                         retry_delays=(0.05,))
    transport = HttpTransport(config, timeout=5.0, pool_size=64)
    t0 = time.monotonic()
    r = CrawlEngine(spark, config, transport,
                    collect_metrics=False).run(seeds)
    n_ok = r.results.filter("status = 200").count()
    wall = time.monotonic() - t0

    with _LOCK:
        snapshot = list(ARRIVALS)
    per_host: dict[str, list[float]] = defaultdict(list)
    for host, ts in snapshot:
        per_host[host].append(ts)
    gaps = []
    worst_rate_ratio = 0.0
    for ts in per_host.values():
        ts.sort()
        gaps.extend(b - a for a, b in zip(ts, ts[1:]))
        if len(ts) > 1:
            span = ts[-1] - ts[0]
            rate = (len(ts) - 1) / span if span > 0 else float("inf")
            worst_rate_ratio = max(worst_rate_ratio, rate * interval)
    min_gap = round(min(gaps), 4) if gaps else None
    hard_violations = sum(1 for g in gaps if g < 0.5 * interval)
    # each host serially paced at `interval` -> the fetch phase's
    # floor is (pages-1)*interval; everything else (Spark job setup,
    # schedule shuffle, parse) rides on top
    floor = (pages - 1) * interval
    return {
        "hosts": hosts, "pages_per_host": pages,
        "interval_sec": interval, "rate_per_min": rate_per_min,
        "fetched_ok": n_ok, "expected": hosts * pages,
        "wall_sec": round(wall, 2),
        "pages_per_sec": round(n_ok / wall, 1),
        "ideal_floor_sec": round(floor, 2),
        "pacing_overhead_sec": round(wall - floor, 2),
        "min_same_host_gap_sec": min_gap,
        # worst host's sustained rate as a multiple of its budget
        # (<= ~1.0 + jitter allowance = compliant)
        "worst_host_rate_vs_budget": round(worst_rate_ratio, 3),
        "hard_violations": hard_violations,
        "distinct_hosts_seen": len(per_host),
    }


def main() -> None:
    from flyscrape_spark.session import get_spark

    grid_env = os.environ.get(
        "BENCH_POLITE_GRID", "4x8:0.2,16x8:0.2,64x4:0.2,16x8:0.1")
    cells = []
    for item in grid_env.split(","):
        hp, interval = item.split(":")
        h, p = hp.split("x")
        cells.append((int(h), int(p), float(interval)))

    srv = ThreadingHTTPServer(("0.0.0.0", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_port

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="flyscrape-politeness-bench",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    # warm-up: one tiny crawl compiles codegen + starts worker pool
    run_cell(spark, port, 2, 2, 0.05)

    rows = []
    for h, p, d in cells:
        row = run_cell(spark, port, h, p, d)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"politeness_grid": rows}))
    spark.stop()
    srv.shutdown()


if __name__ == "__main__":
    main()
