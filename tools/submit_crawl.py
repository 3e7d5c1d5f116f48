"""spark-submit entry point for the crawl engine (north_rule: "run
via spark-submit --py-files on a multi-executor cluster").

Usage (local sandbox):
    python tools/package.py                       # build dist/flyscrape_spark.zip
    spark-submit --master 'local[8]' \
      --py-files dist/flyscrape_spark.zip \
      tools/submit_crawl.py --sf /root/testdata/sf0.001 --depth 4

On a cluster, swap --master for the cluster manager and add
--num-executors; nothing else changes — the job only uses the
DataFrame API plus the shipped package.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--override", nargs="*", default=[],
                    help="config overrides as key=value (CLI parity)")
    args = ap.parse_args()

    # Under spark-submit the session already exists; build on it.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from flyscrape_spark.config import CrawlConfig, apply_overrides
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.snapshots import SnapshotStore
    from flyscrape_spark.sources.transport import JoinTransport
    from flyscrape_spark.queries import synthetic_pages

    config = CrawlConfig(depth=args.depth, domain_filter=False)
    overrides = dict(kv.split("=", 1) for kv in args.override)
    config = apply_overrides(config, overrides)

    pages = synthetic_pages(spark, args.sf)
    store = SnapshotStore(args.checkpoint) if args.checkpoint else None
    engine = CrawlEngine(spark, config, JoinTransport(pages, config),
                         checkpoint=store)
    result = engine.run(["http://h0.example/d/0"])
    print("CRAWL_RESULT:" + json.dumps({
        "seen": result.seen.count(),
        "fetched": result.results.count(),
        "generations": result.generations,
        "metrics": result.metrics,
    }))


if __name__ == "__main__":
    main()
