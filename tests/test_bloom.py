"""BroadcastBloom: filter-theoretic guarantees (zero false negatives,
bounded false positives) and engine equivalence — a bloom-prefiltered
crawl must produce EXACTLY the same seen set, crawl order and results
as the plain anti-join engine on every fixture scenario."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.bloom import BroadcastBloom
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.fixtures import SCENARIOS


def test_no_false_negatives_and_bounded_fp(spark):
    n = 20_000
    added = spark.range(n).select((F.col("id") * 2654435761).alias("url_key"))
    other = spark.range(n).select(
        (F.col("id") * 2654435761 + 1).alias("url_key")
    )
    bloom = BroadcastBloom(spark, n_bits=1 << 20, n_hashes=4)
    bloom.add_keys(added)

    probe = bloom.might_contain()
    hits = added.filter(probe(F.col("url_key"))).count()
    assert hits == n, "bloom must never produce a false negative"

    # m/n ≈ 52 bits/key at k=4 → theoretical fp ~1e-4; allow 1%
    fp = other.filter(probe(F.col("url_key"))).count()
    assert fp < n * 0.01, f"false-positive rate too high: {fp}/{n}"


def test_split_partitions_exactly(spark):
    df = spark.range(1000).select(F.col("id").alias("url_key"))
    bloom = BroadcastBloom(spark, n_bits=1 << 16)
    bloom.add_keys(df.filter(F.col("url_key") < 500))
    maybe, fresh = bloom.split(df)
    assert maybe.count() + fresh.count() == 1000
    # everything < 500 was added: must all land on the maybe side
    assert maybe.filter(F.col("url_key") < 500).count() == 500
    assert fresh.filter(F.col("url_key") < 500).count() == 0


def test_incremental_add(spark):
    bloom = BroadcastBloom(spark, n_bits=1 << 16)
    a = spark.range(100).select(F.col("id").alias("url_key"))
    b = spark.range(100, 200).select(F.col("id").alias("url_key"))
    bloom.add_keys(a)
    bloom.add_keys(b)
    probe = bloom.might_contain()
    both = a.unionByName(b)
    assert both.filter(probe(F.col("url_key"))).count() == 200
    assert bloom.n_added == 2


@pytest.mark.parametrize("name", ["follow_default", "depth_cycle", "domain_allow"])
def test_engine_with_bloom_matches_plain(spark, name):
    scenario = SCENARIOS[name]

    def run(bloom):
        engine = CrawlEngine(
            spark, scenario.config, scenario.transport(spark), seen_bloom=bloom
        )
        result = engine.run(scenario.seeds)
        seen = sorted(
            (r["url"], r["depth"], r["discovery_order"])
            for r in result.seen.collect()
        )
        fetched = sorted(r["url"] for r in result.results.collect())
        return seen, fetched

    plain = run(None)
    bloomed = run(BroadcastBloom(spark, n_bits=1 << 16))
    assert bloomed == plain
