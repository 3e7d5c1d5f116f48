"""Bucketed seen store: crawl equivalence + the shuffle-free
anti-join plan shape (the 10^10-URL scale path)."""

from pyspark.sql import functions as F

from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.fixtures import SCENARIOS
from flyscrape_spark.sources.seen_store import BucketedSeenStore


def canonical(result):
    return [
        (r["depth"], r["discovery_order"], r["url"])
        for r in result.seen.orderBy("discovery_order").collect()
    ]


def test_store_crawl_equals_default(spark):
    scenario = SCENARIOS["depth_cycle"]
    default = CrawlEngine(spark, scenario.config, scenario.transport(spark)).run(
        scenario.seeds
    )
    store = BucketedSeenStore(spark, table="seen_eq_test", buckets=4)
    stored = CrawlEngine(
        spark, scenario.config, scenario.transport(spark), seen_store=store
    ).run(scenario.seeds)
    assert canonical(stored) == canonical(default)


def test_antijoin_does_not_shuffle_seen_side(spark):
    store = BucketedSeenStore(spark, table="seen_plan_test", buckets=8)
    seen = spark.range(100_000).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.xxhash64(F.concat(F.lit("http://h/"), F.col("id"))).alias("url_key"),
        F.lit(0).alias("depth").cast("int"),
        F.col("id").alias("discovery_order"),
    )
    store.append(seen)

    cand = spark.range(50_000, 150_000).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        F.xxhash64(F.concat(F.lit("http://h/"), F.col("id"))).alias("url_key"),
    )
    stored = store.seen().select(
        F.col("url_key").alias("seen_key"), F.col("url").alias("seen_url")
    )
    new = cand.join(
        stored,
        (cand["url_key"] == stored["seen_key"]) & (cand["url"] == stored["seen_url"]),
        "left_anti",
    )
    assert new.count() == 50_000

    plan = new._jdf.queryExecution().executedPlan().toString()
    # bucketed scan on the seen side...
    assert "SelectedBucketsCount" in plan
    # ...and exactly ONE exchange: the candidate side. The seen side
    # is read in place via its bucket partitioning.
    assert plan.count("Exchange") == 1, plan
