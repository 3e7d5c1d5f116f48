"""Politeness + skew: per-host request spacing respects the rate
budget across salted shards, and hot-host salting keeps partition
sizes under 2x median (FIXTURES.md `politeness` scenario;
reference spacing semantics: modules/ratelimit/ratelimit_test.go:21-56,
but per-host instead of global)."""

from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from flyscrape_spark.operators.politeness import (
    host_fanout,
    partition_skew,
    schedule,
    with_shards,
)
from flyscrape_spark.sources.synth import synthetic_frontier


@pytest.fixture(scope="module")
def hot_frontier(spark):
    # one hot host (~80% of URLs) + long tail: skew=6 over few hosts
    df = synthetic_frontier(spark, 4000, n_hosts=20, skew=6.0)
    df = df.withColumn("discovery_order", F.col("id"))
    return df.localCheckpoint(eager=True)


def test_hot_host_is_salted_and_skew_bounded(spark, hot_frontier):
    fan = host_fanout(hot_frontier)
    fans = {r["host"]: r["fanout"] for r in fan.collect()}
    counts = {r["host"]: r["host_rows"] for r in fan.collect()}
    hottest = max(counts, key=counts.get)
    assert counts[hottest] > 0.5 * sum(counts.values())  # fixture really is hot
    assert fans[hottest] > 8  # hot host heavily fanned out
    assert min(fans.values()) == 1  # tail hosts unsalted

    sharded = with_shards(hot_frontier, fan)
    skew = partition_skew(sharded)
    assert skew["ratio"] < 2.0, f"salted partition skew too high: {skew}"


def test_per_host_spacing_respects_budget(spark, hot_frontier):
    rate = 600.0  # req/min -> 0.1 s global interval per host
    scheduled = schedule(hot_frontier, rate)
    rows = scheduled.select("host", "shard", "fetch_time").collect()

    per_host_times = defaultdict(list)
    for r in rows:
        per_host_times[r["host"]].append(r["fetch_time"])

    interval = 60.0 / rate
    for host, times in per_host_times.items():
        times.sort()
        gaps = [b - a for a, b in zip(times, times[1:])]
        assert all(g >= interval - 1e-9 for g in gaps), (
            f"host {host} paced too fast: min gap {min(gaps):.4f} < {interval}"
        )


def test_schedule_is_deterministic(spark, hot_frontier):
    a = schedule(hot_frontier, 600.0).select("url", "fetch_time").collect()
    b = schedule(hot_frontier, 600.0).select("url", "fetch_time").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
