"""Round-3 session-2 operators: TrustRank, vocabulary build, KMV
distinct sketch, deterministic shard export — hand-computed values
plus the invariants each operator exists to provide."""

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.graph import trustrank
from flyscrape_spark.operators.mixing import shard_export
from flyscrape_spark.operators.sketches import kmv_distinct
from flyscrape_spark.operators.text import vocab_build


@pytest.fixture
def chain(spark):
    # seed 0 -> 1 -> 2 (spam reachable only via 1); 3 isolated spam
    edges = spark.createDataFrame(
        [(0, 1), (1, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    seeds = spark.createDataFrame([(0,)], "node long")
    return nodes, edges, seeds


def test_trustrank_one_iteration_by_hand(chain):
    nodes, edges, seeds = chain
    tr = {r["node"]: r["tr"] for r in
          trustrank(nodes, edges, seeds, iterations=1, damping=0.85).collect()}
    # start = s = (1,0,0,0); t1(0) = 0.15*1, t1(1) = 0.85 * 1/1,
    # t1(2) = 0.85 * 0 (node 1 had trust 0 at t0), t1(3) = 0
    assert tr[0] == pytest.approx(0.15, abs=1e-12)
    assert tr[1] == pytest.approx(0.85, abs=1e-12)
    assert tr[2] == pytest.approx(0.0, abs=1e-12)
    assert tr[3] == pytest.approx(0.0, abs=1e-12)


def test_trustrank_attenuates_with_distance(chain):
    nodes, edges, seeds = chain
    tr = {r["node"]: r["tr"] for r in
          trustrank(nodes, edges, seeds, iterations=3).collect()}
    # trust strictly decreases along the chain; unreachable spam = 0
    assert tr[0] > 0 and tr[1] > tr[2] > 0
    assert tr[3] == pytest.approx(0.0, abs=1e-12)


def test_vocab_build_counts_and_rank(spark):
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "the dog ran"),
         (3, "THE  The")],  # normalization folds case + whitespace
        "doc_id long, text string",
    )
    rows = {r["token"]: r for r in vocab_build(docs, min_df=2).collect()}
    # 'the': tf 2+1+1+1? doc3 normalizes to 'the the' -> tf 5, df 4
    assert rows["the"]["tf"] == 5 and rows["the"]["df"] == 4
    assert rows["cat"]["tf"] == 2 and rows["cat"]["df"] == 2
    assert rows["ran"]["df"] == 2
    assert "sat" not in rows and "dog" not in rows  # df 1 < min_df
    # rank: tf desc, token asc -> the(1), then cat/ran tf=2 tie
    assert rows["the"]["vocab_id"] == 1
    assert rows["cat"]["vocab_id"] == 2 and rows["ran"]["vocab_id"] == 3


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", f"k{i}") for i in range(5)] + [("a", "k0"), ("b", "x")],
        "g string, key string",
    )
    out = {r["g"]: r for r in kmv_distinct(df, "key", ["g"], k=8).collect()}
    # below k distinct keys -> estimate is exact
    assert out["a"]["n_min_hashes"] == 5 and out["a"]["distinct_est"] == 5.0
    assert out["b"]["distinct_est"] == 1.0


def test_kmv_estimate_accuracy_and_partition_invariance(spark):
    n = 2000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("key")
    )
    for parts in (1, 7):
        row = kmv_distinct(
            df.repartition(parts), "key", ["g"], k=64
        ).collect()[0]
        assert row["n_min_hashes"] == 64
        # KMV relative error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
        assert abs(row["distinct_est"] - n) / n < 0.4
        # deterministic: same estimate at any partitioning
        if parts == 1:
            first = row["distinct_est"]
    assert row["distinct_est"] == first


def test_shard_export_deterministic_and_dense(spark):
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    a = shard_export(docs, n_shards=4).collect()
    b = shard_export(docs.repartition(13), n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    assert sum(len(v) for v in by_shard.values()) == 100
