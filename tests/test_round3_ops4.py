"""Round-3 batch-2 operators: linear quality classifier, int8
embedding quantization, SemDeDup, LSH precision/recall eval —
hand-computed values plus each operator's core invariant."""

import math

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.classifier import linear_quality_score
from flyscrape_spark.operators.dedup import lsh_eval
from flyscrape_spark.operators.quantize import quantize_int8
from flyscrape_spark.operators.semdedup import semantic_dedup


def test_linear_quality_score_by_hand(spark):
    docs = spark.createDataFrame(
        [(0, "good good bad"), (1, "")], "doc_id long, text string"
    )
    # weights: every feature scores +1 except the one 'bad' hashes to
    from flyscrape_spark.functions.hashing import portable_hash64

    dim = 16
    bad_feat = (
        spark.range(1)
        .select(F.pmod(portable_hash64(F.lit("bad")), F.lit(dim)).alias("f"))
        .collect()[0]["f"]
    )
    good_feat = (
        spark.range(1)
        .select(F.pmod(portable_hash64(F.lit("good")), F.lit(dim)).alias("f"))
        .collect()[0]["f"]
    )
    assert bad_feat != good_feat  # fixture sanity at dim=16
    weights = spark.range(dim).select(
        F.col("id").alias("feature"),
        F.when(F.col("id") == bad_feat, -1.0).otherwise(1.0).alias("weight"),
    )
    rows = {
        r["doc_id"]: r
        for r in linear_quality_score(docs, weights, dim=dim).collect()
    }
    # doc 0: z = (2*1 + 1*(-1)) / 3 = 1/3 -> sigmoid
    want = 1.0 / (1.0 + math.exp(-1.0 / 3.0))
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["score"] == pytest.approx(want, abs=1e-6)
    # empty doc: scored at the bias point (sigmoid(0) = 0.5)
    assert rows[1]["n_tokens"] == 0
    assert rows[1]["score"] == pytest.approx(0.5, abs=1e-12)


def test_quantize_int8_codes_and_mse(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 5.0]), (1, [10.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    # dim 0: lo=0 hi=10 scale=10/255; endpoints code to 0 and 255
    assert rows[0]["codes"][0] == 0
    assert rows[1]["codes"][0] == 255
    # dim 1 constant -> code 0, zero reconstruction error everywhere
    assert rows[0]["codes"][1] == 0 and rows[1]["codes"][1] == 0
    assert rows[0]["mse"] == pytest.approx(0.0, abs=1e-9)
    assert rows[1]["mse"] == pytest.approx(0.0, abs=1e-9)


def test_quantize_int8_bounds_error(spark):
    # codes stay in [0, levels]; reconstruction error <= scale/2 per dim
    import random

    rng = random.Random(7)
    data = [(i, [rng.uniform(-3, 3) for _ in range(4)]) for i in range(50)]
    emb = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    out = quantize_int8(emb).collect()
    lo = [min(v[d] for _, v in data) for d in range(4)]
    hi = [max(v[d] for _, v in data) for d in range(4)]
    scale = [(hi[d] - lo[d]) / 255.0 for d in range(4)]
    max_mse = sum((s / 2) ** 2 for s in scale) / 4
    for r in out:
        assert all(0 <= c <= 255 for c in r["codes"])
        assert r["mse"] <= max_mse + 1e-9


def test_semantic_dedup_drops_junior_in_cluster(spark):
    # two tight groups on orthogonal axes; k=2 splits them; within
    # each group the junior (larger-id) near-duplicate is dropped
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.99, 0.01]),   # ~cos 1 with vec 0 -> dropped
            (3, [0.01, 0.99]),   # ~cos 1 with vec 1 -> dropped
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in
            semantic_dedup(emb, k=2, iterations=1, tau=0.9).collect()}
    assert rows[0]["keep"] and rows[1]["keep"]
    assert not rows[2]["keep"] and not rows[3]["keep"]
    # the senior survivor shares its cluster with the dropped junior
    assert rows[0]["cluster"] == rows[2]["cluster"]
    assert rows[1]["cluster"] == rows[3]["cluster"]


def test_semantic_dedup_cross_cluster_pairs_ignored(spark):
    # identical vectors that k-means separates are NOT compared:
    # the quadratic stage is strictly within-cluster (SemDeDup's
    # tractability contract) — seed two far clusters, verify an
    # orthogonal singleton keeps itself
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(emb, k=2, iterations=1, tau=0.5)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert all(rows[i]["keep"] for i in range(3))


def test_lsh_eval_counts(spark):
    # two exact duplicates + one unrelated doc: candidates and truth
    # both contain exactly the duplicate pair -> precision=recall=1
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    r = lsh_eval(docs, num_hashes=16, bands=4, n=3, threshold=0.2).collect()[0]
    assert r["n_true"] == 1
    assert r["n_hit"] == 1
    assert r["recall"] == pytest.approx(1.0)
    assert r["n_candidates"] >= 1
    assert 0.0 < r["precision"] <= 1.0
