"""Export/packing batch: weighted packing, byte shards, canonical
pick, interleaved multimodal packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flyscrape_spark.operators.cluster import canonical_pick
from flyscrape_spark.operators.mixing import byte_packed_shards, pack_weighted
from flyscrape_spark.operators.multimodal import interleave_pack


def test_pack_weighted_bins(spark):
    rows = spark.createDataFrame(
        [(1, 40), (2, 40), (3, 40), (4, 100), (5, 1)],
        "doc_id long, w long",
    )
    out = {r["doc_id"]: r for r in
           pack_weighted(rows, budget=100, weight_col="w").collect()}
    # doc 1-2 fill bin 0 (cum 0, 40); doc 3 starts at 80, straddles
    # into bin 1; doc 4 starts at 120 (bin 1), ends at 219 (bin 2)
    assert (out[1]["bin_start"], out[1]["offset"]) == (0, 0)
    assert (out[2]["bin_start"], out[2]["offset"]) == (0, 40)
    assert (out[3]["bin_start"], out[3]["bin_end"]) == (0, 1)
    assert (out[4]["bin_start"], out[4]["bin_end"]) == (1, 2)
    assert (out[5]["bin_start"], out[5]["offset"]) == (2, 20)


def test_pack_weighted_partitioning_independent(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df1 = spark.createDataFrame(rows, "doc_id long, w long")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, pack_weighted(df1, 50, "w", parts=2).collect()))
    b = sorted(map(tuple, pack_weighted(df8, 50, "w", parts=7).collect()))
    assert a == b


def test_byte_packed_shards_sizes(spark):
    docs = spark.createDataFrame(
        [(i, 30) for i in range(10)], "doc_id long, n_chars long"
    )
    out = byte_packed_shards(docs, shard_bytes=100)
    sizes = (
        out.groupBy("shard_id").agg(F.sum("n_bytes").alias("b")).collect()
    )
    # 300 bytes / 100 -> docs assigned to shard where they START:
    # shard 0 gets docs 0-3 (0,30,60,90), shard 1 docs 4-6, shard 2
    # docs 7-9
    got = {r["shard_id"]: r["b"] for r in sizes}
    assert got == {0: 120, 1: 90, 2: 90}


def test_canonical_pick_longest_wins(spark):
    labeled = spark.createDataFrame(
        [
            (1, 100, 500), (2, 100, 900), (3, 100, 900),  # tie -> doc 2
            (9, 200, 10),                                  # singleton
        ],
        "doc_id long, cluster_id long, n_chars long",
    )
    out = {r["cluster_id"]: r for r in canonical_pick(labeled).collect()}
    assert (out[100]["keeper_doc_id"], out[100]["cluster_size"],
            out[100]["n_discarded"], out[100]["keeper_quality"]) == (
        2, 3, 2, 900,
    )
    assert (out[200]["keeper_doc_id"], out[200]["n_discarded"]) == (9, 0)


def test_interleave_pack_media_cost(spark):
    spans = spark.createDataFrame(
        [
            (1, "text", "one two three", None),
            (1, "media", "", "img://1/1"),
            (2, "text", "four five", None),
        ],
        "doc_id long, kind string, text string, media_ref string",
    )
    out = {r["doc_id"]: r for r in
           interleave_pack(spans, seq_len=100,
                           tokens_per_media=50).collect()}
    assert (out[1]["n_text_tokens"], out[1]["n_media"],
            out[1]["n_tokens"]) == (3, 1, 53)
    # doc 2 starts at cum 53, same window
    assert (out[2]["n_tokens"], out[2]["cum_before"],
            out[2]["seq_start"], out[2]["offset"]) == (2, 53, 0, 53)
