"""Round-4 events operators: JSON props rollup and windowed burst
detection."""

from __future__ import annotations

import json

SF = "/root/testdata/sf0.001"


def test_events_json_rollup_matches_python(spark):
    """Aggregates must reconcile with a driver-side parse of the same
    JSON payloads."""
    from flyscrape_spark.queries import q_events_json_rollup

    rows = {r["event_type"]: r
            for r in q_events_json_rollup(spark, SF).collect()}
    raw = spark.read.parquet(f"{SF}/events.parquet").collect()
    expect: dict[str, list[int]] = {}
    for e in raw:
        expect.setdefault(e["event_type"], []).append(
            int(json.loads(e["props"])["k"]))
    assert set(rows) == set(expect)
    for et, ks in expect.items():
        r = rows[et]
        assert r["n_events"] == len(ks)
        assert r["sum_k"] == sum(ks)
        assert r["max_k"] == max(ks)
        assert r["avg_k"] == round(sum(ks) / len(ks), 4)


def test_events_burst_trailing_window(spark):
    """trailing_avg must equal the mean of the previous <=3 hourly
    counts per event_type, and the first bucket (empty frame) must be
    excluded."""
    from flyscrape_spark.queries import q_events_burst

    out = q_events_burst(spark, SF).collect()
    assert out, "fixture events must span multiple hours"
    # rebuild hourly counts driver-side
    raw = spark.read.parquet(f"{SF}/events.parquet").collect()
    counts: dict[str, dict[int, int]] = {}
    for e in raw:
        ts = e["ts"]
        bucket = int(ts.replace(minute=0, second=0, microsecond=0)
                     .timestamp())
        counts.setdefault(e["event_type"], {})
        counts[e["event_type"]][bucket] = (
            counts[e["event_type"]].get(bucket, 0) + 1)
    firsts = {et: min(b) for et, b in counts.items()}
    seen_keys = set()
    for r in out:
        et, b = r["event_type"], r["bucket_ts"]
        seen_keys.add((et, b))
        assert b != firsts[et], "first bucket has an empty frame"
        ordered = sorted(counts[et])
        i = ordered.index(b)
        prev = [counts[et][x] for x in ordered[max(0, i - 3):i]]
        assert r["trailing_avg"] == round(sum(prev) / len(prev), 4)
        assert r["n"] == counts[et][b]
        assert r["is_burst"] == int(r["n"] > 1.5 * r["trailing_avg"])
    # every non-first bucket appears
    expect_keys = {(et, b) for et, bs in counts.items()
                   for b in bs if b != firsts[et]}
    assert seen_keys == expect_keys


def test_source_dup_factor_reconciles(spark):
    """sum(n_docs) must equal the corpus size; a source's dup_factor
    must equal docs/distinct-fingerprints computed driver-side."""
    from flyscrape_spark.queries import q_fingerprint, q_source_dup_factor

    rows = {r["source"]: r for r in q_source_dup_factor(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    fps = {r["doc_id"]: r["fingerprint"]
           for r in q_fingerprint(spark, SF).collect()}
    expect: dict[str, list[int]] = {}
    for d in docs:
        expect.setdefault(d["source"], []).append(fps[d["doc_id"]])
    assert set(rows) == set(expect)
    for src, hashes in expect.items():
        r = rows[src]
        assert r["n_docs"] == len(hashes)
        assert r["n_distinct"] == len(set(hashes))
        assert r["dup_factor"] == round(len(hashes) / len(set(hashes)), 4)


def test_length_histogram_buckets(spark):
    """Bucket of every doc must be floor(log2(n_chars)) and counts
    must total the corpus."""
    import math

    from flyscrape_spark.queries import q_length_histogram

    out = q_length_histogram(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    expect: dict[tuple, int] = {}
    for d in docs:
        b = int(math.floor(math.log2(max(d["n_chars"], 1))))
        expect[(d["source"], b)] = expect.get((d["source"], b), 0) + 1
    got = {(r["source"], r["log2_bucket"]): r["n_docs"] for r in out}
    assert got == expect


def test_embedding_norms_stats(spark):
    """Per-label norm stats must reconcile with a numpy recompute
    (same double-precision sequential accumulation)."""
    import math

    from flyscrape_spark.queries import q_embedding_norms

    rows = {r["label"]: r for r in q_embedding_norms(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    norms: dict[int, list[float]] = {}
    for e in emb:
        acc = 0.0
        for v in e["embedding"]:
            acc += float(v) * float(v)
        norms.setdefault(e["label"], []).append(math.sqrt(acc))
    assert set(rows) == set(norms)
    for label, ns in norms.items():
        r = rows[label]
        assert r["n_vecs"] == len(ns)
        assert r["min_norm"] == round(min(ns), 4)
        assert r["max_norm"] == round(max(ns), 4)
        assert abs(r["avg_norm"] - round(sum(ns) / len(ns), 4)) <= 1e-4


def test_streaming_admission_equals_batch_truth(spark):
    """The streaming admission rollup must equal the batch distinct
    per-host counts of the same overlapping feed — exactly-once
    admission independent of micro-batch slicing."""
    from pyspark.sql import functions as F

    from flyscrape_spark.functions.urls import canonicalize, host_of
    from flyscrape_spark.queries import _doc_url, q_streaming_admission

    got = {r["host"]: r["n_urls"]
           for r in q_streaming_admission(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    i = F.col("doc_id")
    feed = (
        docs.filter(i % 3 == 0).select(_doc_url(i).alias("url"))
        .unionAll(docs.filter(i % 5 == 0)
                  .select(_doc_url((2 * i + 1) % n).alias("url")))
    )
    expect = {
        r["host"]: r["n"]
        for r in feed.select(canonicalize("url").alias("url")).distinct()
        .select(host_of("url").alias("host"))
        .groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect


def test_tokenizer_fertility_reconciles(spark):
    """Per-language sums must reconcile with per-doc token counts."""
    from flyscrape_spark.queries import q_token_counts, q_tokenizer_fertility

    rows = {r["lang"]: r for r in q_tokenizer_fertility(spark, SF).collect()}
    toks = {r["doc_id"]: r for r in q_token_counts(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    agg: dict[str, list] = {}
    for d in docs:
        t = toks[d["doc_id"]]
        agg.setdefault(d["lang"], []).append(
            (d["n_chars"], t["n_bpeish_tokens"], t["n_words"]))
    assert set(rows) == set(agg)
    for lang, triples in agg.items():
        r = rows[lang]
        chars = sum(c for c, _, _ in triples)
        ntok = sum(t for _, t, _ in triples)
        words = sum(w for _, _, w in triples)
        assert r["n_docs"] == len(triples)
        assert r["sum_chars"] == chars
        assert r["sum_tokens"] == ntok
        assert r["chars_per_token"] == round(chars / ntok, 4)
        assert r["tokens_per_word"] == round(ntok / words, 4)


def test_dup_cluster_sizes_histogram(spark):
    """Histogram must reconcile with the dedup_clusters labels and
    cover every document exactly once."""
    from flyscrape_spark.queries import q_dedup_clusters, q_dup_cluster_sizes

    hist = {r["cluster_size"]: r["n_clusters"]
            for r in q_dup_cluster_sizes(spark, SF).collect()}
    labels = q_dedup_clusters(spark, SF).collect()
    by_cluster: dict[int, int] = {}
    for r in labels:
        by_cluster[r["cluster_id"]] = by_cluster.get(r["cluster_id"], 0) + 1
    expect: dict[int, int] = {}
    for size in by_cluster.values():
        expect[size] = expect.get(size, 0) + 1
    assert hist == expect
    assert sum(s * n for s, n in hist.items()) == len(labels)


def test_streaming_window_counts_equal_batch(spark):
    """Tumbling-window streaming counts must equal the batch
    date_trunc('hour') groupBy regardless of micro-batch slicing."""
    from pyspark.sql import functions as F

    from flyscrape_spark.queries import q_streaming_window_counts

    got = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in q_streaming_window_counts(spark, SF).collect()}
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .alias("ws"), "event_type")
        .agg(F.count("*").alias("n")).collect()
    )
    expect = {(r["ws"], r["event_type"]): r["n"] for r in batch}
    assert got == expect
