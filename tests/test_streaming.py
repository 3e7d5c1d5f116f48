"""Structured Streaming admission edge: exactly-once frontier ingest
with cross-batch dedup, and watermarked windowed host stats."""

import json
import time

from flyscrape_spark.streaming.ingest import (
    FrontierIngest,
    stream_urls,
    windowed_host_counts,
)


def _write_feed(path, names, ts="2024-01-01T00:00:10"):
    path.mkdir(parents=True, exist_ok=True)
    fname = path / f"feed-{time.time_ns()}.json"
    with open(fname, "w") as f:
        for n in names:
            f.write(json.dumps({"url": n, "ts": ts}) + "\n")


def test_streaming_ingest_dedups_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    seen_dir = str(tmp_path / "seen")
    admitted_dir = str(tmp_path / "admitted")
    ck = str(tmp_path / "ck")

    _write_feed(feed, ["http://A.test:80/x#f", "http://b.test/y", " ", "http://b.test/y"])
    ingest = FrontierIngest(seen_dir, admitted_dir)
    q = ingest.start(stream_urls(spark, str(feed)), ck)
    q.awaitTermination(120)

    admitted = {r["url"] for r in spark.read.parquet(admitted_dir).collect()}
    # canonicalized: lowercased host, default port dropped, fragment dropped
    assert admitted == {"http://a.test/x", "http://b.test/y"}

    # second wave: one duplicate (canonicalizes to already-seen), one new
    _write_feed(feed, ["http://a.test/x", "http://c.test/z"])
    q = ingest.start(stream_urls(spark, str(feed)), ck)
    q.awaitTermination(120)

    rows = spark.read.parquet(admitted_dir).collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == ["http://a.test/x", "http://b.test/y", "http://c.test/z"]
    seen = spark.read.parquet(seen_dir).count()
    assert seen == 3


def test_stateful_dedup_stream(spark, tmp_path):
    from flyscrape_spark.streaming.ingest import stateful_dedup_stream

    feed = tmp_path / "feed"
    _write_feed(feed, ["http://A.test:80/x", "http://a.test/x#frag",
                       "http://b.test/y", "http://b.test/y"])
    out = stateful_dedup_stream(stream_urls(spark, str(feed)))
    q = (
        out.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    urls = sorted(
        r["url"] for r in spark.sql("select * from dedup_stream").collect()
    )
    # all four inputs canonicalize to two distinct URLs; the state
    # store admits each exactly once
    assert urls == ["http://a.test/x", "http://b.test/y"]


def test_windowed_host_counts(spark, tmp_path):
    feed = tmp_path / "feed"
    _write_feed(feed, ["http://a.test/1", "http://a.test/2", "http://b.test/1"],
                ts="2024-01-01T00:00:30")
    _write_feed(feed, ["http://a.test/3"], ts="2024-01-01T00:01:30")

    counts = windowed_host_counts(stream_urls(spark, str(feed)), window="1 minute")
    q = (
        counts.writeStream.format("memory")
        .queryName("host_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["start"].isoformat(), r["host"]): r["n_urls"]
        for r in spark.sql("select * from host_counts").collect()
    }
    assert rows[("2024-01-01T00:00:00", "a.test")] == 2
    assert rows[("2024-01-01T00:00:00", "b.test")] == 1
    assert rows[("2024-01-01T00:01:00", "a.test")] == 1
