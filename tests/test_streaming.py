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
    admitted_dir = str(tmp_path / "admitted")
    ck = str(tmp_path / "ck")

    _write_feed(feed, ["http://A.test:80/x#f", "http://b.test/y", " ", "http://b.test/y"])
    ingest = FrontierIngest(admitted_dir)
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
    assert ingest.seen(spark).count() == 3


def test_streaming_ingest_replay_is_exactly_once(spark, tmp_path):
    """Crash-replay safety (ADVICE r1): replaying a batch — after its
    write completed but before the streaming checkpoint committed —
    must neither drop nor duplicate the batch. The round-1 dual-write
    design dropped it (the replayed anti-join matched the appended
    seen rows); the batch_id-partition overwrite is idempotent."""
    admitted_dir = str(tmp_path / "admitted")
    ingest = FrontierIngest(admitted_dir)

    b0 = spark.createDataFrame(
        [("http://a.test/x",), ("http://b.test/y",)], "url string"
    )
    b1 = spark.createDataFrame(
        [("http://a.test/x",), ("http://c.test/z",)], "url string"
    )
    ingest(b0, 0)
    ingest(b0, 0)  # replay of batch 0 (crash before checkpoint commit)
    ingest(b1, 1)
    ingest(b1, 1)  # replay of batch 1

    rows = spark.read.parquet(admitted_dir).collect()
    assert sorted(r["url"] for r in rows) == [
        "http://a.test/x", "http://b.test/y", "http://c.test/z"
    ]  # each admitted exactly once, none lost
    by_batch = {(r["url"], r["batch_id"]) for r in rows}
    assert ("http://c.test/z", 1) in by_batch


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


def test_stateful_dedup_readmits_after_watermark(spark, tmp_path):
    """The recrawl-window semantics (ADVICE r1 high): a URL seen again
    BEYOND the watermark window is re-admitted, and its old state is
    evicted (bounded state). Three micro-batches: A; filler B that
    advances the watermark past A's expiry; A again -> re-admitted."""
    import time

    from flyscrape_spark.streaming.ingest import stateful_dedup_stream

    feed = tmp_path / "feed"
    feed.mkdir(parents=True, exist_ok=True)
    # one file per micro-batch; the watermark a batch RUNS with is the
    # one computed from the PREVIOUS batch's data, so two filler
    # batches are needed between A's expiry and its re-arrival: the
    # first advances the watermark, the second runs eviction with it
    _write_feed(feed, ["http://a.test/x"], ts="2024-01-01T00:00:10")
    time.sleep(0.2)
    _write_feed(feed, ["http://filler.test/1"], ts="2024-01-01T01:00:00")
    time.sleep(0.2)
    _write_feed(feed, ["http://filler.test/2"], ts="2024-01-01T01:10:00")
    time.sleep(0.2)
    _write_feed(feed, ["http://a.test/x"], ts="2024-01-01T01:30:00")

    src = (
        spark.readStream.schema("url string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    out = stateful_dedup_stream(src, watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("readmit_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["url"], r["ts"].isoformat())
        for r in spark.sql("select * from readmit_stream").collect()
    )
    assert rows == [
        ("http://a.test/x", "2024-01-01T00:00:10"),
        ("http://a.test/x", "2024-01-01T01:30:00"),  # re-admitted
        ("http://filler.test/1", "2024-01-01T01:00:00"),
        ("http://filler.test/2", "2024-01-01T01:10:00"),
    ]


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


def _write_fetch_feed(path, rows, ts="2024-01-01T00:00:30"):
    path.mkdir(parents=True, exist_ok=True)
    fname = path / f"feed-{time.time_ns()}.json"
    with open(fname, "w") as f:
        for host, status in rows:
            f.write(json.dumps({"host": host, "status": status, "ts": ts}) + "\n")


def test_windowed_host_health_breaker(spark, tmp_path):
    """Streaming circuit breaker: a window where a host serves mostly
    5xx trips cooldown; the next window (recovered) resets it."""
    from flyscrape_spark.streaming.ingest import windowed_host_health

    feed = tmp_path / "fetchfeed"
    # window 0: bad.test 3/4 errors (trips at min_fetches=4);
    #           ok.test clean
    _write_fetch_feed(
        feed,
        [("bad.test", 503)] * 3 + [("bad.test", 200)]
        + [("ok.test", 200)] * 4,
        ts="2024-01-01T00:00:30",
    )
    # window 1: bad.test recovered
    _write_fetch_feed(feed, [("bad.test", 200)] * 4,
                      ts="2024-01-01T00:01:30")

    src = (
        spark.readStream.schema("host string, status int, ts timestamp")
        .json(str(feed))
    )
    health = windowed_host_health(src, window="1 minute", min_fetches=4)
    q = (
        health.writeStream.format("memory")
        .queryName("host_health_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["start"].isoformat(), r["host"]): r
        for r in spark.sql("select * from host_health_stream").collect()
    }
    w0bad = rows[("2024-01-01T00:00:00", "bad.test")]
    assert w0bad["n_errors"] == 3 and w0bad["cooldown"] is True
    assert rows[("2024-01-01T00:00:00", "ok.test")]["cooldown"] is False
    # recovery: the breaker resets with the window
    w1bad = rows[("2024-01-01T00:01:00", "bad.test")]
    assert w1bad["n_errors"] == 0 and w1bad["cooldown"] is False
