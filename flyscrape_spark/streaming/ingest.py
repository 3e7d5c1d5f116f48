"""Continuous-crawl mode: Structured Streaming front door for the
frontier.

The reference's frontier is an unbounded self-feeding queue
(/root/reference/scrape.go:82-131) — a stream. The batch engine
(plans/frontier.py) handles the self-feeding BFS loop; this module
covers the other streaming shape: *externally arriving* seed/URL
feeds (a discovery service, a sitemap differ, a recrawl scheduler)
admitted continuously into the crawl.

Design (SURVEY §1.4 chose iterative batch for the BFS itself — the
stream here is only the ADMISSION edge, which has no generation
barrier):

- ``stream_urls`` — ``readStream`` over a directory of URL files
  (json/parquet); on a cluster this would be Kafka/Kinesis — same
  DataFrame downstream.
- ``FrontierIngest`` — ``foreachBatch`` handler: each micro-batch is
  trimmed, canonicalized, hashed, deduped in-batch, anti-joined
  against the durable seen table, and the survivors are appended to
  both the seen table and the admitted-frontier sink (parquet dirs
  here, Iceberg appends on a cluster). Exactly the batch engine's
  admission step (plans/frontier.py steps 1-5) reused per micro-batch;
  checkpointLocation gives exactly-once admission across restarts.
- ``windowed_host_counts`` — watermarked sliding-window per-host
  admission rates: the live skew/politeness signal the scheduler's
  ``host_fanout`` consumes (operators/politeness.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flyscrape_spark.functions.urls import canonicalize, host_of

URL_STREAM_SCHEMA = "url string, ts timestamp"


def stream_urls(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of (url, ts) rows in NDJSON. Swap for Kafka
    with ``spark.readStream.format("kafka")`` on a cluster; everything
    downstream is source-agnostic."""
    return (
        spark.readStream.schema(URL_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(source_dir)
    )


class FrontierIngest:
    """foreachBatch admission: micro-batch -> dedup -> seen += new,
    admitted sink += new. The seen table is parquet-append only; the
    anti-join scans it per batch (at 10^10 scale: Iceberg with
    url_key bucketing so the anti-join prunes files)."""

    def __init__(self, seen_dir: str, admitted_dir: str, do_canonicalize: bool = True):
        self.seen_dir = seen_dir
        self.admitted_dir = admitted_dir
        self.do_canonicalize = do_canonicalize

    def _seen(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.seen_dir)
        except Exception:  # first batch: no seen table yet
            return None

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        url = canonicalize("url") if self.do_canonicalize else F.trim("url")
        cand = (
            batch.withColumn("url", url)
            .filter(F.col("url") != "")
            .withColumn("url_key", F.xxhash64("url"))
            .withColumn("host", host_of("url"))
            .dropDuplicates(["url_key", "url"])
        )
        seen = self._seen(spark)
        if seen is not None:
            seen_keys = seen.select(
                F.col("url_key").alias("seen_key"), F.col("url").alias("seen_url")
            )
            cand = cand.join(
                seen_keys,
                (cand["url_key"] == seen_keys["seen_key"])
                & (cand["url"] == seen_keys["seen_url"]),
                "left_anti",
            )
        # pin the admission set BEFORE appending to the seen table:
        # the second write must not re-evaluate the anti-join against
        # the just-appended files (that would admit nothing).
        # localCheckpoint truncates lineage, so both writes scan the
        # materialized result.
        cand = cand.localCheckpoint(eager=True)
        cand.select("url", "url_key").write.mode("append").parquet(self.seen_dir)
        cand.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            self.admitted_dir
        )

    def start(self, urls: DataFrame, checkpoint_dir: str, available_now: bool = True):
        """Wire the stream: exactly-once per-batch admission via the
        streaming checkpoint (a replayed batch re-runs the anti-join,
        so replays are idempotent w.r.t. the seen table)."""
        writer = (
            urls.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def stateful_dedup_stream(urls: DataFrame, watermark: str = "10 minutes",
                          do_canonicalize: bool = True) -> DataFrame:
    """Streaming-native URL dedup: Structured Streaming's keyed state
    store via ``dropDuplicates`` on the canonical hash — exactly-once
    admission WITHOUT a side parquet seen table.

    Contrast with :class:`FrontierIngest` (anti-join against a durable
    table): the state-store variant keeps the seen keys in the
    streaming state backend (RocksDB on a cluster), bounded by the
    watermark — the right shape for a RECRAWL window ("don't refetch a
    URL seen in the last N hours") rather than a forever-seen set,
    which would grow state without bound. Both edges are first-class;
    pick by retention semantics."""
    url = canonicalize("url") if do_canonicalize else F.trim("url")
    return (
        urls.withColumn("url", url)
        .filter(F.col("url") != "")
        .withColumn("url_key", F.xxhash64("url"))
        .withColumn("host", host_of("url"))
        .withWatermark("ts", watermark)
        .dropDuplicates(["url_key", "url"])
    )


def windowed_host_counts(
    urls: DataFrame, window: str = "1 minute", slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked per-host admission counts over sliding windows —
    the live host-skew signal. Late rows beyond the watermark are
    dropped (the batch engine's lineage metrics are the authoritative
    ledger; this feed is for scheduling)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        urls.withColumn("host", host_of("url"))
        .withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "host")
        .agg(F.count("*").alias("n_urls"))
        .select("win.start", "win.end", "host", "n_urls")
    )
