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
  against the prior batches' admitted partitions, and written as ONE
  idempotent batch_id-partition overwrite (the admitted table doubles
  as the seen set — parquet dirs here, an Iceberg table on a
  cluster). Exactly the batch engine's admission step
  (plans/frontier.py steps 1-5) per micro-batch; streaming checkpoint
  x idempotent write = exactly-once admission across crash/replay.
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
    """foreachBatch admission with IDEMPOTENT per-batch commits.

    The admitted table IS the seen set: one parquet partition per
    micro-batch (``batch_id=N`` directory), written with overwrite.
    Each batch anti-joins against all PRIOR batches' partitions only
    and then overwrites its own partition — a single atomic-enough
    write per batch.

    Why not seen-append + admitted-append (the round-1 design): with
    two writes, a crash between them leaves the seen table containing
    the batch; the streaming checkpoint replays the batch, the
    anti-join now matches everything, and the admitted sink silently
    loses the whole batch (at-most-once). With one self-excluding
    write, a replay recomputes the same rows (the prior-batch view is
    unchanged) and overwrites the same partition: exactly-once for any
    crash point.

    At 10^10 scale: Iceberg table bucketed on url_key so the per-batch
    anti-join prunes files; periodic compaction folds old batch
    partitions (exactly the batch engine's seen-compaction step)."""

    def __init__(self, admitted_dir: str, do_canonicalize: bool = True):
        self.admitted_dir = admitted_dir
        self.do_canonicalize = do_canonicalize

    def _prior(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        try:
            df = spark.read.parquet(self.admitted_dir)
        except Exception:  # first batch: nothing admitted yet
            return None
        # self-exclusion makes the replay idempotent: a partially
        # committed own partition never feeds its own anti-join
        return df.filter(F.col("batch_id") != batch_id)

    def seen(self, spark: SparkSession) -> DataFrame:
        """The accumulated URL-seen set (all admitted batches)."""
        return spark.read.parquet(self.admitted_dir).select("url", "url_key")

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
        seen = self._prior(spark, batch_id)
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
        cand.write.mode("overwrite").parquet(
            f"{self.admitted_dir}/batch_id={batch_id}"
        )

    def start(self, urls: DataFrame, checkpoint_dir: str, available_now: bool = True):
        """Wire the stream: exactly-once admission = streaming
        checkpoint (batch replay on crash) x idempotent per-batch
        partition overwrite (replay rewrites, never drops)."""
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
    pick by retention semantics.

    ``dropDuplicatesWithinWatermark`` (NOT plain ``dropDuplicates``)
    is load-bearing: the event-time-less ``dropDuplicates`` keeps
    every key forever (state grows without bound) and never re-admits
    a URL after the window — the round-1 bug. WithinWatermark evicts a
    key's state once the watermark passes its event time + delay, so
    a URL re-arriving beyond the window is admitted again (pinned by
    tests/test_streaming.py::test_stateful_dedup_readmits_after_watermark)."""
    url = canonicalize("url") if do_canonicalize else F.trim("url")
    return (
        urls.withColumn("url", url)
        .filter(F.col("url") != "")
        .withColumn("url_key", F.xxhash64("url"))
        .withColumn("host", host_of("url"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["url_key", "url"])
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


def windowed_host_health(
    fetches: DataFrame, window: str = "1 minute", slide: str | None = None,
    watermark: str = "2 minutes", cooldown_ratio: float = 0.5,
    min_fetches: int = 10,
) -> DataFrame:
    """Streaming edge of the host circuit breaker
    (operators/politeness.host_health / CrawlConfig.host_cooldown_*):
    watermarked per-host error ratios over sliding windows from a
    live fetch-result stream (host, status, ts). A window whose ratio
    trips the threshold emits cooldown=true — feed it back to the
    scheduler to pause the host for the next windows.

    Windowed (not global) on purpose: a breaker must RESET when the
    host recovers; the batch engine's cumulative ratio is the
    per-crawl ledger, this stream is the live control signal. Same
    map-side-combinable groupBy shape as windowed_host_counts."""
    from flyscrape_spark.operators.politeness import error_status_expr

    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    n = F.count("*")
    e = F.sum(F.when(error_status_expr(), 1).otherwise(0))
    return (
        fetches.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "host")
        .agg(n.alias("n_fetches"), e.alias("n_errors"))
        .select(
            "win.start", "win.end", "host", "n_fetches", "n_errors",
            F.round(F.col("n_errors").cast("double") / F.col("n_fetches"), 6)
            .alias("error_ratio"),
            ((F.col("n_fetches") >= min_fetches)
             & (F.col("n_errors").cast("double") / F.col("n_fetches")
                >= cooldown_ratio)).alias("cooldown"),
        )
    )
