"""Broken-link audit: resolve every extracted link against the fetch
log and report targets that are dead (HTTP >= 400) or were never
fetched — the crawl-health report that closes the loop between the
link extractor and the frontier.

The reference surfaces per-fetch errors only as per-row log lines
(`/root/reference/scrape.go:198-205`); engine-added: a corpus-level
dead-target table is what actually drives recrawl/blocklist decisions
(a target referenced from 10k pages that 404s is a redirect-map bug
or a takedown; a never-fetched target with high in-links is frontier
starvation).

Scale shape: links aggregate FIRST (map-side-combinable count per
target — the shuffle carries one row per distinct target, not one
per link occurrence), then one join target->status on the fetch log.
Both sides are hash-partitioned on the same url key; no broadcast
assumption because at crawl scale both sides are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def broken_links(
    links: DataFrame,
    pages: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    url_col: str = "url",
    status_col: str = "status",
) -> DataFrame:
    """(dst, n_refs, example_src, status, reason) for every link
    target that is not a healthy fetched page.

    reason = 'http_error' (fetched, status >= 400) or 'unfetched'
    (never appears in the fetch log). Healthy targets (status < 400)
    are dropped — the report is the exception list, not the corpus.
    """
    refs = links.groupBy(F.col(dst_col).alias("dst")).agg(
        F.count("*").alias("n_refs"),
        F.min(src_col).alias("example_src"),
    )
    fetched = pages.select(
        F.col(url_col).alias("dst"), F.col(status_col).alias("status")
    )
    joined = refs.join(fetched, "dst", "left")
    return (
        joined.filter(F.col("status").isNull() | (F.col("status") >= 400))
        .select(
            "dst",
            "n_refs",
            "example_src",
            "status",
            F.when(F.col("status").isNull(), F.lit("unfetched"))
            .otherwise(F.lit("http_error"))
            .alias("reason"),
        )
    )


def broken_link_hosts(
    links: DataFrame,
    pages: DataFrame,
    src_host_col: str = "src_host",
    dst_col: str = "dst",
    url_col: str = "url",
    status_col: str = "status",
) -> DataFrame:
    """(src_host, n_links, n_broken, broken_ratio): per-source-host
    link rot — the signal for demoting hosts whose outlinks are stale.

    One join (link occurrences -> target status) then one combinable
    per-host aggregate; the join key is the target url, so hot
    TARGETS skew the join, not hot hosts — and a hot target is a
    single row on the build side after the fetch-log distinct."""
    fetched = pages.select(
        F.col(url_col).alias("dst"), F.col(status_col).alias("status")
    )
    j = links.select(F.col(src_host_col).alias("src_host"),
                     F.col(dst_col).alias("dst")).join(fetched, "dst", "left")
    broken = F.col("status").isNull() | (F.col("status") >= 400)
    return (
        j.groupBy("src_host")
        .agg(
            F.count("*").alias("n_links"),
            F.sum(broken.cast("long")).alias("n_broken"),
        )
        .withColumn(
            "broken_ratio",
            F.round(F.col("n_broken").cast("double") / F.col("n_links"), 6),
        )
    )
