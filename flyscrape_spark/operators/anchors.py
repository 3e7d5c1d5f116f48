"""Anchor-text aggregation: collect what OTHER pages' links say
about each target URL — the classic web-corpus signal (anchor text
describes the target better than the target describes itself;
Brin & Page 1998 §2.2). A training pipeline uses the table for
retrieval labels, alt-text-style supervision, and as yet another
frontier-priority input (n_inlinks is raw in-degree).

The reference extracts links only to follow them
(/root/reference/modules/followlinks/followlinks.go:75-95, the
anchor TEXT is discarded); this engine keeps the full link span
(kind='link', text=anchor, media_ref=raw href) in every parsed page
(parse/udfs.py), so the aggregation is a pure DataFrame pass over
crawl output.

Scale shape: explode (narrow), then every aggregate keeps BOUNDED
buffers — a mega-hub URL with 10^7 in-links must not blow a reduce
task, so no unbounded collect_set anywhere:
- n_inlinks: plain count, map-side combined;
- n_src_hosts: distinct (target, host) pairs then a count — two
  hash aggregates, both partial-combined, O(1) state per group;
- anchors: distinct (target, anchor) → per-target row_number ≤
  ``max_anchors`` (rank-limit pushdown truncates map partitions
  BEFORE the shuffle, WindowGroupLimit) → collect_list bounded at
  the cap. Taking the k alphabetically-first anchors keeps the
  output deterministic regardless of partitioning.
The three aggregates re-join on target_url (equi-joins; the window
and final agg share the target partitioning, so Catalyst reuses the
exchange).

Href absolutization is JVM-only (stays in whole-stage codegen):
already-absolute URLs pass through, root-relative paths join
scheme://host. Other relative forms are dropped here — the engine's
link-follow UDF does full RFC 3986 resolution where it matters
(following); this operator is an aggregate over the dominant forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.urls import host_of, scheme_of

_ABS = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def anchor_target(page_url, href) -> F.Column:
    """Absolute target URL for a link href, JVM expressions only."""
    u = F.col(page_url) if isinstance(page_url, str) else page_url
    h = F.col(href) if isinstance(href, str) else href
    return (
        F.when(h.rlike(_ABS), h)
        .when(
            h.startswith("/"),
            F.concat(scheme_of(u), F.lit("://"), host_of(u), h),
        )
    )


def anchor_stats(
    parsed: DataFrame,
    url_col: str = "url",
    spans_col: str = "spans",
    max_anchors: int = 16,
) -> DataFrame:
    """(target_url, n_inlinks, n_src_hosts, anchors) over parsed
    pages carrying interleaved spans. ``anchors`` is the sorted
    distinct anchor-text set, comma-joined, capped at
    ``max_anchors`` entries."""
    from pyspark.sql.window import Window

    links = (
        parsed.select(
            F.col(url_col).alias("_src"),
            host_of(url_col).alias("_src_host"),
            F.explode(spans_col).alias("s"),
        )
        .filter(F.col("s.kind") == "link")
        .select(
            "_src_host",
            anchor_target("_src", F.col("s.media_ref")).alias("target_url"),
            F.col("s.text").alias("_anchor"),
        )
        .filter(F.col("target_url").isNotNull())
    )
    n_in = links.groupBy("target_url").agg(F.count("*").alias("n_inlinks"))
    hosts = (
        links.select("target_url", "_src_host")
        .distinct()
        .groupBy("target_url")
        .agg(F.count("*").alias("n_src_hosts"))
    )
    w = Window.partitionBy("target_url").orderBy("_anchor")
    anchors = (
        links.select("target_url", "_anchor")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_anchors)
        .groupBy("target_url")
        .agg(
            F.array_join(F.array_sort(F.collect_list("_anchor")), ",").alias(
                "anchors"
            )
        )
    )
    return n_in.join(hosts, "target_url").join(anchors, "target_url")
