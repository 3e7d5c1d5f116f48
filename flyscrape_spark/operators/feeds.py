"""Feed-driven crawl planning: discover RSS/Atom feeds from fetched
pages, rank feed entries into frontier seeds, and derive each feed's
publishing cadence for the recrawl scheduler.

Parsing lives in ``sources/feeds.py`` (JVM ``from_xml``, one row per
``<item>``/``<entry>``, RSS and Atom normalized to one schema). The
reference has no discovery channel beyond config URLs
(/root/reference/modules/starturl/starturl.go:27-35); engine-added:
at crawl scale feeds are the freshness channel — they advertise the
newest URLs *with publish timestamps*, so the frontier can admit new
content minutes after it appears instead of waiting for the next
full-host sweep, and the inter-entry gap tells the scheduler how
often re-fetching the feed is worth a request from the host's
politeness budget (operators/recrawl.py consumes the interval).

Scale shapes:

- ``feed_discovery``: two JVM regexes per page (attribute order
  varies), explode — fuses into the page scan, no shuffle.
- ``feed_seeds``: one combinable groupBy(host, link) to dedup a URL
  advertised by several of a host's feeds, then one per-host rank
  window capped at the politeness budget (same contract as
  operators/sitemaps.py sitemap_seeds).
- ``feed_cadence``: one per-feed lag window + one groupBy on the SAME
  key — the agg reuses the window's hash partitioning, so the corpus
  shuffles once.

No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from flyscrape_spark.functions.urls import canonicalize

#: <link rel="alternate" type="application/rss+xml" href="..."> —
#: attribute order varies in the wild; both orders of (type, href)
#: are matched, rel=alternate is required by the autodiscovery
#: convention but its position is free, so it is asserted via the
#: type attribute alone (pages don't put application/*+xml on
#: non-feed links).
_TYPE_HREF = (
    r'<link[^>]*type=["\']application/(rss|atom)\+xml["\']'
    r'[^>]*href=["\']([^"\']+)["\']'
)
_HREF_TYPE = (
    r'<link[^>]*href=["\']([^"\']+)["\']'
    r'[^>]*type=["\']application/(rss|atom)\+xml["\']'
)


def feed_discovery(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, feed_url, feed_type) for every feed-autodiscovery
    ``<link>`` tag of every page, both attribute orders, duplicates
    across the page's tags removed. feed_type is 'rss' or 'atom'.
    The dedup happens array-side (array_distinct over parsed
    (feed_url, feed_type) structs) BEFORE the explode, so the whole
    operator is shuffle-free and fuses into the page scan — a feed
    advertised twice with different markup still yields one row."""
    h = F.col(html_col)
    a = F.regexp_extract_all(h, F.lit(_TYPE_HREF), 0)
    b = F.regexp_extract_all(h, F.lit(_HREF_TYPE), 0)
    parsed = F.transform(
        F.array_distinct(F.concat(a, b)),
        lambda t: F.struct(
            F.coalesce(
                F.nullif(F.regexp_extract(t, _TYPE_HREF, 2), F.lit("")),
                F.regexp_extract(t, _HREF_TYPE, 1),
            ).alias("feed_url"),
            F.coalesce(
                F.nullif(F.regexp_extract(t, _TYPE_HREF, 1), F.lit("")),
                F.regexp_extract(t, _HREF_TYPE, 2),
            ).alias("feed_type"),
        ),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.array_distinct(parsed)).alias("f"),
    ).select("url", "f.feed_url", "f.feed_type")


def feed_seeds(entries: DataFrame, per_host_cap: int = 1000) -> DataFrame:
    """Prioritized frontier seeds from parsed feed entries (the
    common (feed_url, link, pub_ts, ...) schema of
    sources/feeds.py): entries ranked per host by recency
    (pub_ts desc nulls last, link asc for determinism) and capped at
    ``per_host_cap`` — the politeness-aware budget a host's feeds may
    claim, mirroring sitemap_seeds. ``link`` is
    RFC-3986-canonicalized (ready for the URL-seen anti-join); a URL
    advertised by several of the host's feeds dedups (newest pub_ts
    wins); the host comes from the canonicalized link itself so a
    feed advertising foreign URLs budgets against the host actually
    hit."""
    link = canonicalize(F.col("link"))
    per_url = (
        entries.select(
            F.regexp_extract(link, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1).alias(
                "host"
            ),
            link.alias("link"),
            "pub_ts",
        )
        .groupBy("host", "link")
        .agg(F.max("pub_ts").alias("pub_ts"))
    )
    w = Window.partitionBy("host").orderBy(
        F.desc_nulls_last("pub_ts"), F.asc("link")
    )
    return (
        per_url.withColumn("seed_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("seed_rank") <= per_host_cap)
        .select("host", "link", "pub_ts", "seed_rank")
    )


def feed_cadence(
    entries: DataFrame,
    min_interval_s: int = 900,
    max_interval_s: int = 86400,
) -> DataFrame:
    """Per-feed publishing cadence: entry count, first/last publish
    timestamps, the median inter-entry gap (seconds, interpolated
    median over successive dated entries in publish order), and the
    recrawl interval the scheduler should grant — half the median gap
    (Nyquist: sample twice per expected event), clamped to
    [min_interval_s, max_interval_s]; feeds with fewer than two dated
    entries get the max (nothing is known about their rhythm).
    Undated entries count toward n_entries but not the gaps."""
    w = Window.partitionBy("feed_url").orderBy("pub_ts")
    ts = F.unix_timestamp("pub_ts")
    gap = F.when(
        F.col("pub_ts").isNotNull(),
        ts - F.unix_timestamp(F.lag("pub_ts").over(w)),
    )
    stats = (
        entries.withColumn("gap_s", gap)
        .groupBy("feed_url")
        .agg(
            F.count("*").alias("n_entries"),
            F.min("pub_ts").alias("first_ts"),
            F.max("pub_ts").alias("last_ts"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 3).alias(
                "median_gap_s"
            ),
        )
    )
    half = F.round(F.col("median_gap_s") / 2).cast("bigint")
    interval = F.when(
        F.col("median_gap_s").isNull(), F.lit(max_interval_s).cast("bigint")
    ).otherwise(
        F.greatest(
            F.lit(min_interval_s).cast("bigint"),
            F.least(F.lit(max_interval_s).cast("bigint"), half),
        )
    )
    return stats.select(
        "feed_url",
        "n_entries",
        "first_ts",
        "last_ts",
        "median_gap_s",
        interval.alias("fetch_interval_s"),
    )
