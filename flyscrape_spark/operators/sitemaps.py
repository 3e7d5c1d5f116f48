"""Sitemap seed planning — parsed sitemap entries to a prioritized,
per-host-capped frontier seed list.

Parsing lives in ``sources/sitemaps.py`` (JVM ``from_xml``, one row
per ``<url>`` entry, incl. the optional ``changefreq``/``priority``
hints); robots.txt ``Sitemap:`` discovery lives in
``operators/robots.py`` (``sitemap_directives``). This module adds
the crawl-side planning step the reference lacks entirely (it seeds
only from configured URLs, /root/reference/scrape.go:96-120): rank
each host's advertised URLs by the site's own importance/freshness
hints and cap the per-host wishlist at the politeness budget, so a
10^10-URL crawl admits sitemap seeds in priority order instead of
sitemap-file order.

Scale shape: one combinable groupBy(host, loc) to dedup repeats
across a host's sitemaps, then one window per host — bounded by
construction (sitemaps cap at 50k URLs per file per the protocol,
and the cap keeps any output partition small). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flyscrape_spark.functions.urls import canonicalize
from flyscrape_spark.sources.sitemaps import parse_sitemaps


def sitemap_seeds(
    sitemaps: DataFrame,
    per_host_cap: int = 1000,
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """Prioritized frontier seeds from sitemap documents: entries
    ranked per host by (priority desc, lastmod desc, loc) and capped
    at ``per_host_cap`` — the politeness-aware budget a crawl grants
    each host's own wishlist. ``loc`` is RFC-3986-canonicalized
    (ready for the URL-seen anti-join); repeated <loc>s across a
    host's sitemaps dedup (max priority / newest lastmod win); the
    host is taken from the canonicalized loc itself so cross-host
    entries (invalid per the protocol) budget against the host they
    actually hit."""
    parsed = parse_sitemaps(sitemaps, xml_col=xml_col, host_col=url_col)
    loc = canonicalize(F.col("url"))
    per_url = (
        parsed.select(
            F.regexp_extract(loc, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1).alias(
                "host"
            ),
            loc.alias("loc"),
            "lastmod",
            "priority",
        )
        .groupBy("host", "loc")
        .agg(
            F.max("priority").alias("priority"),
            F.max("lastmod").alias("lastmod"),
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.desc_nulls_last("lastmod"), F.asc("loc")
    )
    return (
        per_url.withColumn("seed_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("seed_rank") <= per_host_cap)
        .select("host", "loc", "priority", "lastmod", "seed_rank")
    )
