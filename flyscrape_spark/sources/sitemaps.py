"""Sitemap ingestion: parse sitemaps.org XML (<urlset><url><loc>…)
into frontier seed rows, JVM-side.

The reference seeds only from config URLs
(/root/reference/modules/starturl/starturl.go:27-35); a large-scale
crawl's cheapest discovery channel is each host's sitemap, which
robots.txt advertises (the ``Sitemap:`` directive of the same
robots.txt the engine already fetches for RFC 9309 compliance). This
source turns a DataFrame of fetched sitemap bodies into
(url, lastmod, position) seed rows ready for the frontier's
canonicalize → dedup → admission path, with lastmod feeding the
recrawl scheduler (operators/recrawl.py).

Scale shape: ``from_xml`` + ``posexplode`` are pure JVM codegen —
no Python, no shuffle; the explode fans one sitemap row out to its
≤50k URLs (the sitemaps.org cap) partition-locally. Sitemap *index*
files (<sitemapindex><sitemap><loc>) are one more application of the
same parse: index → child sitemap URLs → fetch via the engine's
Transport → parse_sitemaps again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

URLSET_SCHEMA = (
    "url ARRAY<STRUCT<loc: STRING, lastmod: STRING,"
    " changefreq: STRING, priority: STRING>>"
)
INDEX_SCHEMA = "sitemap ARRAY<STRUCT<loc: STRING, lastmod: STRING>>"

#: sitemaps.org default when <priority> is absent
DEFAULT_PRIORITY = 0.5


def parse_sitemaps(
    sitemaps: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, url, lastmod, position, changefreq, priority) for every
    <url> entry of every sitemap body, in document order. Entries
    with no <loc> are dropped (spec: loc is required); lastmod and
    changefreq are optional and NULL when absent; priority defaults
    to 0.5 per the protocol."""
    parsed = sitemaps.select(
        F.col(host_col).alias("host"),
        F.from_xml(F.col(xml_col), URLSET_SCHEMA).alias("s"),
    )
    return (
        parsed.select("host", F.posexplode_outer("s.url").alias("position", "u"))
        .filter(F.col("u.loc").isNotNull())
        .select(
            "host",
            F.trim(F.col("u.loc")).alias("url"),
            F.col("u.lastmod").alias("lastmod"),
            "position",
            F.col("u.changefreq").alias("changefreq"),
            F.round(
                F.coalesce(
                    F.col("u.priority").cast("double"),
                    F.lit(DEFAULT_PRIORITY),
                ),
                6,
            ).alias("priority"),
        )
    )


def parse_sitemap_index(
    indexes: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, sitemap_url, lastmod) for every child sitemap of every
    <sitemapindex> body — feed these through the crawl Transport and
    back into :func:`parse_sitemaps`."""
    parsed = indexes.select(
        F.col(host_col).alias("host"),
        F.from_xml(F.col(xml_col), INDEX_SCHEMA).alias("s"),
    )
    return (
        parsed.select("host", F.explode_outer("s.sitemap").alias("u"))
        .filter(F.col("u.loc").isNotNull())
        .select(
            "host",
            F.col("u.loc").alias("sitemap_url"),
            F.col("u.lastmod").alias("lastmod"),
        )
    )
