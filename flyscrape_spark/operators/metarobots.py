"""Robots meta directives: per-page noindex / nofollow extracted
from ``<meta name="robots" content="...">`` — the page-level crawl
policy that robots.txt (host-level, operators/robots.py) cannot
express.

The reference follows links unconditionally after its filters
(/root/reference/scrape.go:210-268); engine-added: at crawl scale
honoring noindex keeps soft-404s/tag pages out of the corpus and
honoring nofollow prunes the frontier at the source, both standard
crawler behavior (Google's robots meta spec; REP's page-level
companion).

Scale shape: one JVM tag scan per page with attribute-order-FREE
extraction (functions/tags.py — any of the 2 attribute orders, plus
extra attributes between them), token membership on the split
directive list — pure column expressions, no Python, fuses into the
page scan. ``none`` expands to noindex+nofollow per the spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flyscrape_spark.functions.tags import tag_attr, tags_where


def robots_content(html_col: str | Column = "html") -> Column:
    """Comma-joined union of EVERY matching robots-meta tag's content
    ('' when absent). The robots-meta spec combines directives across
    multiple tags (most restrictive wins), so a page with
    ``<meta name=robots content=noindex>`` followed by
    ``<meta name=robots content=nofollow>`` must yield both tokens —
    extracting only the first tag would drop the later directives."""
    tags = tags_where(html_col, "meta", "name", "robots")
    return F.array_join(
        F.transform(tags, lambda t: tag_attr(t, "content")), ","
    )


def _directives(html_col: str | Column) -> Column:
    """array<string> of normalized directive tokens."""
    return F.transform(
        F.split(F.lower(robots_content(html_col)), ","),
        lambda t: F.trim(t),
    )


def meta_robots_cols(html_col: str | Column = "html") -> tuple[Column, Column]:
    """(noindex, nofollow) boolean column pair; ``none`` implies both."""
    d = _directives(html_col)
    none = F.array_contains(d, "none")
    noindex = F.array_contains(d, "noindex") | none
    nofollow = F.array_contains(d, "nofollow") | none
    return noindex.alias("noindex"), nofollow.alias("nofollow")


def meta_robots(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """(url, noindex, nofollow) for every fetched page."""
    noindex, nofollow = meta_robots_cols(html_col)
    return pages.select(F.col(url_col).alias("url"), noindex, nofollow)
