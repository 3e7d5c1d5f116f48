"""rel=canonical consolidation: extract each page's declared canonical
URL and collapse parameter/mirror variants onto it — the
search-engine-grade URL normalization step that string
canonicalization (functions/urls.canonicalize) cannot do, because
only the page author knows that ?page=2&session=x duplicates /d/1.

The reference stops at <a href> link extraction
(/root/reference/scrape.go:210-268 pulls links for follow);
engine-added: at crawl scale canonical declarations both shrink the
frontier (variants need not be fetched once the canonical is seen)
and group fetched duplicates for the dedup stage.

Scale shape:
- extraction is one JVM tag scan per page with attribute-order-free
  attribute pulls (functions/tags.py — any emission order) plus
  a scheme-relative/root-relative resolve as pure string exprs — no
  Python, fuses into the page scan. Full RFC 3986 reference
  resolution lives in the engine's link UDF (parse/udfs.py); the
  canonical link in practice is absolute or root-relative (it is
  written for search engines), and anything else falls back to
  self, which is always safe (a page is its own canonical).
- consolidation is ONE groupBy on the canonical key: members count,
  deterministic example, and whether the canonical URL itself was
  fetched (if not, the crawler should enqueue it — that column IS
  the frontier feedback).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flyscrape_spark.functions.tags import tag_attr, tags_where


def canonical_href(html_col: str | Column = "html") -> Column:
    """The raw declared canonical href ('' when none declared).
    Attribute-order-free (functions/tags.py); first declared
    canonical wins when a page emits several."""
    hrefs = F.filter(
        F.transform(
            tags_where(html_col, "link", "rel", "canonical"),
            lambda t: tag_attr(t, "href"),
        ),
        lambda v: v != "",
    )
    return F.coalesce(F.get(hrefs, 0), F.lit(""))


def canonical_url(
    url_col: str | Column = "url", html_col: str | Column = "html"
) -> Column:
    """Resolved canonical: absolute hrefs pass through, root-relative
    resolve against the page's scheme+host, everything else (missing,
    scheme-relative, dot-relative) falls back to the page URL."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    href = canonical_href(html_col)
    origin = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    return (
        F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
        .when(href.startswith("/") & ~href.startswith("//"),
              F.concat(origin, href))
        .otherwise(url)
    )


def canonical_groups(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(canonical_url, n_pages, example_url, canonical_fetched):
    one row per canonical group over the fetched pages."""
    mapped = pages.select(
        F.col(url_col).alias("url"),
        canonical_url(url_col, html_col).alias("canonical_url"),
    )
    return mapped.groupBy("canonical_url").agg(
        F.count("*").alias("n_pages"),
        F.min("url").alias("example_url"),
        F.max(
            (F.col("url") == F.col("canonical_url")).cast("int")
        ).cast("boolean").alias("canonical_fetched"),
    )
