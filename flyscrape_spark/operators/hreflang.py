"""hreflang alternate-language clusters: group pages that declare
each other as language variants via
``<link rel="alternate" hreflang="xx" href="...">`` — the
international sibling of rel=canonical (operators/canonical.py).

The reference has no notion of page relations beyond followed links;
engine-added for the crawl mission: language variants are exact or
near translations of one logical document, so the cluster map feeds
(a) dedup — keep one doc per (cluster, lang), not per URL; (b)
language-targeted corpus mixing — sample whole clusters to keep
parallel text aligned; (c) frontier budgeting — a 40-language site
multiplies every URL by 40.

Extraction is two JVM ``regexp_extract_all`` passes over the SAME tag
pattern (one capturing hreflang, one capturing href) zipped
positionally — both scans see the identical match sequence, so the
zip is exact. Cluster key = lexicographic min href across the
declared alternate set (every member page declares the full set, so
all members agree on the min without any graph iteration).

Scale shape: extract + explode are pure codegen; one combinable
groupBy on the cluster key. No Python, no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TAG = (
    r'<link[^>]*rel=["\']alternate["\'][^>]*hreflang=["\']([^"\']*)["\']'
    r'[^>]*href=["\']([^"\']*)["\']'
)


def hreflang_pairs(html_col: str | Column = "html") -> Column:
    """array<struct<lang,href>> of every declared alternate, in
    document order (rel -> hreflang -> href attribute order; the
    common emission order of i18n CMSes — additional attribute
    permutations would add sibling patterns exactly like
    operators/metarobots.py does)."""
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    langs = F.regexp_extract_all(h, F.lit(_TAG), 1)
    hrefs = F.regexp_extract_all(h, F.lit(_TAG), 2)
    return F.arrays_zip(langs.alias("lang"), hrefs.alias("href"))


def hreflang_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(cluster_id, n_pages, langs) — one row per alternate-set.

    cluster_id = min href of the declared set; langs = sorted distinct
    declared language tags; n_pages = member pages actually fetched
    (pages with no hreflang markup are skipped — they are their own
    singleton logical documents and would only bloat the output)."""
    pairs = hreflang_pairs(html_col)
    with_set = pages.select(
        F.col(url_col).alias("url"),
        pairs.alias("alts"),
    ).filter(F.size("alts") > 0)
    member = with_set.select(
        "url",
        F.array_min(F.transform(F.col("alts"), lambda a: a["href"])).alias(
            "cluster_id"
        ),
        F.array_sort(
            F.array_distinct(F.transform(F.col("alts"), lambda a: a["lang"]))
        ).alias("page_langs"),
    )
    return (
        member.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("page_langs")))
            ).alias("langs"),
        )
    )
