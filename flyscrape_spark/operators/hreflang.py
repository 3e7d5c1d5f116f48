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

Extraction is attribute-order-FREE (functions/tags.py): one regex
scan pulls every ``<link ...>`` tag, a filter keeps rel=alternate
tags carrying both hreflang and href, and each attribute is read out
of the matched tag text independently — so ``<link href=.. hreflang=..
rel=alternate>`` (a real-CMS emission order) clusters identically to
the canonical ordering. Cluster key = lexicographic min href across
the declared alternate set (every member page declares the full set,
so all members agree on the min without any graph iteration).

Scale shape: extract + explode are pure codegen; one combinable
groupBy on the cluster key. No Python, no joins. The set-valued
``langs`` rollup is serialized to a comma-joined string (exactly as
operators/anchors.py does) so the output schema is atomic-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flyscrape_spark.functions.tags import tag_attr, tags_where


def hreflang_pairs(html_col: str | Column = "html") -> Column:
    """array<struct<lang,href>> of every declared alternate, in
    document order, regardless of attribute order within the tag.
    Tags missing either hreflang or href are dropped (malformed)."""
    alt = F.filter(
        tags_where(html_col, "link", "rel", "alternate"),
        lambda t: (tag_attr(t, "hreflang") != "") & (tag_attr(t, "href") != ""),
    )
    return F.transform(
        alt,
        lambda t: F.struct(
            tag_attr(t, "hreflang").alias("lang"),
            tag_attr(t, "href").alias("href"),
        ),
    )


def hreflang_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(cluster_id, n_pages, langs) — one row per alternate-set.

    cluster_id = min href of the declared set; langs = comma-joined
    sorted distinct declared language tags (serialized to a string so
    the output schema stays atomic); n_pages = member pages actually
    fetched (pages with no hreflang markup are skipped — they are
    their own singleton logical documents and would only bloat the
    output)."""
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
            F.array_join(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("page_langs")))
                ),
                ",",
            ).alias("langs"),
        )
    )
