"""Crawl-trap detection: flag hosts whose URL space is mechanically
generated (calendars, session ids, faceted search, infinite
pagination) by comparing how many distinct URLs collapse onto each
URL *template* (digit runs → ``N``).

The reference has no defense against traps beyond the depth cap
(/root/reference/modules/depth/depth.go:26-28) and the 1<<20 queue
drop (/root/reference/scrape.go:82); at the 10^10-URL design point a
single calendar trap can dominate an entire host's politeness-limited
fetch budget, so the frontier needs a host-level signal to throttle
or blocklist trap hosts. Template collapsing is the classic public
heuristic (URL "path signatures" in the crawler literature — e.g.
IRLbot's spam/URL-space analysis line of work).

Scale shape: one projection (template = regexp_replace, pure
codegen) and ONE groupBy(host) computing both distinct counts via
Spark's expand-based multi-distinct — linear shuffle on host, no
joins. Output is one row per host (bounded by host cardinality, tiny
next to the URL table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hosts whose URLs-per-template ratio exceeds this are trap-flagged
TRAP_RATIO = 50.0


def url_template(col="url") -> F.Column:
    """Collapse every digit run in the URL to ``N`` — the template
    key under which mechanically generated URLs collide."""
    return F.regexp_replace(F.col(col), r"[0-9]+", "N")


def trap_stats(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    ratio: float = TRAP_RATIO,
    min_urls: int = 0,
    whitelist: list[str] | None = None,
) -> DataFrame:
    """Per-host (host, n_urls, n_templates, urls_per_template,
    is_trap): distinct URLs, distinct templates, their ratio, and the
    trap flag at ``ratio``.

    Precision knobs (a pure ratio test flags legitimate
    high-cardinality hosts — e.g. a forum whose million thread URLs
    all share ``/post/N``):

    - ``min_urls``: hosts with fewer distinct URLs than this are never
      flagged (small-sample ratios are noise).
    - ``whitelist``: hosts never flagged regardless of ratio — the
      operator's stats still report them, so curators can audit the
      exemption. Applied as an isin() literal (whitelists are
      human-maintained and small); for a large allowlist table,
      anti-join it upstream instead.
    """
    t = urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        url_template(url_col).alias("template"),
    )
    flag = F.col("n_urls") / F.col("n_templates") >= ratio
    if min_urls:
        flag = flag & (F.col("n_urls") >= min_urls)
    if whitelist:
        flag = flag & ~F.col("host").isin(list(whitelist))
    return (
        t.groupBy("host")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("template").alias("n_templates"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            F.round(F.col("n_urls") / F.col("n_templates"), 4).alias(
                "urls_per_template"
            ),
            flag.alias("is_trap"),
        )
    )


#: families at or above this many distinct URLs are parametric
FAMILY_THRESHOLD = 50


def url_template_full(col: str | F.Column = "url") -> F.Column:
    """Hex-aware URL template: lowercase, maximal hex runs of >= 12
    chars collapse to ``H`` (session ids, content hashes), remaining
    digit runs to ``N`` (page numbers, item ids). Order matters: the
    hex rule must fire first or its digits are consumed by ``N``."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"[0-9a-f]{12,}", "H")
    return F.regexp_replace(c, r"[0-9]+", "N")


def template_families(
    urls: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    threshold: int = FAMILY_THRESHOLD,
) -> DataFrame:
    """Per-(host, template) URL-family table: how many distinct URLs
    collapse into each template, a deterministic example (the min
    URL), and the parametric flag at ``threshold`` — the
    URL-normalization complement to the per-host ``trap_stats``
    ratio: families tell the curator WHICH pattern to cap or rewrite
    (session-id stripping, pagination limits), not just which host
    is suspicious.

    Scale shape: one distinct on (host, template, url) — a plain
    hash-repartition on near-unique keys, skew-free — then a
    map-side-combinable count + min per family. No windows, no
    self-joins; at 10^10 URLs both exchanges carry the URL count
    once."""
    fam = (
        urls.select(
            F.col(host_col).alias("host"),
            url_template_full(url_col).alias("template"),
            F.col(url_col).alias("url"),
        )
        .distinct()
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("url").alias("example_url"),
        )
    )
    return fam.withColumn(
        "parametric", F.col("n_urls") >= F.lit(threshold)
    )
