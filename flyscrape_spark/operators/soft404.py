"""Soft-404 detection: pages that answer HTTP 200 but are really
error pages — the classic crawl-corpus poison (search results for
dead URLs, infinite "not found" shells behind catch-all routers).

The reference trusts the status code alone (`/root/reference/
scrape.go:178-196` records StatusCode verbatim and the follow loop
only gates on it); engine-added for the crawl mission: at corpus
scale a catch-all host can inject millions of identical "not found"
shells that pass every status filter, and downstream dedup/quality
stages each pay to rediscover them. Standard crawler practice
(Bar-Yossef et al., "Sic transit gloria telae", WWW'04) is to learn
each host's error template from KNOWN 404s and flag 200-responses
that serve the same body.

Two independent signals, both cheap:

- **phrase**: the body matches a small not-found phrase list — one
  JVM regex over the lowercased text, fuses into the page scan.
- **template**: the body's content hash equals a known hard-error
  (status >= 400) body hash on the SAME host. The template table is
  tiny — distinct (host, body_hash) over error rows, a few rows per
  host — so the probe is a broadcast left-semi-shaped join; the 200
  side never shuffles.

Scale shape: one combinable distinct over the error slice (hash-
partitioned, skew-free), broadcast to the 200-row scan; the phrase
test is pure column expression. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64

#: lowercase substrings that mark a not-found shell (kept deliberately
#: short and high-precision; recall comes from the template signal)
NOT_FOUND_PHRASES = (
    "page not found",
    "404 not found",
    "does not exist",
    "no longer available",
)

_PHRASE_RE = "|".join(p.replace(" ", " ") for p in NOT_FOUND_PHRASES)


def phrase_hit(text_col: str | Column = "text") -> Column:
    """True when the body contains a not-found phrase (case-folded)."""
    t = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    return t.rlike(_PHRASE_RE)


def error_templates(
    pages: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    text_col: str = "text",
) -> DataFrame:
    """(host, body_hash) distinct over hard-error responses — each
    host's learned error-page signature set. Combinable distinct:
    ships one row per (host, hash, partition)."""
    return (
        pages.filter(F.col(status_col) >= 400)
        .select(
            F.col(host_col).alias("host"),
            portable_hash64(text_col).alias("body_hash"),
        )
        .distinct()
    )


def soft_404(
    pages: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """(url, host, phrase_hit, template_hit, soft404) for every
    status-200 page. ``soft404`` = phrase OR template signal.

    The template join broadcasts the per-host error-signature table
    (rows ~ O(hosts), never O(pages)) so the 200-side scan keeps its
    input partitioning — no shuffle on the big side.
    """
    templates = error_templates(
        pages, host_col=host_col, status_col=status_col, text_col=text_col
    ).withColumn("_tpl", F.lit(True))
    ok = pages.filter(F.col(status_col) == 200).select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        portable_hash64(text_col).alias("body_hash"),
        phrase_hit(text_col).alias("phrase_hit"),
    )
    flagged = ok.join(
        F.broadcast(templates),
        on=[ok["host"] == templates["host"],
            ok["body_hash"] == templates["body_hash"]],
        how="left",
    )
    return flagged.select(
        ok["url"],
        ok["host"],
        F.col("phrase_hit"),
        F.coalesce(F.col("_tpl"), F.lit(False)).alias("template_hit"),
        (F.col("phrase_hit") | F.coalesce(F.col("_tpl"), F.lit(False))).alias(
            "soft404"
        ),
    )
