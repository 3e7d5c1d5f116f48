"""Charset declaration audit: Content-Type header vs in-document
meta declaration, per host.

Round 3 fixed the transport to honor charset (HTTP header first,
HTML5 meta sniff fallback — sources/transport.py decode_body, the
rule the reference gets free from Go net/http + goquery,
/root/reference/scrape.go:178-196). This operator is the corpus-side
audit of that same signal: hosts whose headers and documents
disagree are exactly where mojibake risk lives, and a host that
declares nothing forces the sniffer on every page. The rollup feeds
the crawl QA dashboard and flags hosts worth a decode spot-check.

Scale shape: three JVM regexes per page (header charset param, HTML5
``<meta charset>``, legacy ``http-equiv`` form), one combinable
groupBy(host) — no Python, no windows, fuses into the page scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: charset parameter of a Content-Type value (RFC 9110 §8.3:
#: parameter name case-insensitive, value may be quoted)
_HEADER_CHARSET = r'(?i)charset\s*=\s*"?\s*([^";\s]+)'

#: HTML5 <meta charset="..."> — two placements, both requiring
#: charset in ATTRIBUTE position: first attribute, or following a
#: closing quote of a previous attribute. A bare `\scharset=` would
#: also match inside another attribute's VALUE (e.g. <meta
#: name="description" content="how to set charset=utf-8">),
#: inventing phantom declarations; the quote-anchored form cannot.
_META_CHARSET_FIRST = r'(?i)<meta\s+charset\s*=\s*["\']?\s*([^"\'>\s/]+)'
_META_CHARSET_LATER = (
    r'(?i)<meta[^>]*["\']\s+charset\s*=\s*["\']?\s*([^"\'>\s/]+)'
)

#: legacy <meta http-equiv="Content-Type" content="...;charset=...">
_META_HTTP_EQUIV = (
    r'(?i)<meta[^>]*http-equiv\s*=\s*["\']content-type["\'][^>]*'
    r'content\s*=\s*["\'][^"\']*charset\s*=\s*([^"\'>;\s]+)'
)


def _norm(c: Column) -> Column:
    return F.nullif(F.lower(F.trim(c)), F.lit(""))


def header_charset(content_type_col: str | Column = "content_type") -> Column:
    """Lowercased charset parameter of a Content-Type header value,
    NULL when absent."""
    c = (
        F.col(content_type_col)
        if isinstance(content_type_col, str)
        else content_type_col
    )
    return _norm(F.regexp_extract(c, _HEADER_CHARSET, 1))


def meta_charset(html_col: str | Column = "html") -> Column:
    """Lowercased document-declared charset: HTML5 ``<meta charset>``
    first, legacy http-equiv form as fallback (the HTML5 sniffing
    order), NULL when neither appears."""
    h = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.coalesce(
        _norm(F.regexp_extract(h, _META_CHARSET_FIRST, 1)),
        _norm(F.regexp_extract(h, _META_CHARSET_LATER, 1)),
        _norm(F.regexp_extract(h, _META_HTTP_EQUIV, 1)),
    )


def charset_audit(
    pages: DataFrame,
    host_col: str = "host",
    content_type_col: str = "content_type",
    html_col: str = "html",
) -> DataFrame:
    """(host, n_pages, n_header, n_meta, n_mismatch, n_undeclared,
    mismatch_rate): per-host agreement between the transport-level
    and document-level charset declarations. A mismatch counts only
    when BOTH are declared and differ; undeclared pages (neither
    signal) rely wholly on content sniffing."""
    hdr = header_charset(content_type_col)
    meta = meta_charset(html_col)
    base = pages.select(
        F.col(host_col).alias("host"),
        hdr.alias("hdr"),
        meta.alias("meta"),
    )
    mismatch = (
        F.col("hdr").isNotNull()
        & F.col("meta").isNotNull()
        & (F.col("hdr") != F.col("meta"))
    )
    undeclared = F.col("hdr").isNull() & F.col("meta").isNull()
    per_host = base.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.col("hdr").isNotNull().cast("long")).alias("n_header"),
        F.sum(F.col("meta").isNotNull().cast("long")).alias("n_meta"),
        F.sum(mismatch.cast("long")).alias("n_mismatch"),
        F.sum(undeclared.cast("long")).alias("n_undeclared"),
    )
    return per_host.withColumn(
        "mismatch_rate",
        F.round(F.col("n_mismatch") / F.col("n_pages"), 6),
    )


def declared_lang_audit(
    pages: DataFrame,
    host_col: str = "host",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Declared-vs-detected language audit: the ``<html lang>``
    attribute against the marker-heuristic language id
    (operators/text.py lang_pred_expr), per host. Hosts that
    mislabel their language (a real, common defect — template
    copied from an English theme) poison language-targeted corpus
    selection (lang_mix, per-language quality gates), so the crawl
    QA pass flags them before curation trusts the attribute.

    Output: (host, n_pages, n_declared, n_mismatch, mismatch_rate)
    — a mismatch counts only when the attribute exists and its
    primary subtag (BCP 47: 'en-US' → 'en') differs from the
    detected language.

    Scale shape: one JVM regexp for the attribute + the marker-count
    expression, one combinable groupBy(host). No Python, no joins.
    """
    from flyscrape_spark.operators.dedup import normalized_text
    from flyscrape_spark.operators.text import lang_pred_expr

    h = F.col(html_col)
    declared_raw = _norm(
        F.regexp_extract(h, r'(?i)<html[^>]*\slang\s*=\s*["\']?([A-Za-z-]+)', 1)
    )
    declared = F.substring_index(declared_raw, "-", 1)
    detected = lang_pred_expr(F.split(normalized_text(text_col), " "))
    base = pages.select(
        F.col(host_col).alias("host"),
        declared.alias("declared"),
        detected.alias("detected"),
    )
    mismatch = F.col("declared").isNotNull() & (
        F.col("declared") != F.col("detected")
    )
    per_host = base.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.col("declared").isNotNull().cast("long")).alias(
            "n_declared"
        ),
        F.sum(mismatch.cast("long")).alias("n_mismatch"),
    )
    return per_host.withColumn(
        "mismatch_rate",
        F.round(F.col("n_mismatch") / F.col("n_pages"), 6),
    )
