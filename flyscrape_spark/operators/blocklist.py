"""UT1-style domain blocklist gate: filter crawl URLs against a
category blocklist of domains (the Université Toulouse 1 "blacklists"
convention used by CCNet/RefinedWeb to drop adult/gambling/malware
sites before any content-based curation).

The reference has no blocklist stage (flyscrape filters by
allowedDomains/blockedDomains globs per script — config.go handles
exact-host lists); engine-added for the training-data mission, where
the blocklist is an external multi-million-domain table rather than a
per-script literal.

Matching rule (UT1 semantics): a host is blocked by a listed domain D
iff host == D or host ends with "." + D — i.e. label-aligned suffix
match, so "site0.co.uk" blocks "www.site0.co.uk" but NOT
"evilsite0.co.uk". When several listed domains match one host the
MOST SPECIFIC (longest, = deepest) match decides the category.

Scale shape, in plan order:
- the host's dot-suffix chain is a per-row array expression (a host
  has ≤ ~10 labels, so the explode fan-out is bounded by a small
  constant, never by corpus size);
- candidate matching is one equi-join on the suffix string — never a
  LIKE/regex scan over the list. UT1 is ~4M domains ≈ tens of MB, so
  the blocklist side is BROADCAST under ``broadcast_threshold`` rows
  (the robots.py gating convention: caller passes the known list size
  when it has one; an oversized list degrades to a plain shuffle
  equi-join on the suffix key, which stays skew-free because suffixes
  of distinct hosts are near-unique);
- the most-specific-match reduction is a map-side-combinable
  ``min_by`` groupBy on the URL key (position index ascending =
  specificity descending), then one left join back to the input to
  re-attach unmatched rows with ``blocked = false``.

Cross-engine exactness: string operations only — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: UT1 ships ~4M domains; broadcast comfortably holds an order more.
BLOCKLIST_BROADCAST_THRESHOLD = 20_000_000


def host_suffixes(host_col: str | Column) -> Column:
    """array<struct<pos:int, suffix:string>> — every label-aligned
    dot-suffix of the host with at least 2 labels, position 0 = the
    full host (most specific)."""
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.array_join(F.slice(labels, i + 1, n), ".").alias("suffix"),
        ),
    )


def domain_blocklist_filter(
    urls: DataFrame,
    blocklist: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    host_col: str = "host",
    n_blocked: int | None = None,
    broadcast_threshold: int = BLOCKLIST_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Annotate every input row with (blocked, matched_domain,
    category) against ``blocklist(domain, category)``.

    ``n_blocked`` is the caller's known blocklist size (rows); when
    provided and under ``broadcast_threshold`` the list side is
    broadcast so the gate costs zero shuffles on the URL side.
    """
    keys = list(key_cols)
    cand = (
        urls.select(*keys, F.explode(host_suffixes(host_col)).alias("s"))
        .select(*keys, F.col("s.pos").alias("pos"),
                F.col("s.suffix").alias("suffix"))
    )
    rules = blocklist.select(
        F.lower(F.col("domain")).alias("suffix"), "category"
    )
    if n_blocked is not None and n_blocked <= broadcast_threshold:
        rules = F.broadcast(rules)
    best = (
        cand.join(rules, "suffix")
        .groupBy(*keys)
        .agg(
            F.min_by(
                F.struct(F.col("suffix").alias("matched_domain"), "category"),
                F.col("pos"),
            ).alias("m")
        )
        .select(*keys, F.col("m.matched_domain").alias("matched_domain"),
                F.col("m.category").alias("category"))
    )
    return (
        urls.join(best, keys, "left")
        .select(
            *keys,
            host_col,
            F.col("matched_domain").isNotNull().alias("blocked"),
            "matched_domain",
            "category",
        )
    )
