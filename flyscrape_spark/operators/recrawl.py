"""Recrawl scheduling: diff two crawl snapshots by content hash and
label every URL new / changed / unchanged / gone — the table an
incremental crawler turns into its next fetch list (changed+new →
refetch, gone → tombstone, unchanged → extend the revisit interval).

The reference crawls once and exits (its cache module can *resume*
an identical crawl, /root/reference/modules/cache/cache.go, but has
no notion of diffing two completed crawls); this is engine-added for
the continuous-crawl design point, composing with
sources/snapshots.py (each SnapshotStore generation IS such a
snapshot).

Scale shape: ONE full-outer equi-join on the page key, linear in
both snapshots. At 10^10 URLs both sides come from the bucketed
seen/snapshot store bucketed on the same key (sources/seen_store.py),
so the join is shuffle-free on both sides; here the plan is the
plain two-shuffle sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_delta(
    current: DataFrame,
    previous: DataFrame,
    key: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Label each key across two (key, content_hash) snapshots.

    Returns (key, status, refetch) where status ∈
    {new, changed, unchanged, gone} and refetch is the scheduling
    decision (true for new/changed).
    """
    cur = current.select(F.col(key), F.col(hash_col).alias("_cur"))
    prev = previous.select(F.col(key), F.col(hash_col).alias("_prev"))
    status = (
        F.when(F.col("_prev").isNull(), F.lit("new"))
        .when(F.col("_cur").isNull(), F.lit("gone"))
        .when(F.col("_cur") == F.col("_prev"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return cur.join(prev, key, "full_outer").select(
        key,
        status.alias("status"),
        status.isin("new", "changed").alias("refetch"),
    )
