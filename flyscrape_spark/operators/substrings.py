"""Exact-substring (overlapping token-window) deduplication — the
suffix-array dedup of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022), re-expressed for Spark: any
``k``-token window that occurs ≥2 times in the corpus marks a
duplicated span. Overlapping windows approximate the suffix-array
"duplicated substring of length ≥ k" set exactly (a repeated
substring of length L ≥ k contributes L-k+1 repeated windows, and
every repeated window lies inside a repeated substring), without the
sequential suffix-array build that does not distribute.

Complements the document-level suite (operators/dedup.py: whole-doc
hash, MinHash/SimHash near-dup) and the non-overlapping boilerplate
segmenter (operators/segments.py): this one finds verbatim spans
copied BETWEEN otherwise-different documents — licenses, quoted
passages, templated paragraphs — the main contamination channel
document-level dedup misses.

The reference has no corpus post-processing (flyscrape stops at
per-page extraction, /root/reference/scrape.go:210-268); engine-added
for the training-data mission.

Scale shape (all linear, no self-join, no sequential stage):
- window explode: narrow transform + posexplode, no shuffle; windows
  keyed by a 64-bit hash so the count shuffle carries 8-byte keys,
  not k-token strings;
- duplicated-window detection: ONE map-side-combinable groupBy on
  the window hash (count ≥ 2 over total occurrences, catching both
  cross-doc and in-doc repetition, as the suffix array does);
- flagging: windows ⋈ duplicated keys — the duplicated side is the
  small filtered set, AQE broadcasts it at runtime (not forced: a
  pathological all-duplicate corpus must not OOM the driver);
- per-doc rollup + longest-run (gaps-and-islands over win_idx):
  one shuffle by doc_id, window function within partition.
At 10^10 docs the large shuffles are the hash count and the doc_id
rollup, both partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flyscrape_spark.functions.hashing import portable_hash64


def window_table(documents: DataFrame, k: int = 5,
                 text_col: str = "text") -> DataFrame:
    """Explode each document into (doc_id, win_idx, win_key) rows of
    overlapping ``k``-token windows (win_idx is 1-based, matching the
    suffix position). Documents shorter than ``k`` tokens produce no
    rows. The window TEXT never leaves the executor — only its
    64-bit key is materialized."""
    toks = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(toks) >= k,
        F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return (
        documents
        .select("doc_id", F.posexplode(wins).alias("pos", "win_text"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("win_idx"),
            portable_hash64("win_text").alias("win_key"),
        )
    )


def duplicated_windows(windows: DataFrame, min_count: int = 2) -> DataFrame:
    """Window keys occurring ≥ ``min_count`` times corpus-wide. One
    combinable groupBy on the 8-byte key."""
    return (
        windows.groupBy("win_key")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") >= min_count)
    )


def substring_dup_stats(documents: DataFrame, k: int = 5,
                        min_count: int = 2,
                        text_col: str = "text") -> DataFrame:
    """Per-document duplicated-span profile:

    - ``n_windows``   — k-token windows in the doc (0 if shorter than k),
    - ``dup_windows`` — windows that repeat ≥ min_count× corpus-wide,
    - ``dup_frac``    — dup_windows / n_windows (0.0 for short docs),
    - ``max_dup_run`` — longest consecutive duplicated-window run,
      i.e. the longest verbatim span shared with other text has
      ``max_dup_run + k - 1`` tokens.

    Every document appears in the output (left join from the corpus),
    so the result composes with curation filters downstream.
    """
    wins = window_table(documents, k=k, text_col=text_col)
    dup = duplicated_windows(wins, min_count=min_count)
    flagged = wins.join(dup.select("win_key"), "win_key", "left_semi")

    # gaps-and-islands: consecutive win_idx values share (win_idx - rn)
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("win_idx"))
    runs = (
        flagged.withColumn("grp", F.col("win_idx") - rn)
        .groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id").agg(F.max("run_len").alias("max_dup_run"))
    )
    per_doc = (
        wins.join(dup.select("win_key", F.lit(True).alias("is_dup")),
                  "win_key", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("dup_windows"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("bigint").alias("dup_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0))
                / F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_frac"),
            F.coalesce("max_dup_run", F.lit(0)).cast("bigint").alias("max_dup_run"),
        )
    )
