"""Corpus drift measurement: per-term Jensen-Shannon divergence
contributions between two corpus snapshots' unigram distributions —
the standard "did this crawl/filter change what the model will see"
QA statistic (JSD is symmetric, bounded [0,1] in bits, and defined
even where one side has zero mass, unlike raw KL).

The reference has no corpus analytics (flyscrape emits records, it
does not compare crawls); engine-added for the training-data mission:
run it old-crawl vs new-crawl, pre-filter vs post-filter, or
source vs source, and read the top contributing terms.

Scale shape: two map-side-combinable token counts (one per side,
each ONE shuffle on the term key) + a full-outer equi-join on the
same key — the join reuses the aggregation's partitioning, so no
extra exchange under AQE. Totals are 1-row broadcasts. Nothing is
ever collected; the output is one row per term in either vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.operators.dedup import normalized_text


def _term_counts(documents: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")
    return (
        documents.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def corpus_drift(
    old_docs: DataFrame, new_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, p_old, p_new, jsd_term): per-term JSD contributions.

    jsd_term = (p*log2(2p/(p+q)) + q*log2(2q/(p+q))) / 2 with the
    usual 0*log0 = 0 convention; sum(jsd_term) over the output is the
    corpus-level divergence in bits (1.0 = disjoint vocabularies).
    Probabilities and contributions are rounded (6/8 dp) so the
    number is engine- and partition-order-portable.
    """
    a = _term_counts(old_docs, text_col)
    b = _term_counts(new_docs, text_col)
    ta = a.agg(F.sum("n").alias("tot_a"))
    tb = b.agg(F.sum("n").alias("tot_b"))
    j = (
        a.withColumnRenamed("n", "n_a")
        .join(b.withColumnRenamed("n", "n_b"), "token", "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    p = F.coalesce(F.col("n_a"), F.lit(0)).cast("double") / F.col("tot_a")
    q = F.coalesce(F.col("n_b"), F.lit(0)).cast("double") / F.col("tot_b")
    m = (p + q) / F.lit(2.0)

    def xlog2(x, mm):
        return F.when(x > 0, x * F.log2(x / mm)).otherwise(F.lit(0.0))

    jsd = (xlog2(p, m) + xlog2(q, m)) / F.lit(2.0)
    return j.select(
        "token",
        F.round(p, 6).alias("p_old"),
        F.round(q, 6).alias("p_new"),
        F.round(jsd, 8).alias("jsd_term"),
    )
