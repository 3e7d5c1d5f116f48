"""Best-first frontier admission: rank a frontier generation by an
importance score and admit only the per-depth fetch budget.

The reference frontier is plain FIFO — every enqueued URL is fetched
(/root/reference/scrape.go:82-131: an unbounded channel drained in
order). At the 10^10-URL design point the frontier outgrows the
politeness-limited fetch budget by orders of magnitude, and the crawl
must choose WHICH admitted URLs to spend the budget on. This operator
is that chooser: score-ordered truncation per depth, with the scores
coming from operators/graph.py (in-degree or PageRank over the link
graph discovered so far) or any user column.

It composes at the same point as the per-host budget
(operators/politeness.py host_budget): after dedup/filters, before
the fetch join in plans/frontier.py — both are row_number
window-limits, so chaining them stays two shuffles total.

Scale shape: ONE shuffle each — a left join onto the score table
(broadcast when small, sort-merge otherwise) and a
Window.partitionBy(depth) row_number. Depth cardinality is tiny
(≤ max crawl depth), so the window would be the canonical skew death
EXCEPT that rank-limit pushdown (WindowGroupLimit, Spark 3.5+)
truncates every map partition to ``budget`` rows BEFORE the
exchange: the shuffle carries at most budget × n_map_partitions
rows, not the frontier. Plan-asserted in tools/explain_audit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def prioritize_frontier(
    frontier: DataFrame,
    scores: DataFrame,
    budget: int,
    key: str = "url_key",
    score_col: str = "score",
    depth_col: str = "depth",
    order_col: str = "discovery_order",
) -> DataFrame:
    """Admit the ``budget`` highest-score rows per depth.

    ``scores`` is (key, score_col); unscored URLs rank last at score
    0 (a never-seen page has no in-links yet). Ties break on the
    canonical discovery order, keeping the admission deterministic —
    with a constant score column this degrades exactly to the
    reference's FIFO prefix.
    """
    scored = frontier.join(scores, key, "left").withColumn(
        "_score", F.coalesce(F.col(score_col), F.lit(0.0)).cast("double")
    )
    w = Window.partitionBy(depth_col).orderBy(
        F.col("_score").desc(), F.col(order_col)
    )
    return (
        scored.withColumn("admit_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("admit_rank") <= budget)
        .drop("_score", score_col)
    )
