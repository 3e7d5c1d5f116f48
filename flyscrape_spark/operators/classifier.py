"""Model-based quality filtering: a linear classifier over hashed
bag-of-words features, scored corpus-wide with the weight vector as
a BROADCAST table — the public CCNet / LLaMA-style "quality
classifier" stage (fastText-shaped linear model; Joulin et al. 2016)
re-expressed as a Spark plan.

The reference has no scoring stage (flyscrape extracts, it does not
curate); engine-added for the training-data mission alongside the
heuristic scores in operators/text.py. The heuristics are per-row
expressions; this operator is the production path once a TRAINED
model exists: its parameters arrive as a (feature_id, weight) frame,
which is exactly the shape a fastText .bin or sklearn coef_ exports
to.

Scale shape:
- feature hashing (the "hashing trick", Weinberger et al. 2009):
  token -> portable_hash64(token) % dim, no vocabulary shuffle and a
  fixed-size model regardless of corpus size;
- tokens explode -> ONE map-side-combinable groupBy (doc_id,
  feature) -> join the weight table (dim rows: always below the
  broadcast threshold — a 2^20-feature model is ~8 MB) -> one
  combinable per-doc sum. No shuffle carries the corpus twice, and
  the model never leaves the executors after one broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.functions.hashing import portable_hash64
from flyscrape_spark.operators.dedup import normalized_text


def hashed_features(
    documents: DataFrame, dim: int, text_col: str = "text"
) -> DataFrame:
    """(doc_id, feature, n): hashed-token occurrence counts."""
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")
    return (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .select(
            "doc_id",
            F.pmod(portable_hash64(F.col("token")), F.lit(dim)).alias("feature"),
        )
        .groupBy("doc_id", "feature")
        .agg(F.count("*").alias("n"))
    )


def linear_quality_score(
    documents: DataFrame,
    weights: DataFrame,
    dim: int,
    bias: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, score): sigmoid(bias + mean feature weight)
    per document under a broadcast linear model.

    ``weights`` is (feature: long, weight: double) — the trained
    model. Missing features score 0 (an L2-trained linear model's
    implicit value for unseen features). Score is rounded to 6dp:
    wide enough above double ulp that per-engine/partition sum order
    cannot surface, tight enough to be a real probability.
    """
    feats = hashed_features(documents, dim, text_col)
    scored = (
        feats.join(F.broadcast(weights), "feature", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.coalesce("weight", F.lit(0.0))).alias("wsum"),
        )
    )
    z = F.lit(bias) + F.col("wsum") / F.col("n_tokens")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    out = scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(score, 6).alias("score"),
    )
    # docs that normalize to zero tokens: score at the bias point
    empty = documents.join(feats.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.lit(0).cast("bigint").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-bias))), 6).alias("score"),
    )
    return out.unionAll(empty)


def demo_weights(spark, dim: int) -> DataFrame:
    """Deterministic stand-in weight vector for tests/queries where
    no trained model exists: w_j = ((37*j + 11) mod 201 - 100) / 100
    — integer-derived, so the DuckDB oracle reproduces it exactly.
    A real deployment replaces this with the exported model table."""
    return spark.range(dim).select(
        F.col("id").alias("feature"),
        (((F.lit(37) * F.col("id") + 11) % 201 - 100) / 100.0).alias("weight"),
    )
