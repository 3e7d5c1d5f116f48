"""DSIR-style importance-weighted data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
score every raw document by the log-likelihood ratio of a TARGET
hashed-unigram distribution vs the RAW corpus distribution, then
keep the documents whose per-token log ratio says "looks like the
target". The public recipe behind domain-matched pretraining subsets
(e.g. select web text that resembles a curated corpus).

The reference has no selection stage; engine-added for the
training-data mission as the model-free complement to
operators/classifier.py (no trained weights needed — the target
*corpus itself* is the model).

Scale shape:
- feature hashing (token -> hash mod dim) keeps both distributions
  at a FIXED dim rows regardless of corpus size — they broadcast;
- the target flag is evaluated per document BEFORE the explode and
  carried through the (doc_id, feature) aggregation, so the raw AND
  target feature counts come out of ONE conditional-sum groupBy on
  the feature key (dim rows) — there is no separate target pass and
  no corpus-sized join anywhere;
- the two distribution totals are unbounded windows over the dim-row
  frame (single-partition pass over dim rows, never a corpus
  re-aggregation), the llr table broadcast-joins back onto the
  doc-feature counts, and one combinable per-doc sum produces the
  weight;
- selection is a per-row threshold on the weight (importance ratio
  > 1), NOT a global top-k — so there is no global sort/window and
  the operator stays embarrassingly parallel end to end. (DSIR
  proper then *samples* by these weights; a deterministic threshold
  is the reproducible variant the correctness gate can pin.)
- token-free documents are identified by a pure filter (token count
  == 0), not an anti-join against the exploded side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from flyscrape_spark.functions.hashing import portable_hash64
from flyscrape_spark.operators.dedup import normalized_text


def dsir_select(
    documents: DataFrame,
    target_pred: Column,
    dim: int = 256,
    eps: float = 1e-6,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, log_ratio, selected): per-document DSIR
    importance score and threshold decision.

    ``target_pred`` marks the in-target rows (e.g. ``F.col("lang") ==
    "en"`` or membership in a curated source). log_ratio is the mean
    per-token ln((p_target+eps)/(p_raw+eps)); selected = log_ratio >
    0, i.e. the doc is more probable under the target distribution.
    Rounded to 6dp for cross-engine exactness.
    """
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")
    feats = (
        documents.select(
            "doc_id", target_pred.alias("is_tgt"), F.explode(toks).alias("token")
        )
        .select(
            "doc_id",
            "is_tgt",
            F.pmod(portable_hash64(F.col("token")), F.lit(dim)).alias("feature"),
        )
        .groupBy("doc_id", "is_tgt", "feature")
        .agg(F.count("*").alias("n"))
    )

    counts = feats.groupBy("feature").agg(
        F.sum("n").alias("c_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
            "c_tgt"
        ),
    )
    everything = Window.partitionBy()
    dist = counts.select(
        "feature",
        F.log(
            (
                F.col("c_tgt").cast("double")
                / F.sum("c_tgt").over(everything).cast("double")
                + F.lit(eps)
            )
            / (
                F.col("c_raw").cast("double")
                / F.sum("c_raw").over(everything).cast("double")
                + F.lit(eps)
            )
        ).alias("llr"),
    )

    scored = (
        feats.join(F.broadcast(dist), "feature")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.col("n") * F.col("llr")).alias("llr_sum"),
        )
    )
    ratio = F.round(F.col("llr_sum") / F.col("n_tokens"), 6)
    out = scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        ratio.alias("log_ratio"),
        (ratio > 0).alias("selected"),
    )
    # token-free docs: ratio 0, not selected (no evidence either way)
    empty = documents.filter(F.size(toks) == 0).select(
        "doc_id",
        F.lit(0).cast("bigint").alias("n_tokens"),
        F.lit(0.0).alias("log_ratio"),
        F.lit(False).alias("selected"),
    )
    return out.unionAll(empty)
