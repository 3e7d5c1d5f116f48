"""Inverted-index construction: per-term posting lists with
capped length — the serving-side artifact a corpus search / RAG
retrieval layer builds from the curated documents (public BM25-style
layout: term -> document frequency + (doc, tf) postings ranked by
term frequency).

The reference has no index stage (flyscrape emits records); engine-
added for the training-data mission — corpus search is how curation
decisions get audited ("show me every doc containing X") and how
contamination reports drill down.

Scale shape:
- tokens explode into ONE map-side-combinable groupBy(token, doc_id)
  — tf counting never shuffles raw text, only (hashable token,
  doc_id) pairs;
- document frequency and the posting rank share the SAME token-key
  shuffle (window over the aggregated tf table);
- the per-term posting cap compiles to WindowGroupLimit (a k-row
  heap per token partition, never a full per-term sort buffer), so a
  stop-word with 10^9 postings cannot blow a reduce task — the same
  rank-cap discipline as anchors.py;
- df is counted BEFORE the cap, so the stat stays exact while the
  stored list is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flyscrape_spark.operators.dedup import normalized_text


def inverted_index(
    documents: DataFrame,
    max_postings: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """(token, df, doc_id, tf, rank): the top-``max_postings``
    postings per term, ranked by (tf desc, doc_id asc), with the
    exact document frequency on every row.

    Flat rows rather than a nested array column so the artifact is
    directly queryable/joinable (and engine-portable); a writer
    groups by token at export time.
    """
    toks = F.filter(F.split(normalized_text(text_col), " "), lambda t: t != "")
    tf = (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    wdf = Window.partitionBy("token")
    return (
        tf.withColumn("df", F.count("*").over(wdf))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_postings)
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            "doc_id",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
