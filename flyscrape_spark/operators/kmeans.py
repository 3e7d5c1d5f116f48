"""Fixed-iteration Lloyd k-means over an embedding column — the
topic/domain bucketing stage of a training-data pipeline (cluster
assignments drive mixture balancing, dedup scoping, and IVF list
layout; operators/ann.py's static quantizer is this with 0 update
steps).

Deterministic by construction so the DuckDB oracle can twin it:
- init: the k corpus vectors with the smallest ids (same rule as
  ann.ivf_assign's sampling quantizer);
- assignment: squared-L2 distance rounded to 6dp before the argmin,
  ties to the smaller cluster id — kills float-ulp divergence between
  engines;
- update: per-dimension mean rounded to 9dp.
Iteration count is FIXED (a hyperparameter, not a convergence loop),
keeping the whole computation a static DAG.

Scale shape per iteration (N vectors, k clusters, D dims):
- assignment: broadcast the k×D centroids, score N×k JVM-side
  (zip_with/aggregate — no Python), argmin via min-over-struct with
  map-side partial agg: the shuffle carries N rows, not N×k;
- update: explode assigned vectors to (cluster, dim, val) long form
  — N×D rows, linear — and avg per (cluster, dim): map-side
  combinable, shuffle carries k×D rows post-combine. Centroids are
  re-assembled driver-free via array_sort(collect_list) over k×D
  rows (tiny) and localCheckpointed to truncate plan growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sqdist(a, b):
    # cast BEFORE subtracting: fp32 arithmetic would diverge from the
    # double-precision DuckDB oracle
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(vectors: DataFrame, cents: DataFrame,
            id_col: str, vec_col: str) -> DataFrame:
    """(id, cluster, dist): nearest centroid by 6dp-rounded squared
    L2, ties to the smaller cluster id, via partial-agg-combinable
    min-over-struct (never a window over N×k rows)."""
    scored = (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn(
            "d2", F.round(_sqdist(F.col(vec_col), F.col("cent_vec")), 6)
        )
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("d2", "cent_id")).alias("best")
    )
    return best.select(
        id_col,
        F.col("best.cent_id").alias("cluster"),
        F.col("best.d2").alias("dist"),
    )


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist) after ``iterations`` Lloyd rounds from the
    smallest-id init. ``iterations=0`` degrades to the static
    quantizer assignment. Empty clusters keep their previous centroid
    (standard Lloyd fallback, mirrored by the oracle's left join)."""
    vectors = embeddings.select(id_col, vec_col)
    # centroids live in double precision from the start (updates are
    # double means; coalesce with the fp32 input array would not type)
    cents = embeddings.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cent_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cent_vec"),
    )
    for _ in range(iterations):
        assign = _assign(vectors, cents, id_col, vec_col)
        long = (
            vectors.join(assign.select(id_col, "cluster"), id_col)
            .select(
                "cluster",
                F.posexplode(vec_col).alias("dim", "val"),
            )
        )
        new_long = long.groupBy("cluster", "dim").agg(
            F.round(F.avg(F.col("val").cast("double")), 9).alias("cval")
        )
        new_cents = new_long.groupBy(F.col("cluster").alias("cent_id")).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                lambda s: s["cval"],
            ).alias("cent_vec")
        )
        # empty clusters: keep the previous centroid
        cents = (
            cents.join(new_cents.withColumnRenamed("cent_vec", "nv"),
                       "cent_id", "left")
            .select("cent_id", F.coalesce("nv", "cent_vec").alias("cent_vec"))
            .localCheckpoint(eager=False)
        )
    return _assign(vectors, cents, id_col, vec_col)
