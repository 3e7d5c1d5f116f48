"""Mergeable cardinality sketches for per-group distinct counts at
crawl scale — "distinct pages per host", "distinct registrable
domains per TLD", "unique outlink targets per site" are the frontier
scheduler's capacity signals, and exact count(DISTINCT) over a
Zipf-skewed group key is the classic straggler shuffle.

KMV (k-minimum-values, Bar-Yossef et al. RANDOM 2002; the
DataSketches "theta" family's core): keep the k smallest hash values
per group; if a group yields fewer than k distinct hashes the count
is exact, otherwise estimate (k-1)/u_k where u_k is the k-th
smallest hash mapped uniformly into (0,1). Unlike HLL's
leading-zero registers, every step is integer-exact and therefore
bit-reproducible across engines — the DuckDB oracle runs the same
arithmetic.

The reference has no sketching (flyscrape counts nothing across
pages); engine-added for the 10^10-URL design point.

Scale shape (min-k is a MERGEABLE sketch: min-k(A ∪ B) =
min-k(min-k(A) ∪ min-k(B)), so it two-phases like any combinable
agg):
- distinct (group, hash) pairs: one map-side-combinable groupBy;
- phase 1: rank window inside (group, salt) — each partition sees
  only its salt bucket's distinct hashes, never the whole group;
- phase 2: rank window inside group over ≤ salt_buckets*k
  survivors — bounded rows per group by construction.
No count(DISTINCT), no unbounded collect_set, no skewed single
window over a raw group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flyscrape_spark.functions.hashing import portable_hash64

# portable_hash64 is a 60-bit md5-prefix hash: uniform on [0, 2^60)
_TWO60 = float(2**60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 8,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-group distinct-count estimate of ``key_col`` values.

    Returns (group_cols..., n_min_hashes, distinct_est) where
    distinct_est is exact when the group has < k distinct keys and
    the KMV estimate (k-1)/u_k otherwise, rounded to 4dp.
    """
    h = portable_hash64(F.col(key_col))
    pairs = (
        df.select(*group_cols, h.alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.lit(1))
        .select(*group_cols, "h")
    )
    salted = pairs.withColumn("salt", F.pmod(F.col("h"), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*group_cols, "salt").orderBy(F.asc("h"))
    survivors = (
        salted.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= k)
        .drop("r", "salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(F.asc("h"))
    mink = (
        survivors.withColumn("r", F.row_number().over(w2))
        .filter(F.col("r") <= k)
    )
    # map the 60-bit hash uniformly into (0,1): u = h/2^60, clamped
    # one hash-ulp above zero for the measure-zero h = 0 row
    u_k = F.greatest(
        F.max(F.col("h")).cast("double") / F.lit(_TWO60),
        F.lit(2.0**-60),
    )
    return mink.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_min_hashes"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / u_k
            ),
            4,
        ).alias("distinct_est"),
    )


def kmv_distinct_sql(
    table: str,
    key_sql: str,
    group_cols: list[str],
    k: int = 8,
    salt_buckets: int = 16,
) -> str:
    """DuckDB oracle twin of :func:`kmv_distinct` (same arithmetic,
    same two-phase min-k)."""
    from flyscrape_spark.functions.hashing import portable_hash64_sql

    g = ", ".join(group_cols)
    h = portable_hash64_sql(key_sql)
    return f"""
WITH pairs AS (
  SELECT DISTINCT {g}, {h} AS h FROM {table}
),
phase1 AS (
  SELECT {g}, h,
         row_number() OVER (
           PARTITION BY {g}, h % {salt_buckets}
           ORDER BY h ASC) AS r
  FROM pairs
),
phase2 AS (
  SELECT {g}, h,
         row_number() OVER (PARTITION BY {g} ORDER BY h ASC) AS r
  FROM phase1 WHERE r <= {k}
)
SELECT {g},
       CAST(count(*) AS BIGINT) AS n_min_hashes,
       round(
         CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
              ELSE CAST({k - 1} AS DOUBLE) /
                   greatest(CAST(max(h) AS DOUBLE) / 1152921504606846976.0,
                            8.673617379884035e-19)
         END, 4) AS distinct_est
FROM phase2 WHERE r <= {k}
GROUP BY {g}
"""
