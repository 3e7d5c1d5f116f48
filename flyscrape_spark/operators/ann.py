"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: one broadcast of the
  query vector, dot/norms via F.aggregate/zip_with (JVM-side, no
  Python), global top-k via orderBy+limit. At cluster scale Spark
  runs this as per-partition top-k + a single-reduce merge (TakeOrdered),
  so no full sort materializes.

- :func:`srp_buckets` / :func:`srp_topk` — signed-random-projection
  LSH: K pseudo-random ±1 hyperplanes derived from a portable hash of
  (plane, dim) so the DuckDB oracle can rebuild them; bucket = K sign
  bits. Candidate search touches only the query's bucket — the scale
  path (a groupBy/bucket-pruned scan instead of a full corpus sweep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    # cast BEFORE multiplying: float*float would round in fp32 and
    # diverge from the double-precision DuckDB oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_scores(embeddings: DataFrame, query_vec: list[float],
                  vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    return embeddings.withColumn(
        "cosine",
        F.round(_dot(v, q) / (_norm(v) * _norm(q)), 4),
    )


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    return (
        cosine_scores(embeddings, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))  # deterministic ties
        .limit(k)
    )


def srp_plane_sign(plane: int, dim: int):
    """±1 entry of pseudo-random hyperplane ``plane`` at dimension
    ``dim`` — parity of a portable hash, reproducible in SQL."""
    from flyscrape_spark.functions.hashing import portable_hash64

    h = portable_hash64(F.concat_ws(":", F.lit(plane), F.lit(dim)))
    return F.when(F.pmod(h, F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _plane_signs(plane: int, dims: int) -> list[float]:
    """Driver-side precompute of one hyperplane's ±1 entries. Same
    value as :func:`srp_plane_sign` (md5-prefix parity) — hashlib.md5
    == Spark md5 == DuckDB md5 — but computed ONCE instead of per
    row x dim x plane (the per-row md5 was ~90% of bucketing cost)."""
    import hashlib

    signs = []
    for i in range(dims):
        h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:15], 16)
        signs.append(1.0 if h % 2 == 0 else -1.0)
    return signs


def _dims_of(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).head()
    return int(row["d"]) if row else 0


def _proj(v, signs: list[float]):
    """v · plane as a left fold over zip_with with a LITERAL ±1 array
    — identical summation order (and hence identical sign bits) to
    the oracle's per-element SQL, but zero per-row hashing."""
    lit_signs = F.array(*[F.lit(s) for s in signs])
    return F.aggregate(
        F.zip_with(v, lit_signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_buckets(embeddings: DataFrame, num_planes: int = 8,
                vec_col: str = "embedding", id_col: str = "vec_id",
                dims: int | None = None) -> DataFrame:
    """LSH bucket id per vector: bit p = sign(v · plane_p)."""
    v = F.col(vec_col)
    dims = dims if dims is not None else _dims_of(embeddings, vec_col)
    bits = []
    for p in range(num_planes):
        proj = _proj(v, _plane_signs(p, dims))
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.select(id_col, vec_col).withColumn("bucket", bucket.cast("bigint"))


def srp_banded_buckets(
    embeddings: DataFrame, planes_per_band: int = 8, bands: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(id, band, bucket) rows: plane p of band b is global plane
    b*planes_per_band + p, so one plane family serves all bands.
    Banding trades precision for recall exactly like MinHash banding:
    near-dup candidates need agree on only ONE band's full sign
    vector, not all planes."""
    v = F.col(vec_col)
    dims = _dims_of(embeddings, vec_col)

    band_structs = []
    for b in range(bands):
        bucket = None
        for r in range(planes_per_band):
            signs = _plane_signs(b * planes_per_band + r, dims)
            bit = F.when(_proj(v, signs) > 0, F.lit(1 << r)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bucket.cast("bigint").alias("bucket"))
        )
    return embeddings.select(
        id_col, F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def embedding_near_dup(
    embeddings: DataFrame, threshold: float = 0.15,
    planes_per_band: int = 8, bands: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, the training-data dedup
    scale path: banded-SRP LSH candidates (linear shuffle on (band,
    bucket) — never an O(n^2) cross join), then EXACT cosine on the
    candidate set. Deterministic: the bucketing planes are hash-derived
    (srp_plane_sign), so the DuckDB oracle rebuilds identical buckets
    and identical pairs."""
    # pin before the self-join: both sides would otherwise recompute
    # all plane projections
    banded = srp_banded_buckets(
        embeddings, planes_per_band, bands, vec_col, id_col
    ).localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("vec_a"), F.col(f"b.{id_col}").alias("vec_b"))
        .distinct()
    )
    ea = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a"))
    eb = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b"))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select(
            "vec_a", "vec_b",
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF coarse quantization: (vec_id, cent_id) inverted-file
    assignment of every vector to its nearest centroid by cosine.

    Centroids are the first ``n_centroids`` corpus vectors — a
    deterministic sampling quantizer (stands in for k-means training;
    the partitioning/plumbing is identical) that the DuckDB oracle can
    rebuild. Shape: broadcast the C centroids, score N×C JVM-side,
    argmax via max_by with map-side partial aggregation — the shuffle
    carries N rows (post-combine), not N×C. At cluster scale the
    assignment column becomes the table's partition key, so a probe
    scans only nprobe/C of the corpus."""
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = (
        embeddings.select(id_col, vec_col)
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cent_cos",
            F.round(
                _dot(F.col(vec_col), F.col("cent_vec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("cent_vec"))),
                6,
            ),
        )
    )
    # highest cosine, smallest cent_id on ties — max over the ordered
    # struct is partial-agg combinable (no window shuffle of N×C rows)
    return scored.groupBy(id_col).agg(
        F.max_by(
            "cent_id", F.struct(F.col("cent_cos"), (-F.col("cent_id")).alias("nid"))
        ).alias("cent_id")
    )


def ivf_topk(embeddings: DataFrame, query: DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF ANN top-k: rank centroids against the query, scan only the
    ``nprobe`` nearest centroids' inverted lists, exact cosine + top-k
    within them. ``query`` is a one-row DataFrame with column ``qv``.

    The scale path beyond SRP buckets: recall is tunable via nprobe
    (probing all C centroids degrades gracefully to exact brute
    force), and the candidate scan is an equi-join on cent_id —
    partition-prunable when the corpus is stored partitioned by its
    IVF assignment."""
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
    )
    probe = (
        cents.crossJoin(F.broadcast(query))
        .select(
            "cent_id",
            F.round(
                _dot(F.col("cent_vec"), F.col("qv"))
                / (_norm(F.col("cent_vec")) * _norm(F.col("qv"))),
                6,
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("cent_id"))
        .limit(nprobe)
        .select("cent_id")
    )
    assign = ivf_assign(embeddings, n_centroids, vec_col, id_col)
    cand_ids = assign.join(F.broadcast(probe), "cent_id").select(id_col)
    return (
        embeddings.join(cand_ids, id_col)
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(
                _dot(F.col(vec_col), F.col("qv"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qv"))),
                4,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def srp_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             num_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """ANN top-k restricted to the query's SRP bucket (scale path:
    bucket is a partition-prunable key in the stored table)."""
    bucketed = srp_buckets(embeddings, num_planes, vec_col, id_col)
    qdf = bucketed.sparkSession.createDataFrame(
        [(list(map(float, query_vec)),)], f"{vec_col}: array<float>"
    )
    qbucket = srp_buckets(qdf, num_planes, vec_col, id_col=vec_col).select("bucket")
    candidates = bucketed.join(F.broadcast(qbucket), "bucket")
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)
