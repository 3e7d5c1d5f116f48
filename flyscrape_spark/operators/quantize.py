"""Embedding quantization for ANN at corpus scale: int8 scalar
quantization with global per-dimension ranges — 4x less memory and
shuffle/network per vector than fp32, the standard first step before
any billion-vector index (public practice across FAISS-style
systems: scalar/product quantization, Jegou et al. 2011).

Engine-added (the reference has no vector stage); complements
operators/ann.py — the SRP/IVF candidate generators can carry codes
instead of raw vectors and rerank the small candidate set at full
precision.

Scale shape:
- pass 1 (stats): posexplode -> groupBy(dim) min/max — map-side
  combinable, D output rows (D = embedding width, always tiny);
- pass 2 (encode): stats broadcast back (D rows), per-row array
  transform — no shuffle.
Both passes are integer/min-max exact, and the code assignment uses
floor(u + 0.5) instead of round() so the DuckDB oracle matches
bit-for-bit (round() half-away/half-even conventions differ across
engines; floor does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dim_stats(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(dim, lo, hi) per embedding dimension, in double precision."""
    return (
        embeddings.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.min(F.col("v").cast("double")).alias("lo"),
            F.max(F.col("v").cast("double")).alias("hi"),
        )
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """(id, codes, mse): per-dim affine int8 codes
    code_d = floor((x_d - lo_d) / scale_d + 0.5), scale_d =
    (hi_d - lo_d) / levels (constant dims encode to 0), plus the
    per-vector reconstruction mean-squared error at 6dp — the
    quality gauge that decides whether a dimension needs PQ instead.
    """
    stats = dim_stats(embeddings, vec_col).select(
        F.array_sort(
            F.collect_list(F.struct("dim", "lo", "hi"))
        ).alias("stats")
    )
    dims = F.col("stats")

    x = embeddings.crossJoin(F.broadcast(stats))
    lo = lambda i: F.element_at(dims, i + 1)["lo"]  # noqa: E731
    hi = lambda i: F.element_at(dims, i + 1)["hi"]  # noqa: E731

    def code(v, i):
        scale = (hi(i) - lo(i)) / F.lit(float(levels))
        return F.when(scale == 0.0, F.lit(0)).otherwise(
            F.floor((v.cast("double") - lo(i)) / scale + F.lit(0.5)).cast("int")
        )

    def recon(v, i):
        scale = (hi(i) - lo(i)) / F.lit(float(levels))
        err = v.cast("double") - (lo(i) + code(v, i).cast("double") * scale)
        return err * err

    idx = F.transform(F.col(vec_col), lambda v, i: i)
    codes = F.zip_with(F.col(vec_col), idx, code)
    sqerr = F.zip_with(F.col(vec_col), idx, recon)
    mse = F.aggregate(sqerr, F.lit(0.0), lambda a, v: a + v) / F.size(vec_col)
    return x.select(
        id_col,
        codes.alias("codes"),
        F.round(mse, 6).alias("mse"),
    )
