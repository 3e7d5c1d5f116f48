"""Batch redirect-chain resolution: map every URL to its final
destination through a table of (src_url -> dst_url) redirects.

Reference semantics: flyscrape fetches with Go's ``http.Client``
(/root/reference/scrape.go fetch path), which transparently follows
up to 10 redirects and errors with "stopped after 10 redirects"
beyond that (net/http ``defaultCheckRedirect``). A distributed crawl
cannot afford to discover chains one hop per fetch inside a worker —
it resolves the redirect *map* it has already observed as a batch
operator, so the frontier enqueues final URLs and the seen set stays
canonical. This module is that operator.

Scale shape — pointer doubling, not per-hop iteration:
a chain of length L resolved hop-by-hop costs L shuffles over the
full URL set. Instead we iterate ``f = f o f`` on the redirect
function: after k self-joins every chain up to 2^k hops is fully
collapsed, so a 10-hop cap needs ceil(log2(10)) = 4 equi-joins
total, each over only the redirect rows (a small fraction of the
URL universe) — the classic path-doubling used in parallel
list-ranking and connected components (Shiloach-Vishkin lineage).
Loops and over-limit chains terminate deterministically: any URL
whose walk has not reached a non-redirect within ``max_hops`` hops
is flagged unresolved, exactly like net/http's 10-redirect stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Go net/http defaultCheckRedirect stops after 10 redirects.
MAX_HOPS = 10


def resolve_redirects(
    urls: DataFrame,
    redirects: DataFrame,
    max_hops: int = MAX_HOPS,
    url_col: str = "url",
) -> DataFrame:
    """Resolve each row of ``urls`` through ``redirects`` (columns
    ``src``, ``dst``) to (url, final_url, hops, resolved).

    - non-redirecting URLs: final_url = url, hops = 0, resolved true
    - chains ending within ``max_hops``: exact hop count to the first
      non-redirect target
    - loops / longer chains: resolved false, final_url NULL, hops =
      ``max_hops`` (mirroring net/http "stopped after N redirects").

    Pointer doubling preserves exact termination distances: after
    iteration k each mapping row (src, cur, hops) satisfies
    cur = f^min(t, 2^k)(src) and hops = min(t, 2^k), where t is the
    true termination hop count — so once 2^k >= max_hops, every
    chain with t <= max_hops carries its exact t, and everything
    else is provably over the cap.
    """
    m = (
        redirects.select(F.col("src"), F.col("dst").alias("cur"))
        .withColumn("hops", F.lit(1))
    )
    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    # resolved iff the walk terminated (cur is not itself a redirect
    # source) within the hop cap
    srcs = redirects.select(F.col("src").alias("cur")).distinct()
    terminated = m.join(srcs, "cur", "left_anti")
    resolved_map = (
        terminated.withColumn("resolved", F.col("hops") <= max_hops)
        .unionByName(
            m.join(srcs, "cur", "left_semi").withColumn("resolved", F.lit(False))
        )
        .select(
            F.col("src").alias(url_col),
            F.when(F.col("resolved"), F.col("cur")).alias("final_url"),
            F.when(F.col("resolved"), F.col("hops"))
            .otherwise(F.lit(max_hops)).alias("hops"),
            "resolved",
        )
    )
    return (
        urls.join(resolved_map, url_col, "left")
        .select(
            url_col,
            F.when(F.col("resolved").isNotNull() & ~F.col("resolved"), F.lit(None))
            .otherwise(F.coalesce("final_url", F.col(url_col)))
            .alias("final_url"),
            F.coalesce("hops", F.lit(0)).cast("int").alias("hops"),
            F.coalesce("resolved", F.lit(True)).alias("resolved"),
        )
    )
