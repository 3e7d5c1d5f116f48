"""Connected-components clustering over near-duplicate pair edges —
the step that turns pairwise dedup output (LSH / SimHash / Jaccard
pairs) into document CLUSTERS so a training pipeline can keep one
representative per cluster.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public).
Each round is pure DataFrame ops (one window-min + a union per star,
node-hash-partitioned shuffles, map-side combinable), and the edge set
converges to star graphs rooted at each component's minimum node in
O(log^2 n) rounds — unlike naive min-label propagation, which needs
O(diameter) rounds and dies on chain-shaped components at web scale.

Why this matters at 100 TB: near-dup graphs over 10^10 documents have
billions of edges; every round here shuffles only the CURRENT edge
set on node id (skew-safe: large-star explicitly breaks high-degree
stars by re-rooting neighbors at the minimum), with no collect of
nodes or edges to the driver — only a 3-scalar convergence checksum
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: for every node u, connect each strictly-larger
    neighbor v > u to m = min(neighbors(u) + {u})."""
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    w = Window.partitionBy("a")
    m = F.least(F.min("b").over(w), F.col("a"))
    return (
        und.withColumn("m", m)
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge toward the larger endpoint, then
    for each node u connect u and all its smaller neighbors to
    m = min(smaller-neighbors(u) + {u})."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    w = Window.partitionBy("a")
    m = F.min("b").over(w)  # all b < a here, so min includes the root
    star = oriented.withColumn("m", m)
    return (
        star.select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(star.select("a", "m"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = the minimum node id of its connected component.

    Convergence check per round: (count, sum(a), sum(b),
    bit_xor(xxhash64(a,b))) of the edge set — four scalars to the
    driver (the hash term makes a coincidental collision between
    distinct edge sets practically impossible; xor is order-free and
    cannot overflow under ANSI mode); the edge data itself never
    leaves the cluster. Each round's edge set is localCheckpoint-ed
    (an Iceberg temp table on a real cluster) to truncate the
    iterative lineage.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count("*").alias("n"), F.sum("a").alias("sa"), F.sum("b").alias("sb"),
            F.bit_xor(F.xxhash64("a", "b")).alias("sh"),
        ).collect()[0]
        return (row["n"], row["sa"], row["sb"], row["sh"])

    sig = signature(edges)
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # converged: every edge points node -> component root (min id).
    # A node's label is the min over its incident edges' min endpoint;
    # roots themselves label as self.
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nbr_min"))
        .select(
            "node", F.least(F.col("node"), F.col("nbr_min")).alias("component")
        )
    )


def dedup_clusters(
    documents: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every document a cluster id: the component minimum for
    docs in near-dup pairs, else the doc itself (singleton cluster).
    Output (doc_id, cluster_id, cluster_size) — the keep-one-per-
    cluster table a dedup pipeline joins against."""
    comp = connected_components(pairs)
    labeled = (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def canonical_pick(
    labeled: DataFrame,
    quality_col: str = "n_chars",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Which duplicate to KEEP: for every near-dup cluster
    (:func:`dedup_clusters` labels), elect the canonical document —
    highest ``quality_col`` (longest-copy-wins is the standard rule:
    truncated/paywalled copies lose to the full text), doc id as the
    deterministic tie-break — and report what the dedup pass
    discards.

    Output: (cluster_id, keeper_doc_id, cluster_size, n_discarded,
    keeper_quality). The keeper list anti-joins the corpus to
    materialize the deduped view; the discard count is the dedup-QA
    headline number.

    Scale shape: ONE combinable groupBy(cluster_id) — min-struct of
    (-quality, doc) elects the keeper map-side; no windows, no
    self-join.
    """
    pick = F.min(
        F.struct(
            (-F.col(quality_col).cast("long")).alias("_negq"),
            F.col(doc_col).alias("_doc"),
        )
    )
    return labeled.groupBy("cluster_id").agg(
        pick.alias("_p"),
        F.count("*").alias("cluster_size"),
    ).select(
        "cluster_id",
        F.col("_p._doc").alias("keeper_doc_id"),
        "cluster_size",
        (F.col("cluster_size") - 1).alias("n_discarded"),
        (-F.col("_p._negq")).alias("keeper_quality"),
    )
