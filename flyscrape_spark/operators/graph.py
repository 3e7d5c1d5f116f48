"""Web-graph analytics over the crawl's link structure: degree
statistics and fixed-iteration PageRank — the standard frontier
prioritization signals (a large crawl orders its fetch queue by an
importance estimate; PageRank-family scores are the public canonical
choice, Page et al. 1999 / the OPIC line of work).

The reference has no graph stage (flyscrape's frontier is plain FIFO,
/root/reference/scrape.go:82-131); this module is engine-added for
the 10^10-URL design point, where per-host or per-page importance
decides which fraction of an effectively infinite frontier gets the
politeness-limited fetch budget.

Scale shapes:
- ``degrees``: two map-side-combinable groupBys + one full-outer
  equi-join on the node id — linear shuffles.
- ``pagerank``: the classic iterative join-agg loop. Per iteration:
  contributions = edges ⋈ ranks on src (shuffle on src), summed per
  dst (shuffle on dst), damped back onto the node list (shuffle on
  node — Catalyst folds this into the dst agg's partitioning when the
  keys align). Iteration count is FIXED (a hyperparameter, not a
  convergence loop), which keeps the whole computation expressible as
  a static DAG: no driver-side convergence collect, and the DuckDB
  oracle is the same loop unrolled in SQL.
  At cluster scale: persist the edge list partitioned by src once
  (it is reused every iteration) and localCheckpoint the rank vector
  every few iterations to truncate lineage — the rank DataFrame's
  plan doubles per iteration otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node (node, out_degree, in_degree) from an edge list.
    Nodes appearing only as source or only as target get 0 for the
    missing side."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    checkpoint_every: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank: returns (node, pr) after
    ``iterations`` synchronous updates from the uniform start 1/N.

    ``materialize=True`` (default) eagerly computes the O(nodes)
    result and releases the edge cache before returning — a driver
    sweep runs 60+ queries in one session and leaked edge blocks
    otherwise accumulate (round-2 advice). ``materialize=False``
    returns the lazy iteration plan (used by the plan audit); the
    caller then owns the edge-cache lifetime.

    pr'(v) = (1-d)/N + d * Σ_{u→v} pr(u)/out_degree(u); dangling
    nodes (out_degree 0) leak mass like the classic formulation —
    acceptable for a priority signal, and exactly mirrored by the
    SQL oracle.
    """
    n = nodes.count()
    out_d = edges.groupBy(F.col("src").alias(node_col)).agg(
        F.count("*").alias("out_degree")
    )
    # (src, dst, out_degree): resolved once, reused every iteration
    e = (
        edges.join(out_d.withColumnRenamed(node_col, "src"), "src")
        .persist()
    )
    try:
        e.count()  # noqa: B018 — materialize the reused edge cache
        ranks = nodes.select(F.col(node_col), F.lit(1.0 / n).alias("pr"))
        base = F.lit((1.0 - damping) / n)
        for it in range(iterations):
            contrib = (
                e.join(ranks.withColumnRenamed(node_col, "src"), "src")
                .groupBy(F.col("dst").alias(node_col))
                .agg(F.sum(F.col("pr") / F.col("out_degree")).alias("mass"))
            )
            ranks = nodes.select(node_col).join(contrib, node_col, "left").select(
                node_col,
                (base + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias("pr"),
            )
            if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
                ranks = ranks.localCheckpoint(eager=False)
        if not materialize:
            return ranks
        return ranks.localCheckpoint(eager=True)
    finally:
        if materialize:
            e.unpersist()


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    node_col: str = "node",
    checkpoint_every: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): returns
    (node, authority, hub) after ``iterations`` synchronous updates
    from the all-ones start, L1-normalized once at the end.

    auth_t(v) = Σ_{u→v} hub_{t-1}(u);  hub_t(u) = Σ_{u→v} auth_t(v).
    Because both updates are linear, per-iteration normalization only
    rescales by a global constant — so we run the loop unnormalized
    (growth is bounded by max_degree^iterations) and divide by the L1
    mass at the end. That removes the per-iteration single-row
    global-sum exchange; the one remaining scalar broadcast is the
    final normalizer (same documented shape as the tfidf corpus
    count). Per iteration: two shuffle joins on the edge endpoint +
    two map-side-combinable aggs — linear, no all-pairs anywhere.
    """
    e = edges.select("src", "dst").persist()
    try:
        e.count()  # noqa: B018 — materialize the reused edge cache
        scores = _hits_loop(e, nodes, iterations, node_col, checkpoint_every)
        if not materialize:
            return scores
        # eager O(nodes) materialization so the result no longer
        # references the (unpersisted) edge cache — see pagerank()
        return scores.localCheckpoint(eager=True)
    finally:
        if materialize:
            e.unpersist()


def _hits_loop(e, nodes, iterations, node_col, checkpoint_every):
    hub = nodes.select(F.col(node_col), F.lit(1.0).alias("hub"))
    auth = None
    for it in range(iterations):
        auth_mass = (
            e.join(hub.withColumnRenamed(node_col, "src"), "src")
            .groupBy(F.col("dst").alias(node_col))
            .agg(F.sum("hub").alias("mass"))
        )
        auth = nodes.select(node_col).join(auth_mass, node_col, "left").select(
            node_col, F.coalesce("mass", F.lit(0.0)).alias("auth")
        )
        hub_mass = (
            e.join(auth.withColumnRenamed(node_col, "dst"), "dst")
            .groupBy(F.col("src").alias(node_col))
            .agg(F.sum("auth").alias("mass"))
        )
        hub = nodes.select(node_col).join(hub_mass, node_col, "left").select(
            node_col, F.coalesce("mass", F.lit(0.0)).alias("hub")
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    scores = auth.join(hub, node_col)
    norms = scores.agg(
        F.sum("auth").alias("auth_norm"), F.sum("hub").alias("hub_norm")
    )
    return scores.crossJoin(F.broadcast(norms)).select(
        node_col,
        (F.col("auth") / F.col("auth_norm")).alias("authority"),
        (F.col("hub") / F.col("hub_norm")).alias("hub"),
    )

def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    checkpoint_every: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration TrustRank (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2004): personalized PageRank whose teleport mass lands ONLY
    on a hand-vetted trusted seed set, so trust attenuates with link
    distance from the seeds and spam hosts (reachable mostly from
    other spam) score near zero. The standard crawl-frontier
    demotion signal complementing pagerank()'s raw importance.

    t'(v) = (1-d)*s(v) + d * SUM_{u->v} t(u)/out_degree(u), where
    s(v) = 1/|S| for seed nodes and 0 otherwise; start vector = s.

    Scale shape: identical to pagerank() — per iteration one shuffle
    join on src plus one map-side-combinable agg on dst; the seed
    vector is a small static frame (seeds are hand-vetted, thousands
    at most) joined once and broadcast by AQE. Dangling nodes leak
    mass exactly like the classic formulation, mirrored by the SQL
    oracle.
    """
    n_seeds = seeds.count()
    out_d = edges.groupBy(F.col("src").alias(node_col)).agg(
        F.count("*").alias("out_degree")
    )
    e = (
        edges.join(out_d.withColumnRenamed(node_col, "src"), "src")
        .persist()
    )
    try:
        e.count()  # noqa: B018 — materialize the reused edge cache
        svec = nodes.join(seeds.select(node_col), node_col, "left_semi").select(
            node_col, F.lit(1.0 / n_seeds).alias("s")
        )
        base = nodes.select(node_col).join(svec, node_col, "left").select(
            node_col, F.coalesce("s", F.lit(0.0)).alias("s")
        ).localCheckpoint(eager=True)
        ranks = base.select(node_col, F.col("s").alias("tr"))
        for it in range(iterations):
            contrib = (
                e.join(ranks.withColumnRenamed(node_col, "src"), "src")
                .groupBy(F.col("dst").alias(node_col))
                .agg(F.sum(F.col("tr") / F.col("out_degree")).alias("mass"))
            )
            ranks = base.join(contrib, node_col, "left").select(
                node_col,
                (
                    F.lit(1.0 - damping) * F.col("s")
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("tr"),
            )
            if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
                ranks = ranks.localCheckpoint(eager=False)
        if not materialize:
            return ranks
        return ranks.localCheckpoint(eager=True)
    finally:
        if materialize:
            e.unpersist()


def lpa_communities(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    node_col: str = "node",
) -> DataFrame:
    """(node, community): synchronous label propagation (Raghavan et
    al. 2007) for a FIXED number of iterations — the cheap community
    detector for site/topic clustering over the link graph (async LPA
    with random tie-breaks is the published default; the synchronous
    min-tie-break variant here is the deterministic one a correctness
    gate can pin, same convention as the fixed-iteration PageRank).

    Update rule: each node adopts the most frequent label among its
    neighbors AND itself (edges treated as undirected), ties broken
    by SMALLEST label; isolated nodes keep their own label. Labels
    start as the node id. The self-vote is the standard stabilizer
    for the synchronous schedule — without it a bipartite pair swaps
    labels forever (the oscillation Raghavan et al. §3 note for
    synchronous updates; pinned by test).

    Scale shape: per iteration ONE groupBy(node, label) count (map-
    side combinable — the vote table is bounded by the edge count)
    followed by an argmax via max_by over a (count, -label) struct —
    no window, no sort, shuffles linear in |E|. The undirected edge
    frame is persisted once and released after the loop (same cache
    discipline as pagerank, round-2 advice).
    """
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .persist()
    )
    try:
        und.count()  # noqa: B018 — materialize the reused edge cache
        labels = nodes.select(F.col(node_col), F.col(node_col).alias("label"))
        for _ in range(iterations):
            nbr = und.join(
                labels.withColumnRenamed(node_col, "b"), "b"
            ).select(F.col("a").alias(node_col), "label")
            votes = (
                nbr.unionAll(labels.select(node_col, "label"))
                .groupBy(node_col, "label")
                .agg(F.count("*").alias("n_votes"))
            )
            # min_by over (-votes, label): most votes first, then the
            # SMALLEST label — struct comparison is lexicographic, so
            # this tie-break works for ANY orderable label type (string
            # URL/host ids included; negating a string label would
            # yield NULL and degrade to an arbitrary pick).
            winner = votes.groupBy(node_col).agg(
                F.min_by(
                    "label",
                    F.struct(
                        (-F.col("n_votes")).alias("nv"), F.col("label").alias("lb")
                    ),
                ).alias("new_label")
            )
            labels = (
                nodes.select(node_col)
                .join(labels, node_col)
                .join(winner, node_col, "left")
                .select(
                    node_col,
                    F.coalesce("new_label", "label").alias("label"),
                )
            )
        return labels.select(node_col, F.col("label").alias("community"))
    finally:
        und.unpersist()


def reciprocal_links(
    edges: DataFrame,
    min_out: int = 3,
    spam_threshold: float = 0.5,
) -> DataFrame:
    """Host-level link reciprocity: for every host, the fraction of
    its distinct outlink hosts that link straight back — the classic
    link-farm / link-exchange signal (reciprocal rings trade links to
    inflate PageRank; organic link graphs are strongly asymmetric).

    Input: (src, dst) host-level edges. Output: (host, n_out,
    n_reciprocal, reciprocity, link_farm) where link_farm flags hosts
    with >= ``min_out`` outlink hosts and reciprocity >=
    ``spam_threshold``.

    Engine-added (the reference has no cross-site analysis); feeds
    the same demotion pipeline as trustrank/domain_reputation.

    Scale shape: one distinct on the host pair (map-side combinable),
    then the reciprocity test is a self-join on the REVERSED pair key
    — both sides hash-partition on the same (a,b) composite, so it is
    one symmetric shuffle, never a cross join; the per-host rollup is
    a combinable count. Self-loops are dropped (trivially
    reciprocal).
    """
    pairs = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    rev = pairs.select(F.col("b").alias("a"), F.col("a").alias("b")).withColumn(
        "_rev", F.lit(True)
    )
    marked = pairs.join(rev, ["a", "b"], "left")
    return (
        marked.groupBy(F.col("a").alias("host"))
        .agg(
            F.count("*").alias("n_out"),
            F.count("_rev").alias("n_reciprocal"),
        )
        .withColumn(
            "reciprocity",
            F.round(F.col("n_reciprocal").cast("double") / F.col("n_out"), 6),
        )
        .withColumn(
            "link_farm",
            (F.col("n_out") >= min_out)
            & (F.col("reciprocity") >= spam_threshold),
        )
    )


def hostgraph_export(
    page_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Collapse the page-level link graph to the host-level webgraph
    — the artifact Common Crawl publishes as its host/domain graph
    and the input every host-rank (trustrank, reciprocal_links,
    lpa_communities here) actually consumes.

    Input: (src, dst) page URLs. Output: (src_host, dst_host,
    n_links, n_src_pages) — total link occurrences and distinct
    linking pages per host pair; self-edges (intra-host links) are
    kept, consumers filter them (they carry the site's internal-
    navigation density).

    Scale shape: host projection is pure expression work; the rollup
    is a two-level combinable aggregate ((pair, src) then pair) so a
    hot host pair ships one row per distinct source page per task,
    never one per link occurrence.
    """
    from flyscrape_spark.functions.urls import host_of

    e = page_edges.select(
        host_of(F.col(src_col)).alias("src_host"),
        host_of(F.col(dst_col)).alias("dst_host"),
        F.col(src_col).alias("_src"),
    )
    per_page = e.groupBy("src_host", "dst_host", "_src").agg(
        F.count("*").alias("_n")
    )
    return per_page.groupBy("src_host", "dst_host").agg(
        F.sum("_n").alias("n_links"),
        F.count("*").alias("n_src_pages"),
    )


def host_triangles(edges: DataFrame) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the UNDIRECTED host graph — the cohesion signal that separates
    organic communities (high clustering) from spam constellations
    (star-shaped, near-zero clustering) and random link noise.

    Input: (src, dst) edges, direction ignored. Output: (host,
    degree, triangles, clustering_coeff) with coeff = 2T / (d(d-1))
    (0 when d < 2).

    Scale shape (the standard distributed triangle enumeration):
    canonicalize each undirected edge to (a < b) and dedup (one
    combinable distinct); enumerate wedges by self-joining on the
    shared endpoint with b < c (each triangle produced exactly once
    as a < b < c); close the wedge with one more equi-join on the
    (a, c) edge key. Every join is a hash equi-join on edge keys —
    no cross product — and the final per-node rollup is combinable.
    The a < b < c ordering is also the degree-skew guard: a hub's
    wedge fan-out is bounded by its HIGHER-ordered neighbors only.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # wedges a-b, a-c with b < c; close with edge (b, c)
    e2 = und.select(F.col("a").alias("wa"), F.col("b").alias("c"))
    wedges = und.join(e2, und["a"] == e2["wa"]).filter(F.col("b") < F.col("c"))
    closing = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .unionByName(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count("*").alias("degree"))
    )
    out = deg.join(per_node, "host", "left").na.fill({"triangles": 0})
    d = F.col("degree").cast("double")
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(2.0 * F.col("triangles").cast("double") / (d * (d - 1.0)), 6),
    ).otherwise(F.lit(0.0))
    return out.select("host", "degree", "triangles",
                      coeff.alias("clustering_coeff"))
