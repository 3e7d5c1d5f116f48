"""Connected-components clustering (large-star/small-star) pinned
against a driver-side union-find oracle on adversarial graph shapes:
chains (worst case for naive propagation), stars, cliques, multiple
components, singletons, and hash-derived pseudo-random graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.cluster import connected_components, dedup_clusters


def union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node: one more pass so every root is minimal
    return {v: find(v) for v in n_nodes}


def run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


GRAPHS = {
    "chain": [(i, i + 1) for i in range(20)],
    "reversed_chain": [(i + 1, i) for i in range(20)],
    "star": [(0, i) for i in range(1, 15)],
    "inverted_star": [(i, 0) for i in range(1, 15)],
    "clique": [(a, b) for a in range(8) for b in range(8) if a < b],
    "two_components": [(0, 1), (1, 2), (10, 11), (12, 11)],
    "self_loops_and_dups": [(3, 3), (4, 5), (5, 4), (4, 5)],
    "pseudo_random": [
        ((37 * i) % 50, (53 * i + 11) % 50) for i in range(60)
    ],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_connected_components_matches_union_find(spark, name):
    edges = GRAPHS[name]
    nodes = sorted({v for e in edges for v in e if e[0] != e[1]})
    expected = union_find(nodes, [e for e in edges if e[0] != e[1]])
    got = run_cc(spark, edges)
    assert got == expected


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9
    }
    assert rows[0]["cluster_size"] == 3 and rows[5]["cluster_size"] == 2
    assert rows[3]["cluster_size"] == 1


def test_cc_converges_in_log_rounds_on_long_chain(spark):
    """A 200-node chain: naive min propagation needs ~200 rounds;
    large-star/small-star must converge well under max_rounds=30."""
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, max_rounds=30)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}
    assert out.count() == 201


def test_cc_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    plan = connected_components(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
