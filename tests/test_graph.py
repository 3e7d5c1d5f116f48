"""Web-graph analytics (operators/graph.py): degree stats and
fixed-iteration PageRank against hand-computed values."""

import pytest

from flyscrape_spark.operators.graph import degrees, pagerank


@pytest.fixture
def star(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2, 3 isolated (node list includes it)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    return nodes, edges


def test_degrees(star):
    _, edges = star
    out = {r["node"]: r for r in degrees(edges).collect()}
    assert out[0]["out_degree"] == 2 and out[0]["in_degree"] == 0
    assert out[1]["out_degree"] == 1 and out[1]["in_degree"] == 1
    assert out[2]["out_degree"] == 0 and out[2]["in_degree"] == 2
    assert 3 not in out  # isolated nodes don't appear in the edge list


def test_pagerank_one_iteration_by_hand(star):
    nodes, edges = star
    pr = {r["node"]: r["pr"] for r in
          pagerank(nodes, edges, iterations=1, damping=0.85).collect()}
    n, d = 4, 0.85
    base = (1.0 - d) / n
    # start 1/4 each; node2 gets 1/4 / 2 (from 0) + 1/4 / 1 (from 1)
    assert pr[2] == pytest.approx(base + d * (0.25 / 2 + 0.25 / 1), abs=1e-12)
    assert pr[1] == pytest.approx(base + d * (0.25 / 2), abs=1e-12)
    # dangling mass leaks: 0 and the isolated 3 get only the base
    assert pr[0] == pytest.approx(base, abs=1e-12)
    assert pr[3] == pytest.approx(base, abs=1e-12)


def test_pagerank_mass_decreases_with_dangling(star):
    nodes, edges = star
    pr = pagerank(nodes, edges, iterations=3, damping=0.85)
    total = sum(r["pr"] for r in pr.collect())
    assert total <= 1.0 + 1e-9  # dangling leak, never mass creation
    assert pr.count() == 4  # every node keeps a score


def test_pagerank_cycle_uniform(spark):
    # pure cycle: uniform distribution is the fixed point
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    pr = {r["node"]: r["pr"] for r in
          pagerank(nodes, edges, iterations=5).collect()}
    for v in pr.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)
