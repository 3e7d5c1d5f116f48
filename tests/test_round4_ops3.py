"""Round-4 batch-4 operators: host-level webgraph export, triangle
counting / clustering coefficient, crawl-fairness Gini."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------- hostgraph_export

def test_hostgraph_export_counts(spark):
    from flyscrape_spark.operators.graph import hostgraph_export

    edges = spark.createDataFrame(
        [("http://a/1", "http://b/x"), ("http://a/1", "http://b/y"),
         ("http://a/2", "http://b/x"), ("http://a/1", "http://a/2")],
        "src string, dst string",
    )
    out = {(r["src_host"], r["dst_host"]): r
           for r in hostgraph_export(edges).collect()}
    ab = out[("a", "b")]
    assert ab["n_links"] == 3 and ab["n_src_pages"] == 2
    # intra-host edge kept as a self-pair
    assert out[("a", "a")]["n_links"] == 1


# ------------------------------------------------------ host_triangles

def test_host_triangles_single_triangle(spark):
    from flyscrape_spark.operators.graph import host_triangles

    # triangle a-b-c plus pendant d; direction and duplicates ignored
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    out = {r["host"]: r for r in host_triangles(edges).collect()}
    assert out["a"]["triangles"] == 1 and out["a"]["degree"] == 2
    assert out["a"]["clustering_coeff"] == 1.0
    # c has degree 3 (a, b, d) and one triangle: 2*1/(3*2) = 0.333333
    assert out["c"]["degree"] == 3
    assert out["c"]["clustering_coeff"] == 0.333333
    # pendant d: degree 1 -> coeff defined as 0
    assert out["d"]["triangles"] == 0 and out["d"]["clustering_coeff"] == 0.0


def test_host_triangles_fixture_ring(spark):
    """Ring-with-chords: interior hosts sit in 3 triangles
    (k-2,k-1,k), (k-1,k,k+1), (k,k+1,k+2) with degree 4."""
    from flyscrape_spark.queries import q_host_triangles

    rows = {r["host"]: r for r in q_host_triangles(spark, SF).collect()}
    full = [r for r in rows.values() if r["degree"] == 4]
    assert full, "fixture should produce degree-4 hosts"
    assert any(r["triangles"] == 3 for r in full)
    for r in full:
        assert r["clustering_coeff"] == round(
            2.0 * r["triangles"] / 12.0, 6)


# ---------------------------------------------------------- fetch_gini

def test_fetch_gini_uniform_is_zero(spark):
    from flyscrape_spark.operators.politeness import fetch_gini

    log = spark.createDataFrame(
        [(h,) for h in "abcd" for _ in range(10)], "host string")
    out = fetch_gini(log).collect()[0]
    assert out["n_hosts"] == 4 and out["total_fetches"] == 40
    assert out["gini"] == 0.0


def test_fetch_gini_skew(spark):
    from flyscrape_spark.operators.politeness import fetch_gini

    # x = [1, 1, 1, 97]: gini = sum((2i-n-1)x_i)/(n*sum x)
    # = (-3*1 + -1*1 + 1*1 + 3*97) / (4*100) = 288/400 = 0.72
    rows = [("a",)] * 1 + [("b",)] * 1 + [("c",)] * 1 + [("d",)] * 97
    out = fetch_gini(spark.createDataFrame(rows, "host string")).collect()[0]
    assert out["gini"] == 0.72
