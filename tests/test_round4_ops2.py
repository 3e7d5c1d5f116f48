"""Round-4 batch-3 operators: per-host template lines, WARC revisit
records, latency-adaptive politeness, title clusters, frontier
backlog."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ----------------------------------------------- host_template_lines

def test_host_template_lines_scope_is_per_host(spark):
    from flyscrape_spark.operators.segments import host_template_lines

    rows = []
    for d in range(6):
        rows.append(("a", d, f"unique body {d}\nshared footer"))
    # the same footer on host b appears in only 2 docs -> under gate
    rows += [("b", 10, "x\nshared footer"), ("b", 11, "y\nshared footer")]
    pages = spark.createDataFrame(rows, "host string, doc_id long, text string")
    out = host_template_lines(pages, min_docs=5).collect()
    assert len(out) == 1
    assert (out[0]["host"], out[0]["line"], out[0]["n_docs"]) == (
        "a", "shared footer", 6)


def test_host_template_lines_within_doc_repeats_count_once(spark):
    from flyscrape_spark.operators.segments import host_template_lines

    # the line repeats 3x inside each of 5 docs: df must be 5, not 15
    pages = spark.createDataFrame(
        [("a", d, "nav\nnav\nnav") for d in range(5)],
        "host string, doc_id long, text string",
    )
    out = host_template_lines(pages, min_docs=5).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 5


# --------------------------------------------------- revisit_records

def test_revisit_records_first_capture_wins(spark):
    from flyscrape_spark.sources.warc import revisit_records

    pages = spark.createDataFrame(
        [("u1", 5, 100), ("u2", 7, 100), ("u3", 6, 100), ("v", 1, 200)],
        "url string, ts long, digest long",
    )
    out = {r["url"]: r for r in revisit_records(pages).collect()}
    assert out["u1"]["record_type"] == "response"
    assert out["u1"]["refers_to"] is None
    assert out["u2"]["record_type"] == "revisit"
    assert out["u2"]["refers_to"] == "u1"
    assert out["u3"]["refers_to"] == "u1"
    assert out["v"]["record_type"] == "response"


def test_revisit_fixture_ratio(spark):
    """Groups of 3 share a digest -> about 2/3 of captures revisit."""
    from flyscrape_spark.queries import q_warc_revisit

    rows = q_warc_revisit(spark, SF).collect()
    revisits = [r for r in rows if r["record_type"] == "revisit"]
    responses = [r for r in rows if r["record_type"] == "response"]
    assert len(responses) >= 1 and len(revisits) >= len(responses)
    by_url = {r["url"]: r for r in rows}
    for r in revisits:
        assert by_url[r["refers_to"]]["record_type"] == "response"
        assert by_url[r["refers_to"]]["digest"] == r["digest"]


# ----------------------------------------------------- adaptive_delay

def test_adaptive_delay_throttles_slow_hosts(spark):
    from flyscrape_spark.operators.politeness import adaptive_delay

    log = spark.createDataFrame(
        [("fast", 100.0)] * 20 + [("slow", 2000.0)] * 20,
        "host string, latency_ms double",
    )
    out = {r["host"]: r for r in adaptive_delay(log).collect()}
    # fast: 3 * 0.1s = 0.3 < base 1.0 -> stays at base, not throttled
    assert out["fast"]["adjusted_delay_s"] == 1.0
    assert not out["fast"]["throttled"]
    # slow: 3 * 2.0s = 6.0 -> throttled up
    assert out["slow"]["adjusted_delay_s"] == 6.0
    assert out["slow"]["throttled"]


def test_adaptive_delay_exact_p95_interpolation(spark):
    from flyscrape_spark.operators.politeness import adaptive_delay

    # 0..10: p95 = 9.5 (linear interpolation over rank p*(n-1))
    log = spark.createDataFrame(
        [("h", float(v)) for v in range(11)], "host string, latency_ms double"
    )
    out = adaptive_delay(log).collect()[0]
    assert out["p95_ms"] == 9.5


# ------------------------------------------------------ title_clusters

def test_title_clusters_normalization(spark):
    from flyscrape_spark.operators.dedup import title_clusters

    pages = spark.createDataFrame(
        [("http://a/1", "Hello  World"), ("http://b/2", "  hello world "),
         ("http://a/3", "HELLO\tWORLD"), ("http://c/4", "other title")],
        "url string, title string",
    )
    out = title_clusters(pages).collect()
    assert len(out) == 1  # singleton 'other title' filtered by min_pages
    row = out[0]
    assert row["n_pages"] == 3 and row["n_hosts"] == 2  # hosts a, b
    assert row["example_url"] == "http://a/1"


# --------------------------------------------------- frontier_backlog

def test_frontier_backlog_drain_and_starvation(spark):
    from flyscrape_spark.operators.politeness import frontier_backlog

    frontier = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 3,
        "host string",
    )
    rates = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "host string, rate_per_s double"
    )
    out = {r["host"]: r for r in
           frontier_backlog(frontier, rates, horizon_s=60.0).collect()}
    assert out["a"]["drain_s"] == 100.0 and out["a"]["starved"]
    assert out["b"]["drain_s"] == 5.0 and not out["b"]["starved"]
    # no rate row -> unbudgeted -> starved with NULL drain
    assert out["c"]["rate_per_s"] is None
    assert out["c"]["drain_s"] is None and out["c"]["starved"]
