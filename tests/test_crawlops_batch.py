"""Crawl-ops batch: ETag stability audit, robots-policy churn,
water-filling budget allocation."""

from __future__ import annotations

from pyspark.sql import functions as F

from flyscrape_spark.operators.budget import waterfill
from flyscrape_spark.operators.recrawl import etag_stability
from flyscrape_spark.operators.robots import robots_churn


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, etag string"
    )


def test_etag_stability_classes(spark):
    rows = (
        # stable: same etag twice
        [("u1", "h", '"a"'), ("u1", "h", '"a"')]
        # rotating: two distinct etags
        + [("u2", "h", '"b1"'), ("u2", "h", '"b2"')]
        # missing: only NULLs
        + [("u3", "h", None), ("u3", "h", None)]
        # stable despite one missing fetch (one distinct non-null)
        + [("u4", "h", '"c"'), ("u4", "h", None)]
    )
    out = etag_stability(_log(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_urls"], r["n_stable"], r["n_rotating"], r["n_missing"]) == (
        4, 2, 1, 1,
    )
    assert r["rotate_rate"] == 0.25
    assert r["use_conditional_get"] is True


def test_etag_stability_host_switch_off(spark):
    rows = [("u1", "h", '"1"'), ("u1", "h", '"2"'),
            ("u2", "h", '"3"'), ("u2", "h", '"4"')]
    r = etag_stability(_log(spark, rows)).collect()[0]
    assert r["use_conditional_get"] is False
    assert r["rotate_rate"] == 1.0


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


def test_robots_churn_directions_and_noise(spark):
    old = _robots(spark, [
        ("same.ex", "User-agent: *\nDisallow: /a\nCrawl-delay: 9\n"),
        ("tight.ex", "Disallow: /a\n"),
        ("loose.ex", "Disallow: /a\nDisallow: /b\n"),
        ("mixed.ex", "Disallow: /a\n"),
    ])
    new = _robots(spark, [
        # Allow + Crawl-delay + empty Disallow are not rule paths
        ("same.ex", "Allow: /pub\nDisallow: /a\nDisallow:\n"),
        ("tight.ex", "Disallow: /a\ndisallow: /b\n"),  # case-insensitive
        ("loose.ex", "Disallow: /b\n"),
        ("mixed.ex", "Disallow: /z\n"),
    ])
    out = {r["host"]: r for r in robots_churn(old, new).collect()}
    assert out["same.ex"]["direction"] == "same"
    assert (out["tight.ex"]["added"], out["tight.ex"]["direction"]) == (
        1, "tightened",
    )
    assert (out["loose.ex"]["removed"], out["loose.ex"]["direction"]) == (
        1, "loosened",
    )
    assert (out["mixed.ex"]["added"], out["mixed.ex"]["removed"],
            out["mixed.ex"]["direction"]) == (1, 1, "mixed")


def test_robots_churn_full_outer(spark):
    old = _robots(spark, [("gone.ex", "Disallow: /a\n")])
    new = _robots(spark, [("born.ex", "Disallow: /b\nDisallow: /c\n")])
    out = {r["host"]: r for r in robots_churn(old, new).collect()}
    assert (out["gone.ex"]["n_new"], out["gone.ex"]["direction"]) == (
        0, "loosened",
    )
    assert (out["born.ex"]["n_old"], out["born.ex"]["added"],
            out["born.ex"]["direction"]) == (0, 2, "tightened")


def _hosts(spark, rows):
    return spark.createDataFrame(rows, "host string, demand long, cap long")


def test_waterfill_partial_level(spark):
    # caps [10, 20, 40], budget 50 -> level 20, allocs [10, 20, 20]
    out = {
        r["host"]: r
        for r in waterfill(
            _hosts(spark, [("a", 10, 99), ("b", 99, 20), ("c", 40, 40)]),
            budget=50,
        ).collect()
    }
    assert (out["a"]["alloc"], out["a"]["capped"]) == (10.0, True)
    assert (out["b"]["alloc"], out["b"]["capped"]) == (20.0, True)
    assert (out["c"]["alloc"], out["c"]["capped"]) == (20.0, False)
    assert sum(r["alloc"] for r in out.values()) == 50.0


def test_waterfill_all_capped(spark):
    out = waterfill(
        _hosts(spark, [("a", 5, 10), ("b", 7, 3)]), budget=100
    ).collect()
    assert all(r["capped"] for r in out)
    assert sum(r["alloc"] for r in out) == 8.0  # min(demand, cap) each


def test_waterfill_matches_bruteforce(spark):
    # brute-force the level by bisection and compare allocations
    rows = [(f"h{i}", (i * 13) % 47 + 1, (i % 5 + 1) * 7) for i in range(23)]
    budget = 150
    caps = [min(d, c) for _, d, c in rows]

    def f(t):
        return sum(min(c, t) for c in caps)

    lo, hi = 0.0, float(max(caps))
    for _ in range(80):
        mid = (lo + hi) / 2
        if f(mid) < budget:
            lo = mid
        else:
            hi = mid
    level = (lo + hi) / 2
    expect = {h: round(min(min(d, c), level), 4) for h, d, c in rows}
    out = waterfill(_hosts(spark, rows), budget=budget).collect()
    got = {r["host"]: round(r["alloc"], 4) for r in out}
    assert got == expect
    # each alloc is rounded to 6 decimals, so the sum drifts by up to
    # n * 5e-7 from the exact budget
    assert abs(sum(r["alloc"] for r in out) - budget) < 1e-4


def test_waterfill_empty(spark):
    out = waterfill(
        _hosts(spark, []).filter(F.lit(False)), budget=10
    ).collect()
    assert out == []
