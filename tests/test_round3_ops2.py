"""Second round-3 batch: robots Sitemap: directives, change-rate
estimation, fixed-iteration k-means — pinned against hand-computed
and sequential-oracle values."""

from __future__ import annotations

import math

import pytest

from flyscrape_spark.operators.kmeans import kmeans
from flyscrape_spark.operators.recrawl import change_rate
from flyscrape_spark.operators.robots import sitemap_directives


def test_sitemap_directives_parsing(spark):
    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a/s1.xml\n"
        "sitemap:http://a/s2.xml\n"      # case-insensitive, no space
        "  SITEMAP:   http://a/s3.xml\n"  # leading whitespace
        "User-agent: bot\nDisallow: /\n"
    )
    df = spark.createDataFrame(
        [("a", body), ("b", "User-agent: *\nAllow: /")],
        "host string, body string",
    )
    rows = sitemap_directives(df).orderBy("host", "position").collect()
    assert [(r["host"], r["sitemap_url"], r["position"]) for r in rows] == [
        ("a", "http://a/s1.xml", 0),
        ("a", "http://a/s2.xml", 1),
        ("a", "http://a/s3.xml", 2),
    ]


def test_change_rate_estimator_by_hand(spark):
    # u1: observed at 0,100,200,300; content changes twice (n=3, X=2)
    # u2: never changes (lambda 0, next_due = last + horizon)
    # u3: single observation (no intervals)
    rows = (
        [("u1", 0.0, "a"), ("u1", 100.0, "b"), ("u1", 200.0, "b"),
         ("u1", 300.0, "c"),
         ("u2", 0.0, "x"), ("u2", 50.0, "x"),
         ("u3", 10.0, "z")]
    )
    hist = spark.createDataFrame(rows, "url string, fetch_ts double, content_hash string")
    out = {r["url"]: r for r in change_rate(hist, horizon=1000.0).collect()}

    lam = -math.log((3 - 2 + 0.5) / (3 + 0.5)) / 100.0
    assert out["u1"]["n_intervals"] == 3 and out["u1"]["n_changes"] == 2
    assert out["u1"]["lambda_hat"] == pytest.approx(round(lam, 10), abs=1e-12)
    assert out["u1"]["next_due"] == pytest.approx(
        round(300.0 + 1.0 / round(lam, 10), 4), abs=1e-6)

    assert out["u2"]["n_changes"] == 0
    assert out["u2"]["lambda_hat"] == 0.0
    assert out["u2"]["next_due"] == pytest.approx(50.0 + 1000.0)

    assert out["u3"]["n_intervals"] == 0
    assert out["u3"]["lambda_hat"] == 0.0
    assert out["u3"]["next_due"] == pytest.approx(10.0 + 1000.0)


def test_change_rate_horizon_cap(spark):
    # rare changes: 1/lambda far beyond horizon -> capped
    rows = [("u", float(t), "a" if t < 900 else "b") for t in range(0, 1000, 100)]
    hist = spark.createDataFrame(rows, "url string, fetch_ts double, content_hash string")
    out = change_rate(hist, horizon=500.0).collect()[0]
    assert out["n_intervals"] == 9 and out["n_changes"] == 1
    assert out["next_due"] == pytest.approx(900.0 + 500.0)


def _lloyd_oracle(vecs: dict[int, list[float]], k: int, iterations: int):
    """Sequential Lloyd with the operator's exact determinism rules."""
    cents = {c: [float(x) for x in vecs[c]] for c in range(k)}

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            best = min(
                (round(sum((a - b) ** 2 for a, b in zip(v, cv)), 6), c)
                for c, cv in cents.items()
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(iterations):
        a = assign(cents)
        groups = {}
        for vid, (c, _) in a.items():
            groups.setdefault(c, []).append(vecs[vid])
        for c, members in groups.items():
            dims = len(members[0])
            cents[c] = [
                round(sum(m[d] for m in members) / len(members), 9)
                for d in range(dims)
            ]
    return assign(cents)


def test_kmeans_matches_sequential_lloyd(spark):
    # deterministic synthetic vectors, 3 natural clusters
    vecs = {
        i: [((i % 3) * 10.0 + (i * 7 % 5) * 0.1), ((i % 3) * -4.0 + (i % 11) * 0.05)]
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    for iters in (0, 2):
        got = {r["vec_id"]: (r["cluster"], r["dist"])
               for r in kmeans(df, k=3, iterations=iters).collect()}
        # fp32 storage: oracle must see the fp32-rounded values too
        import struct as _s
        f32 = {i: [_s.unpack("f", _s.pack("f", x))[0] for x in v]
               for i, v in vecs.items()}
        want = _lloyd_oracle(f32, k=3, iterations=iters)
        for vid in vecs:
            assert got[vid][0] == want[vid][0], (iters, vid)
            assert got[vid][1] == pytest.approx(want[vid][1], abs=1e-9)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only two distinct points: cluster of the unused centroid
    # keeps its init position instead of dying
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 10.0]), (3, [10.1, 10.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans(df, k=3, iterations=2).collect()
    clusters = {r["vec_id"]: r["cluster"] for r in out}
    # 0,1 near origin-ish centroids; 2,3 on the far centroid
    assert clusters[2] == clusters[3] == 2
    assert clusters[0] in (0, 1) and clusters[1] in (0, 1)


def test_strip_tracking_params(spark):
    from flyscrape_spark.functions.urls import strip_tracking_params

    cases = [
        ("http://a/p?id=1&utm_source=x&page=2", "http://a/p?id=1&page=2"),
        ("http://a/p?utm_campaign=c&gclid=g1", "http://a/p"),
        ("http://a/p?q=term", "http://a/p?q=term"),
        ("http://a/p", "http://a/p"),
        ("http://a/p?UTM_SOURCE=x&ok=1", "http://a/p?ok=1"),  # case-insensitive
        ("http://a/p?fbclid=f&msclkid=m&spm=s", "http://a/p"),
        ("http://a/p?", "http://a/p"),  # empty query drops the '?'
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", strip_tracking_params("url").alias("c")).collect()}
    for url, want in cases:
        assert got[url] == want, url
