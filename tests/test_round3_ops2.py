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


def test_pack_sequences_by_hand(spark):
    from flyscrape_spark.operators.mixing import pack_sequences

    # docs of 3, 5, 0, 4 tokens; seq_len 4:
    # cum_before: 0, 3, 8, 8
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f g h"), (2, "   "), (3, "i j k l")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert (out[0]["cum_before"], out[0]["seq_start"], out[0]["seq_end"],
            out[0]["offset"]) == (0, 0, 0, 0)
    # doc1 spans windows 0 and 1 (tokens 3..7)
    assert (out[1]["cum_before"], out[1]["seq_start"], out[1]["seq_end"],
            out[1]["offset"]) == (3, 0, 1, 3)
    # empty doc occupies nothing: seq_end < seq_start
    assert out[2]["n_tokens"] == 0 and out[2]["seq_end"] == out[2]["seq_start"] - 1
    assert (out[3]["cum_before"], out[3]["seq_start"], out[3]["seq_end"]) == (8, 2, 2)


def test_pack_sequences_partitioning_independent(spark):
    from flyscrape_spark.operators.mixing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(1 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, 16, parts=2).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 16, parts=5).collect()))
    assert a == b
    # global invariant: cum_before is the prefix sum in doc_id order
    rows = sorted(pack_sequences(docs, 16).collect(), key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["cum_before"] == acc
        acc += r["n_tokens"]


def test_host_health_breaker(spark):
    from flyscrape_spark.operators.politeness import host_health

    rows = (
        [("bad.x", 503)] * 6 + [("bad.x", 200)] * 4      # 60% errors
        + [("ok.x", 200)] * 20 + [("ok.x", 500)] * 2     # ~9% errors
        + [("tiny.x", 0)] * 3                            # errors but n<10
    )
    log = spark.createDataFrame(
        [(f"http://{h}/{i}", h, s) for i, (h, s) in enumerate(rows)],
        "url string, host string, status int",
    )
    out = {r["host"]: r for r in host_health(log).collect()}
    assert out["bad.x"]["cooldown"] is True
    assert out["bad.x"]["n_errors"] == 6
    assert out["ok.x"]["cooldown"] is False
    # transport errors (status 0) count, but the sample is too small
    assert out["tiny.x"]["n_errors"] == 3
    assert out["tiny.x"]["cooldown"] is False


def test_engine_host_cooldown(spark):
    """Engine-level circuit breaker: a host serving only 503s is cut
    off after the generation that observes it; its later URLs stay
    seen (validator-dropped semantics) but never fetch."""
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.transport import JoinTransport

    pages = spark.createDataFrame(
        [
            ("http://good.test/", "good.test", 200,
             '<a href="http://bad.test/1">b</a><a href="/g1">g</a>'),
            ("http://bad.test/1", "bad.test", 503,
             '<a href="http://bad.test/2">b2</a>'),
            ("http://good.test/g1", "good.test", 200,
             '<a href="http://bad.test/3">b3</a><a href="/g2">g2</a>'),
            ("http://bad.test/2", "bad.test", 503, "<p>x</p>"),
            ("http://bad.test/3", "bad.test", 503, "<p>x</p>"),
            ("http://good.test/g2", "good.test", 200, "<p>leaf</p>"),
        ],
        "url string, host string, status int, html string",
    )
    cfg = CrawlConfig(depth=3, domain_filter=False,
                      host_cooldown_ratio=0.5, host_cooldown_min_fetches=1)
    r = CrawlEngine(spark, cfg, JoinTransport(pages, cfg, broadcast=True),
                    collect_metrics=False).run(["http://good.test/"])
    fetched = {row["url"] for row in r.results.collect()}
    # gen1 fetches bad/1 (first observation); from gen2 the breaker
    # holds: bad/2, bad/3 never fetch, good pages still crawl fully
    assert "http://bad.test/1" in fetched
    assert "http://bad.test/2" not in fetched
    assert "http://bad.test/3" not in fetched
    assert {"http://good.test/", "http://good.test/g1",
            "http://good.test/g2"} <= fetched
    # skipped URLs are STILL seen — they never re-enter the frontier
    seen = {row["url"] for row in r.seen.collect()}
    assert {"http://bad.test/2", "http://bad.test/3"} <= seen

    # breaker off: reference behavior, everything fetches
    cfg2 = CrawlConfig(depth=3, domain_filter=False)
    r2 = CrawlEngine(spark, cfg2, JoinTransport(pages, cfg2, broadcast=True),
                     collect_metrics=False).run(["http://good.test/"])
    fetched2 = {row["url"] for row in r2.results.collect()}
    assert {"http://bad.test/1", "http://bad.test/2",
            "http://bad.test/3"} <= fetched2


def test_chunk_documents_by_hand(spark):
    from flyscrape_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
         (1, "a b"),                                  # shorter than size
         (2, "   ")],                                 # empty: no chunks
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=4, overlap=2).collect()
    rows = sorted((r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"],
                   r["chunk_text"]) for r in out)
    # doc0: starts 0,2,4,6,8 -> windows of 4 (last two shorter)
    assert [(d, i, n) for d, i, n, _ in rows if d == 0] == [
        (0, 0, 4), (0, 1, 4), (0, 2, 4), (0, 3, 4), (0, 4, 2)]
    assert rows[0][3] == "w0 w1 w2 w3"
    assert rows[1][3] == "w2 w3 w4 w5"   # overlap of 2
    assert rows[4][3] == "w8 w9"         # clamped tail
    # doc1: a single short chunk; doc2: none
    assert [(d, i, n, t) for d, i, n, t in rows if d == 1] == [(1, 0, 2, "a b")]
    assert not [r for r in rows if r[0] == 2]

    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(docs, size=4, overlap=4)
