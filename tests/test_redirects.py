"""Redirect-chain resolution (operators/redirects.py): pointer
doubling must reproduce hop-by-hop walking exactly — chains, the
exact-cap boundary, over-cap chains, loops, self-loops."""

from __future__ import annotations

from flyscrape_spark.operators.redirects import resolve_redirects


def _chain(prefix: str, n: int) -> list[tuple[str, str]]:
    return [(f"{prefix}{i}", f"{prefix}{i + 1}") for i in range(n)]


def test_redirect_chains_and_loops(spark):
    cap = 10
    redirects = (
        _chain("http://c3/", 3)            # 3-hop chain -> c3/3
        + _chain("http://cap/", cap)       # exactly cap hops -> cap/10
        + _chain("http://over/", cap + 1)  # cap+1 hops: unresolved
        + [("http://loop/a", "http://loop/b"),
           ("http://loop/b", "http://loop/a"),   # 2-cycle
           ("http://self/x", "http://self/x")]   # self-loop
    )
    urls = (
        ["http://plain/p"]
        + [u for u, _ in redirects]
        + ["http://c3/3"]  # terminal of a chain, itself not a redirect
    )
    rdf = spark.createDataFrame(redirects, "src string, dst string")
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {
        r["url"]: r
        for r in resolve_redirects(udf, rdf, max_hops=cap).collect()
    }
    assert len(rows) == len(urls)

    # non-redirect URLs resolve to themselves at 0 hops
    for u in ("http://plain/p", "http://c3/3"):
        assert (rows[u]["final_url"], rows[u]["hops"], rows[u]["resolved"]) == (
            u, 0, True)

    # full hop-by-hop oracle for every chain position
    f = dict(redirects)
    for u in urls:
        cur, hops = u, 0
        while cur in f and hops < cap:
            cur, hops = f[cur], hops + 1
        r = rows[u]
        if cur in f:  # still a redirect after cap hops
            assert (r["final_url"], r["hops"], r["resolved"]) == (None, cap, False)
        else:
            assert (r["final_url"], r["hops"], r["resolved"]) == (cur, hops, True)

    # spot-check the boundary: cap-long chain resolves, cap+1 does not
    assert rows["http://cap/0"]["resolved"] is True
    assert rows["http://cap/0"]["hops"] == cap
    assert rows["http://over/0"]["resolved"] is False
    assert rows["http://loop/a"]["resolved"] is False
    assert rows["http://self/x"]["resolved"] is False


def test_redirect_join_count_is_logarithmic(spark):
    # the plan must contain O(log cap) self-joins, not O(cap):
    # 4 doubling rounds for cap=10
    redirects = spark.createDataFrame(_chain("http://c/", 6), "src string, dst string")
    urls = spark.createDataFrame([("http://c/0",)], "url string")
    out = resolve_redirects(urls, redirects, max_hops=10)
    assert out.count() == 1
    row = out.first()
    assert (row["final_url"], row["hops"], row["resolved"]) == ("http://c/6", 6, True)
