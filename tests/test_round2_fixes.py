"""Round-2 hardening: collision-exact in-generation dedup, wired
config fields (user_agent, concurrency), Retry-After clamping,
robots scheme carry-through and broadcast gating."""

from __future__ import annotations

import io
import urllib.error
from unittest import mock

from pyspark.sql import functions as F

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CAND_SCHEMA, CrawlEngine
from flyscrape_spark.sources.transport import (
    UA_POOL,
    HttpTransport,
    JoinTransport,
    _http_fetch_one,
    with_request_headers,
)


def test_in_generation_dedup_is_collision_exact(spark):
    """Two DISTINCT URLs sharing one 64-bit url_key must both survive
    the in-generation dedup (VERDICT r1: grouping on the hash alone
    silently merged them; at 10^10 URLs that loses ~a few URLs/crawl)."""
    cand = spark.createDataFrame(
        [
            ("http://a.test/1", 0, 0, 0),
            ("http://b.test/other", 0, 0, 1),
            ("http://a.test/1", 0, 5, 0),  # true duplicate of row 1
        ],
        CAND_SCHEMA,
    ).withColumn("url_key", F.lit(42).cast("long"))  # forced collision
    out = CrawlEngine.dedupe_candidates(cand).collect()
    by_url = {r["url"]: r for r in out}
    assert set(by_url) == {"http://a.test/1", "http://b.test/other"}
    # first-seen rule still holds per URL
    assert by_url["http://a.test/1"]["parent_order"] == 0


def test_user_agent_config_wired(spark):
    df = spark.createDataFrame([("http://x.test/a",)], "url string")

    fixed = with_request_headers(df, CrawlConfig(user_agent="flyscrape/1.0"))
    hdrs = fixed.select("request_headers").head()["request_headers"]
    assert hdrs["User-Agent"] == "flyscrape/1.0"

    # explicit header wins over the config field
    both = with_request_headers(
        df, CrawlConfig(user_agent="flyscrape/1.0",
                        headers={"User-Agent": "explicit"}),
    )
    hdrs = both.select("request_headers").head()["request_headers"]
    assert hdrs["User-Agent"] == "explicit"

    # default None -> deterministic rotation from the pool
    rotated = with_request_headers(df, CrawlConfig())
    hdrs = rotated.select("request_headers").head()["request_headers"]
    assert hdrs["User-Agent"] in UA_POOL


def test_concurrency_config_wired():
    assert HttpTransport(CrawlConfig(concurrency=3)).pool_size == 3
    assert HttpTransport(CrawlConfig()).pool_size == 16
    # explicit pool_size wins
    assert HttpTransport(CrawlConfig(concurrency=3), pool_size=7).pool_size == 7


def test_retry_after_clamped():
    """A server demanding Retry-After: 9999 must not park the worker
    thread; the honored wait is clamped to RETRY_AFTER_CAP."""
    sleeps: list[float] = []

    def fake_urlopen(req, timeout=None):
        raise urllib.error.HTTPError(
            req.full_url, 503, "boom",
            {"Retry-After": "9999"}, io.BytesIO(b""),
        )

    with mock.patch("urllib.request.urlopen", side_effect=fake_urlopen):
        status, body, error, attempts, _etag, _lm = _http_fetch_one(
            "http://x.test/", {}, 1.0,
            frozenset({503}), (1.0, 2.0), sleeps.append,
        )
    assert status == 503 and attempts == 3
    assert sleeps == [30.0, 30.0]  # max(delay, min(9999, 30))


def test_robots_probed_on_original_scheme(spark):
    """An https host's robots.txt must be fetched over https
    (ADVICE r1: the table hardcoded http)."""
    from flyscrape_spark.operators.robots import robots_table

    pages = spark.createDataFrame(
        [
            ("https://s.test/robots.txt", 200, "User-agent: *\nDisallow: /x"),
            ("http://s.test/robots.txt", 200, "User-agent: *\nDisallow: /WRONG"),
        ],
        "url string, status int, html string",
    )
    hosts = spark.createDataFrame(
        [("s.test", "https")], "host string, scheme string"
    )
    robots = robots_table(hosts, JoinTransport(pages, broadcast=True)).collect()
    assert len(robots) == 1
    assert [r["pattern"] for r in robots[0]["rules"]] == ["/x"]


def test_allowed_filter_broadcast_gated(spark):
    """Under the threshold: broadcast join. Over it: no broadcast hint
    (shuffle join on host) — the 10^10-scale OOM guard."""
    from flyscrape_spark.operators.robots import allowed_filter

    frontier = spark.createDataFrame(
        [("http://a.test/x", "a.test")], "url string, host string"
    )
    robots = spark.createDataFrame(
        [("a.test", [{"allow": False, "pattern": "/x"}])],
        "host string, rules array<struct<allow:boolean,pattern:string>>",
    )
    small = allowed_filter(frontier, robots, n_hosts=1)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = allowed_filter(frontier, robots, n_hosts=2, broadcast_threshold=1)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        rows = big.collect()  # correctness unchanged under shuffle join
        assert rows[0]["robots_allowed"] is False
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
