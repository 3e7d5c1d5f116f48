"""Config override semantics (cmd/args.go, flyscrape.go:155-167) and
request-header / UA rotation (modules/headers/headers.go)."""

from flyscrape_spark.config import CrawlConfig, apply_overrides
from flyscrape_spark.sources.transport import UA_POOL, with_request_headers


def test_scalar_type_inference():
    cfg = apply_overrides(CrawlConfig(), {"depth": "2", "rate": "90.5",
                                          "canonicalize": "true"})
    assert cfg.depth == 2
    assert cfg.rate == 90.5
    assert cfg.canonicalize is True


def test_array_fields_wrap_single_values():
    cfg = apply_overrides(CrawlConfig(), {"allowedDomains": "a.test",
                                          "blocked_urls": ["x", "y"]})
    assert cfg.allowed_domains == ["a.test"]
    assert cfg.blocked_urls == ["x", "y"]


def test_unknown_keys_ignored():
    cfg = apply_overrides(CrawlConfig(depth=3), {"nonsense": "1"})
    assert cfg.depth == 3


def test_parse_retry_after():
    import datetime

    from flyscrape_spark.sources.transport import parse_retry_after

    assert parse_retry_after("120") == 120.0
    assert parse_retry_after(" 0 ") == 0.0
    assert parse_retry_after("-5") == 0.0
    future = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(seconds=60)
    secs = parse_retry_after(future.strftime("%a, %d %b %Y %H:%M:%S GMT"))
    assert 50 <= secs <= 61
    assert parse_retry_after("Thu, 01 Jan 1970 00:00:00 GMT") == 0.0
    assert parse_retry_after("garbage") is None


def test_ua_rotation_deterministic(spark):
    frontier = spark.createDataFrame(
        [(f"http://h.test/{i}",) for i in range(20)], "url string"
    )
    out = with_request_headers(frontier, CrawlConfig())
    rows = {r["url"]: r["request_headers"] for r in out.collect()}
    again = {r["url"]: r["request_headers"]
             for r in with_request_headers(frontier, CrawlConfig()).collect()}
    assert rows == again  # deterministic, unlike the reference's rand
    uas = {h["User-Agent"] for h in rows.values()}
    assert uas <= set(UA_POOL)
    assert len(uas) > 1  # actually rotates


def test_config_headers_override_ua(spark):
    frontier = spark.createDataFrame([("http://h.test/a",)], "url string")
    cfg = CrawlConfig(headers={"User-Agent": "custom-bot", "X-K": "v"})
    [row] = with_request_headers(frontier, cfg).collect()
    assert row["request_headers"]["User-Agent"] == "custom-bot"
    assert row["request_headers"]["X-K"] == "v"
