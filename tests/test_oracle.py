"""The sequential oracle must reproduce the URL sets the reference's
own tests pin down (FIXTURES.md scenario table, each row cited to a
reference test). The oracle is then the ground truth the distributed
engine is compared against in test_frontier.py.
"""

from flyscrape_spark.oracle import crawl_oracle
from flyscrape_spark.sources.fixtures import SCENARIOS


def run(name):
    s = SCENARIOS[name]
    return crawl_oracle(s.seeds, s.config, s.page_for, script=s.script)


def test_follow_default():
    # followlinks_test.go:19-51 — exactly 5 URLs
    r = run("follow_default")
    assert r.seen == [
        "http://www.example.com/foo/bar",
        "http://www.example.com/baz",
        "http://www.example.com/foo/baz",
        "http://www.google.com",
        "http://www.google.com/baz",
    ]
    assert r.fetched == r.seen  # no validators in this scenario


def test_follow_selector():
    # followlinks_test.go:53-86
    assert run("follow_selector").seen == [
        "http://www.example.com/foo/bar",
        "http://www.google.com",
    ]


def test_follow_data_attr():
    # followlinks_test.go:88-119
    assert run("follow_data_attr").seen == [
        "http://www.example.com/foo/bar",
        "http://www.google.com",
    ]


def test_follow_multi():
    # followlinks_test.go:121-153
    assert run("follow_multi").seen == [
        "http://www.example.com/foo/bar",
        "http://www.example.com/foo/a",
        "http://www.example.com/foo/b",
    ]


def test_follow_disabled():
    # followlinks_test.go:155-187
    assert run("follow_disabled").seen == ["http://www.example.com/foo/bar"]


def test_depth_cycle():
    # depth_test.go:20-58 — depth=2 inclusive, dedup breaks the cycle
    r = run("depth_cycle")
    assert r.fetched == [
        "http://www.example.com",
        "http://www.google.com",
        "http://www.duckduckgo.com",
    ]
    # each fetched exactly once despite the cycle
    assert len(set(r.fetched)) == len(r.fetched)


def test_domain_allow():
    # domainfilter_test.go:20-52 — seed host implicitly allowed
    r = run("domain_allow")
    assert r.fetched == ["http://www.example.com", "http://www.google.com"]
    # blocked-by-filter URL is still SEEN (marked at enqueue,
    # scrape.go:276-285) and never retried
    assert "http://www.duckduckgo.com" in r.seen


def test_domain_star():
    # domainfilter_test.go:54-87
    assert run("domain_star").fetched == [
        "http://www.example.com",
        "http://www.google.com",
        "http://www.duckduckgo.com",
    ]


def test_domain_block():
    # domainfilter_test.go:89-122 — block overrides allow
    assert run("domain_block").fetched == [
        "http://www.example.com",
        "http://www.duckduckgo.com",
    ]


def test_url_allow():
    # urlfilter_test.go:20-55 — seed always passes
    assert run("url_allow").fetched == [
        "http://www.example.com/",
        "http://www.example.com/foo?id=123",
        "http://www.example.com/bar",
    ]


def test_url_block():
    # urlfilter_test.go:57-92
    assert run("url_block").fetched == [
        "http://www.example.com/",
        "http://www.example.com/foo?id=ABC",
        "http://www.example.com/barz",
    ]


def test_manual_follow():
    """js_test.go:263-282 + examples/hackernews_manual_follow.js:
    follow() with a relative href absolutizes against the page URL;
    auto-follow is disabled (follow: []); the last page's missing
    .morelink yields attr '' which follow() drops."""
    import json

    r = run("manual_follow")
    assert r.seen == [
        "http://hn.test/",
        "http://hn.test/news?p=2",
        "http://hn.test/news?p=3",
    ]
    assert r.fetched == r.seen
    assert [row.depth for row in r.rows] == [0, 1, 2]
    assert json.loads(r.rows[0].data) == {
        "url": "http://hn.test/", "next": "/news?p=2"
    }
    assert json.loads(r.rows[2].data) == {
        "url": "http://hn.test/news?p=3", "next": ""
    }


def test_manual_follow_mixed_ordering():
    """follow() fires during script execution, auto links in the
    deferred ReceiveResponse — manual URLs take earlier discovery
    order on the same page (scrape.go:170-176 vs :210-212)."""
    r = run("manual_follow_mixed")
    assert r.seen == [
        "http://hn.test/",
        "http://hn.test/news?p=2",   # manual follow: enqueued FIRST
        "http://hn.test/item?id=1",  # auto link, same page, later
        "http://hn.test/news?p=3",   # from p=2: manual first again
        "http://hn.test/item?id=2",
    ]
    # depth=1: the depth-2 discoveries are seen but never fetched
    assert r.fetched == [
        "http://hn.test/",
        "http://hn.test/news?p=2",
        "http://hn.test/item?id=1",
    ]
    assert r.rows[2].error == "Get: no such host"


def test_retry_503():
    # retry_test.go:23-51 — len(delays)+1 attempts, then error row
    r = run("retry_503")
    row = r.rows[0]
    assert row.attempts == 3
    assert row.error == "503 error"
    # non-2xx still follows links (scrape.go:170-196); body has none
    assert row.fetched


def test_extract_basic_spans():
    # js_test.go:16-58 fixture page
    r = run("extract_basic")
    spans = r.rows[0].spans
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("text", "headline"),
        ("text", "paragraph"),
    ]
