"""Engine wiring for robots meta directives: nofollow prunes the
link fan-out at the source, noindex keeps the page out of results —
both only under CrawlConfig(respect_meta_robots=True); seen/ordering
semantics are untouched (the page itself is still fetched and its
URL stays in the seen set)."""

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.transport import JoinTransport

_PAGES = [
    ("http://s.test/", "s.test", 200,
     '<a href="/follow">f</a><a href="/nf">n</a>'),
    ("http://s.test/follow", "s.test", 200,
     '<meta name="robots" content="nofollow"/><a href="/hidden">h</a>'),
    ("http://s.test/nf", "s.test", 200,
     '<meta name="robots" content="noindex"/><a href="/open">o</a>'),
    ("http://s.test/hidden", "s.test", 200, "<p>should not be fetched</p>"),
    ("http://s.test/open", "s.test", 200, "<p>open</p>"),
]
_SCHEMA = "url string, host string, status int, html string"


def _run(spark, **cfg_kw):
    cfg = CrawlConfig(depth=3, **cfg_kw)
    pages = spark.createDataFrame(_PAGES, _SCHEMA)
    return CrawlEngine(
        spark, cfg, JoinTransport(pages, cfg)
    ).run(["http://s.test/"])


def test_nofollow_prunes_and_noindex_hides(spark):
    r = _run(spark, respect_meta_robots=True)
    seen = {row["url"] for row in r.seen.collect()}
    results = {row["url"] for row in r.results.collect()}
    # /follow was fetched but its outlink /hidden must NOT be
    assert "http://s.test/follow" in seen
    assert "http://s.test/hidden" not in seen
    # /nf's outlink IS followed (noindex != nofollow)
    assert "http://s.test/open" in seen
    # noindex page: crawled (in seen) but excluded from results
    assert "http://s.test/nf" in seen
    assert "http://s.test/nf" not in results
    assert "http://s.test/open" in results


def test_default_ignores_meta_robots(spark):
    """Reference semantics by default: the flag off means directives
    are inert (flyscrape follows links unconditionally)."""
    r = _run(spark)
    seen = {row["url"] for row in r.seen.collect()}
    results = {row["url"] for row in r.results.collect()}
    assert "http://s.test/hidden" in seen
    assert "http://s.test/nf" in results
