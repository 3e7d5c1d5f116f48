"""Best-first admission inside the engine: generation_budget +
priority_scores truncate FETCHES while every enqueued URL still
enters the seen set (enqueue-marks-seen, scrape.go:276-285)."""

import pyspark.sql.functions as F
import pytest

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.transport import JoinTransport


@pytest.fixture
def pages(spark):
    rows = [
        ("http://s.test/", '<a href="/a">A</a><a href="/b">B</a>'),
        ("http://s.test/a", '<a href="/a2">A2</a>'),
        ("http://s.test/b", '<a href="/b2">B2</a>'),
        ("http://s.test/a2", "<p>leaf</p>"),
        ("http://s.test/b2", "<p>leaf</p>"),
    ]
    return spark.createDataFrame(
        [(u, "s.test", 200, h) for u, h in rows],
        "url string, host string, status int, html string",
    )


def _run(spark, pages, budget, scores=None):
    cfg = CrawlConfig(depth=2, generation_budget=budget)
    eng = CrawlEngine(
        spark, cfg, JoinTransport(pages, cfg), priority_scores=scores
    )
    return eng.run(["http://s.test/"])


def test_budget_with_scores_fetches_preferred_branch(spark, pages):
    scores = pages.filter(F.col("url").contains("/b")).select(
        F.xxhash64("url").alias("url_key"), F.lit(10.0).alias("score")
    )
    r = _run(spark, pages, budget=1, scores=scores)
    fetched = {row["url"] for row in r.results.collect()}
    # gen0: seed (budget 1, only candidate); gen1: /b outranks /a;
    # gen2: /b2 is the only frontier row (the /a subtree was never
    # fetched, so /a2 was never discovered)
    assert fetched == {"http://s.test/", "http://s.test/b", "http://s.test/b2"}
    # /a was ENQUEUED (seen) even though the budget skipped it
    seen = {row["url"] for row in r.seen.collect()}
    assert "http://s.test/a" in seen and "http://s.test/a2" not in seen


def test_budget_without_scores_is_fifo_prefix(spark, pages):
    r = _run(spark, pages, budget=1, scores=None)
    fetched = {row["url"] for row in r.results.collect()}
    # unscored -> FIFO: /a wins the depth-1 tie by discovery order
    assert fetched == {"http://s.test/", "http://s.test/a", "http://s.test/a2"}


def test_no_budget_matches_reference_fifo(spark, pages):
    r = _run(spark, pages, budget=None)
    assert r.results.count() == 5
