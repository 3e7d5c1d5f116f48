"""Browser-render transport slot (SURVEY §2.1 #18).

Pins the reference semantics the slot must carry even without a real
Chromium: the ratelimit concurrency clamp (browser on + concurrency
unset -> 1, modules/ratelimit/ratelimit.go:50-52), header forwarding
rules (Cookie excluded, default flyscrape UA dropped,
browser.go:106-118), the document-response status override
(browser.go:141-146), DOM settling making JS-only links crawlable
(browser.go:124-127), and the honest stub for the real renderer.
"""

from __future__ import annotations

import pytest

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.sources.browser import (
    ChromiumRenderer,
    FakeDomSettlingRenderer,
    RenderingTransport,
)

# a JS-rendered page: the link to /hidden exists only inside the
# deferred script payload, invisible to the plain HTML parser
PAGES = {
    "http://b.example/": (
        '<p>static</p>'
        '<script type="application/x-deferred-html">'
        '<a href="/hidden">late</a></script>'
    ),
    "http://b.example/hidden": "<p>rendered-only page</p>",
    "http://b.example/gone": (404, "<p>custom 404 body</p>"),
}


def _fetch(spark, urls, config=None, renderer=None, **kw):
    from pyspark.sql import functions as F

    config = config or CrawlConfig(browser=True)
    renderer = renderer or FakeDomSettlingRenderer(PAGES, **kw)
    t = RenderingTransport(renderer, config, pace=False)
    frontier = spark.createDataFrame(
        [(u, 0) for u in urls], "url string, depth int"
    ).withColumn("host", F.parse_url("url", F.lit("HOST")))
    return {r["url"]: r for r in t.fetch(frontier).collect()}


def test_concurrency_clamp_when_unset():
    # ratelimit.go:50-52: browser enabled + concurrency unset -> 1
    t = RenderingTransport(FakeDomSettlingRenderer({}),
                           CrawlConfig(browser=True))
    assert t.concurrency == 1


def test_explicit_concurrency_wins():
    t = RenderingTransport(FakeDomSettlingRenderer({}),
                           CrawlConfig(browser=True, concurrency=4))
    assert t.concurrency == 4


def test_chromium_renderer_is_an_honest_stub():
    with pytest.raises(RuntimeError, match="Chromium"):
        ChromiumRenderer(headless=True)


def test_dom_settling_materializes_deferred_html(spark):
    rows = _fetch(spark, ["http://b.example/"])
    body = rows["http://b.example/"]["body"]
    assert '<a href="/hidden">late</a>' in body
    assert "x-deferred-html" not in body


def test_status_override_keeps_body_like_reference(spark):
    # non-2xx: error set BUT body kept (scrape.go:170-176 semantics,
    # status from the document network response, browser.go:141-146)
    rows = _fetch(spark, ["http://b.example/gone"])
    row = rows["http://b.example/gone"]
    assert row["status"] == 404
    assert row["error"] == "404 error"
    assert "custom 404 body" in row["body"]


def test_navigation_failure_maps_to_error_row(spark):
    rows = _fetch(spark, ["http://nowhere.example/"])
    row = rows["http://nowhere.example/"]
    assert row["body"] is None
    assert "no such host" in row["error"]
    assert row["status"] == 0


def test_header_forwarding_rules(spark):
    # custom headers forwarded; Cookie excluded from headers but
    # delivered separately (SetCookies, browser.go:118); flyscrape
    # default UA dropped (browser.go:113-115)
    cfg = CrawlConfig(
        browser=True,
        headers={"X-Token": "t1", "Cookie": "sid=abc",
                 "User-Agent": "flyscrape/1.0"},
    )
    rows = _fetch(spark, ["http://b.example/"], config=cfg,
                  echo_headers=True)
    body = rows["http://b.example/"]["body"]
    assert "X-Token=t1" in body
    assert "Cookie=" not in body.split("<!--cookie:")[0]
    assert "<!--cookie:sid=abc-->" in body
    assert "flyscrape/1.0" not in body.split("<!--cookie:")[0]


def test_end_to_end_crawl_discovers_js_only_link(spark):
    """The point of browser mode: a link inserted by JS after load is
    followed. With JoinTransport over the same raw HTML the /hidden
    page is unreachable; through the rendering transport it is
    fetched."""
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.transport import JoinTransport

    cfg = CrawlConfig(depth=1, domain_filter=False, browser=True)
    rt = RenderingTransport(FakeDomSettlingRenderer(PAGES), cfg, pace=False)
    got = CrawlEngine(spark, cfg, rt, collect_metrics=False).run(
        ["http://b.example/"])
    urls = {r["url"] for r in got.results.collect()}
    assert "http://b.example/hidden" in urls

    raw_pages = spark.createDataFrame(
        [(u, "b.example", p[0] if isinstance(p, tuple) else 200,
          p[1] if isinstance(p, tuple) else p)
         for u, p in PAGES.items()],
        "url string, host string, status int, html string",
    )
    plain = CrawlEngine(
        spark, CrawlConfig(depth=1, domain_filter=False),
        JoinTransport(raw_pages, broadcast=True), collect_metrics=False,
    ).run(["http://b.example/"])
    plain_urls = {r["url"] for r in plain.results.collect()}
    assert "http://b.example/hidden" not in plain_urls


def test_jsconfig_parses_browser_keys():
    from flyscrape_spark.jsconfig import config_from_source

    js = config_from_source(
        "export const config = { url: 'http://x.example/',"
        " browser: true, headless: false };"
    )
    assert js.crawl.browser is True
    assert js.crawl.headless is False
    assert js.unsupported == {}
    # headless: null means true (browser.go:46-49)
    js2 = config_from_source(
        "export const config = { url: 'http://x.example/', browser: true };"
    )
    assert js2.crawl.headless is True
