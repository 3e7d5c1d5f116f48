"""Deterministic crawl fixtures (FIXTURES.md), copied from the
reference's test corpus so our assertions match its pinned behavior
line-for-line. Each scenario bundles seeds + config + a page source
(either a constant mock body, /root/reference/utils.go:22-35 style, or
an explicit url->page map).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.sources.transport import ConstantTransport, JoinTransport, Transport

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("status", IntegerType()),
        StructField("html", StringType()),
    ]
)


@dataclass
class Scenario:
    name: str
    seeds: list[str]
    config: CrawlConfig
    # constant mock body served for every URL (MockTransport style)...
    const_html: str | None = None
    const_status: int = 200
    # ...or an explicit synthetic web: url -> (status, html)
    pages: dict[str, tuple[int, str]] = field(default_factory=dict)
    # optional Python scrape script (parse/script.py): extraction +
    # manual follow() — the reference's JS default export
    script: object | None = None

    def transport(self, spark: SparkSession) -> Transport:
        if self.const_html is not None:
            return ConstantTransport(self.const_html, self.const_status, self.config)
        return JoinTransport(self.pages_df(spark), self.config)

    def pages_df(self, spark: SparkSession) -> DataFrame:
        from urllib.parse import urlparse

        rows = [
            (url, urlparse(url).netloc.lower(), status, html)
            for url, (status, html) in sorted(self.pages.items())
        ]
        return spark.createDataFrame(rows, PAGES_SCHEMA)

    def page_for(self, url: str) -> tuple[int, str] | None:
        """Python-side page lookup for the sequential oracle."""
        if self.const_html is not None:
            return (self.const_status, self.const_html)
        return self.pages.get(url)


# --- fixture HTML, verbatim shapes from the reference tests -------------

# modules/followlinks/followlinks_test.go:19-51
_FOLLOW_DEFAULT_HTML = """
<html><body>
<a href="/baz">baz</a>
<a href="baz">baz</a>
<a href="http://www.google.com">google</a>
</body></html>
"""

# followlinks_test.go:53-86
_FOLLOW_SELECTOR_HTML = """
<html><body>
<a href="/baz">baz</a>
<a href="baz">baz</a>
<div class="next"><a href="http://www.google.com">google</a></div>
</body></html>
"""

# followlinks_test.go:88-119
_FOLLOW_DATA_ATTR_HTML = """
<html><body>
<a href="/baz">baz</a>
<a href="baz">baz</a>
<div data-url="http://www.google.com">google</div>
</body></html>
"""

# followlinks_test.go:121-153
_FOLLOW_MULTI_HTML = """
<html><body>
<a href="/baz">baz</a>
<a class="prev" href="a">prev</a>
<a class="next" href="b">next</a>
</body></html>
"""

# modules/urlfilter/urlfilter_test.go:20-55
_URLFILTER_HTML = """
<html><body>
<a href="foo?id=123">foo 123</a>
<a href="foo?id=ABC">foo ABC</a>
<a href="/bar">bar</a>
<a href="/barz">barz</a>
</body></html>
"""

# modules/domainfilter/domainfilter_test.go fixtures: one page, 2 outlinks
_DOMAIN_HTML = """
<html><body>
<a href="http://www.google.com">google</a>
<a href="http://www.duckduckgo.com">duckduckgo</a>
</body></html>
"""

# js_test.go:16-24
_EXTRACT_HTML = (
    "<html><body><main><h1>headline</h1><p>paragraph</p></main></body></html>"
)

_SEED_FOOBAR = "http://www.example.com/foo/bar"
_SEED_EXAMPLE = "http://www.example.com"


def _manual_follow_pages() -> dict[str, tuple[int, str]]:
    """examples/hackernews_manual_follow.js shape: each listing page
    has a .morelink the script follows manually (follow: [] disables
    auto-follow); the last page has none."""
    page = (
        '<html><body><a href="/item?id=%d">story</a>'
        '<a class="morelink" href="%s">More</a></body></html>'
    )
    return {
        "http://hn.test/": (200, page % (1, "/news?p=2")),
        "http://hn.test/news?p=2": (200, page % (2, "/news?p=3")),
        "http://hn.test/news?p=3": (
            200, '<html><body><a href="/item?id=3">story</a></body></html>'
        ),
    }


def _manual_follow_script(ctx):
    """The manual-follow default export (js_test.go:263-282 +
    examples/hackernews_manual_follow.js): follow(doc.find(...).attr())
    with a RELATIVE href, absolutized against the page URL."""
    nxt = ctx.doc.find(".morelink").attr("href")
    ctx.follow(nxt)
    return {"url": ctx.url, "next": nxt}


def _depth_cycle_pages() -> dict[str, tuple[int, str]]:
    """modules/depth/depth_test.go:20-58 — a 3-page link cycle."""
    link = '<html><body><a href="%s">next</a></body></html>'
    return {
        "http://www.example.com": (200, link % "http://www.google.com"),
        "http://www.google.com": (200, link % "http://www.duckduckgo.com"),
        "http://www.duckduckgo.com": (200, link % "http://www.example.com"),
    }


SCENARIOS: dict[str, Scenario] = {
    s.name: s
    for s in [
        Scenario(
            "follow_default", [_SEED_FOOBAR], CrawlConfig(depth=None, domain_filter=False),
            const_html=_FOLLOW_DEFAULT_HTML,
        ),
        Scenario(
            "follow_selector", [_SEED_FOOBAR],
            CrawlConfig(depth=None, domain_filter=False, follow=[".next a[href]"]),
            const_html=_FOLLOW_SELECTOR_HTML,
        ),
        Scenario(
            "follow_data_attr", [_SEED_FOOBAR],
            CrawlConfig(depth=None, domain_filter=False, follow=["[data-url]"]),
            const_html=_FOLLOW_DATA_ATTR_HTML,
        ),
        Scenario(
            "follow_multi", [_SEED_FOOBAR],
            CrawlConfig(depth=None, domain_filter=False, follow=["a.prev", "a.next"]),
            const_html=_FOLLOW_MULTI_HTML,
        ),
        Scenario(
            "follow_disabled", [_SEED_FOOBAR], CrawlConfig(depth=None, domain_filter=False, follow=[]),
            const_html=_FOLLOW_DEFAULT_HTML,
        ),
        Scenario(
            "depth_cycle", [_SEED_EXAMPLE], CrawlConfig(depth=2, domain_filter=False),
            pages=_depth_cycle_pages(),
        ),
        Scenario(
            "domain_allow", [_SEED_EXAMPLE],
            CrawlConfig(depth=None, allowed_domains=["www.google.com"]),
            const_html=_DOMAIN_HTML,
        ),
        Scenario(
            "domain_star", [_SEED_EXAMPLE],
            CrawlConfig(depth=None, allowed_domains=["*"]),
            const_html=_DOMAIN_HTML,
        ),
        Scenario(
            "domain_block", [_SEED_EXAMPLE],
            CrawlConfig(
                depth=None, allowed_domains=["*"], blocked_domains=["www.google.com"]
            ),
            const_html=_DOMAIN_HTML,
        ),
        Scenario(
            "url_allow", ["http://www.example.com/"],
            CrawlConfig(depth=None, domain_filter=False, allowed_urls=[r"/foo\?id=\d+", r"/bar$"]),
            const_html=_URLFILTER_HTML,
        ),
        Scenario(
            "url_block", ["http://www.example.com/"],
            CrawlConfig(depth=None, domain_filter=False, blocked_urls=[r"/foo\?id=\d+", r"/bar$"]),
            const_html=_URLFILTER_HTML,
        ),
        Scenario(
            "retry_503", [_SEED_EXAMPLE],
            CrawlConfig(depth=None, domain_filter=False, retry_delays=(0.0, 0.0)),
            const_html="<html><body>oops</body></html>", const_status=503,
        ),
        Scenario(
            "extract_basic", ["https://localhost/"], CrawlConfig(depth=0, domain_filter=False),
            const_html=_EXTRACT_HTML,
        ),
        Scenario(
            "manual_follow", ["http://hn.test/"],
            CrawlConfig(depth=2, domain_filter=False, follow=[]),
            pages=_manual_follow_pages(), script=_manual_follow_script,
        ),
        Scenario(
            # follow() + auto-follow on one page: manual URLs enqueue
            # FIRST (script runs inline, followlinks is deferred)
            "manual_follow_mixed", ["http://hn.test/"],
            CrawlConfig(depth=1, domain_filter=False),
            pages=_manual_follow_pages(), script=_manual_follow_script,
        ),
    ]
}
