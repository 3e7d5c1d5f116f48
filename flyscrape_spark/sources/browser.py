"""Browser-render transport slot (SURVEY §2.1 #18).

The reference's browser module (/root/reference/modules/browser/
browser.go:41-63) swaps the HTTP round-tripper for a headless-Chromium
page fetch when ``browser: true``: navigate, wait for the DOM to
settle (WaitLoad -> WaitDOMStable(300ms) -> WaitRequestIdle(1s),
browser.go:124-127), then capture ``page.HTML()`` — status/headers
come from the document's network response when one was observed, else
``200 OK`` with ``Content-Type: text/html`` (browser.go:129-152).
Request headers are forwarded EXCEPT ``Cookie`` (delivered via
``SetCookies`` instead) and the default ``flyscrape`` User-Agent
(browser.go:106-118). The ratelimit module forces ``concurrency = 1``
when the browser is enabled and no explicit concurrency is configured
(modules/ratelimit/ratelimit.go:50-52) — one Chromium, one page at a
time.

This container has no Chromium, so the REAL renderer is an explicit,
documented stub (:class:`ChromiumRenderer` raises with guidance). The
architecture slot is fully real: :class:`RenderingTransport` is a
drop-in :class:`~flyscrape_spark.sources.transport.Transport` that
routes the politeness-scheduled frontier through any
:class:`Renderer`, enforces the reference's concurrency clamp, and
applies the reference's header-forwarding rules.
:class:`FakeDomSettlingRenderer` stands in for Chromium in tests — it
deterministically models "JS inserts nodes after load" by splicing
``<script type="application/x-deferred-html">…</script>`` payloads
inline before HTML capture (script bodies are invisible to HTML
parsers, like real JS-rendered content), so a crawl through it
discovers links that plain HTTP fetch would never see — the reason
users turn ``browser: true`` on.

Scale shape: identical to HttpTransport — the frontier arrives
repartitioned by (host, shard) from the politeness scheduler, each
task owns its host shards exclusively, and the per-task renderer pool
(width = the clamped concurrency) maps to "one Chromium per executor
core" on a real cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.sources.transport import Transport, with_request_headers

# JS-deferred DOM is carried inside a script tag: script bodies are
# NOT parsed as elements by lxml/goquery, so a link in here is
# invisible to the plain HTTP fetch path — exactly like real
# JS-rendered content — until the renderer splices it into the DOM.
_DEFERRED = re.compile(
    r"<script\s+type=\"application/x-deferred-html\">(.*?)</script>",
    re.DOTALL | re.IGNORECASE,
)


class Renderer:
    """Renders one URL to settled HTML.

    ``render(url, headers, cookie)`` returns ``(status, html)``. Raise
    to signal a navigation/transport failure (mapped to an ``error``
    row with empty body, like a Go transport error in scrape.go:176-180).
    """

    def render(self, url: str, headers: dict,
               cookie: str | None = None):  # pragma: no cover
        raise NotImplementedError


class ChromiumRenderer(Renderer):
    """The real-browser slot. No Chromium/driver ships in this
    container, so constructing it raises with guidance — the honest
    equivalent of browser.go:69-82's launcher, which exits the process
    when Chromium cannot be launched."""

    def __init__(self, headless: bool = True):
        raise RuntimeError(
            "browser rendering requires a Chromium driver (the reference "
            "uses go-rod, browser.go:69-82); none is installed in this "
            "container. Supply a custom Renderer to RenderingTransport, "
            "or use FakeDomSettlingRenderer for tests."
        )


class FakeDomSettlingRenderer(Renderer):
    """Deterministic Chromium stand-in for tests and fixture crawls.

    ``pages`` maps url -> html (implied 200) or url -> (status, html)
    (the document-network-response status override of
    browser.go:141-146). The rod settle pipeline (WaitLoad ->
    WaitDOMStable -> WaitRequestIdle, browser.go:124-127) is modeled by
    materializing deferred DOM: every
    ``<script type="application/x-deferred-html">`` payload — the
    nodes a page's JS would insert after load — is spliced inline
    before HTML capture. A URL absent from ``pages`` raises, like a
    failed ``page.Navigate`` (browser.go:120-122).

    ``echo_headers=True`` appends the received headers/cookie as HTML
    comments so tests can pin the forwarding rules (Cookie excluded
    from headers, flyscrape default UA dropped) through the executor
    boundary.
    """

    def __init__(self, pages: dict, echo_headers: bool = False):
        self.pages = dict(pages)
        self.echo_headers = echo_headers

    def render(self, url: str, headers: dict, cookie: str | None = None):
        if url not in self.pages:
            raise RuntimeError(f"navigate {url}: no such host")
        page = self.pages[url]
        status, html = page if isinstance(page, tuple) else (200, page)
        html = _DEFERRED.sub(lambda m: m.group(1), html)
        if self.echo_headers:
            hdr = ";".join(f"{k}={v}" for k, v in sorted(headers.items()))
            html += f"<!--headers:{hdr}--><!--cookie:{cookie or ''}-->"
        return status, html


class RenderingTransport(Transport):
    """Transport that fetches by rendering (browser.go:41-63 slot).

    Concurrency: the reference clamps to 1 when ``browser`` is on and
    no explicit concurrency is configured (ratelimit.go:50-52); an
    explicit ``config.concurrency`` wins, exactly as there. The clamp
    is the per-task renderer pool width.
    """

    def __init__(self, renderer: Renderer, config: CrawlConfig | None = None,
                 pace: bool = True, shard_target: int | None = None):
        self.renderer = renderer
        self.config = config or CrawlConfig()
        self.concurrency = self.config.concurrency or 1
        self.pace = pace
        self.shard_target = shard_target

    def fetch(self, frontier: DataFrame) -> DataFrame:
        from pyspark.sql.types import (
            IntegerType, StringType, StructField, StructType,
        )

        from flyscrape_spark.operators.politeness import schedule

        rate = self.config.rate or 6000.0
        scheduled = schedule(
            frontier, rate_per_min=rate, shard_target=self.shard_target,
            max_fanout=self.config.max_host_fanout,
        ).drop("fanout", "host_rows", "shard", "crawl_delay")
        scheduled = with_request_headers(scheduled, self.config)

        out_schema = StructType(
            list(scheduled.schema.fields)
            + [
                StructField("status", IntegerType()),
                StructField("body", StringType()),
                StructField("error", StringType()),
                StructField("attempts", IntegerType()),
            ]
        )
        renderer = self.renderer
        conc = self.concurrency
        pace = self.pace

        def run_batches(batches):
            import time as _time
            from concurrent.futures import ThreadPoolExecutor

            start = _time.monotonic()

            def one(row):
                if pace:
                    wait = row["fetch_time"] - (_time.monotonic() - start)
                    if wait > 0:
                        _time.sleep(wait)
                raw = dict(row.get("request_headers") or {})
                # browser.go:106-118: Cookie rides SetCookies, not
                # extra headers; the default flyscrape UA is dropped so
                # Chromium presents its own
                cookie = next((v for k, v in raw.items()
                               if k.lower() == "cookie"), None)
                headers = {
                    k: v for k, v in raw.items()
                    if k.lower() != "cookie"
                    and not (k.lower() == "user-agent"
                             and str(v).startswith("flyscrape"))
                }
                try:
                    status, html = renderer.render(row["url"], headers, cookie)
                except Exception as exc:  # navigation/transport failure
                    return (0, None, f"render {row['url']}: {exc}", 1)
                error = (None if 200 <= status < 300
                         else f"{status} error")
                return (status, html, error, 1)

            with ThreadPoolExecutor(max_workers=conc) as pool:
                for pdf in batches:
                    results = list(pool.map(one, pdf.to_dict("records")))
                    pdf = pdf.copy()
                    pdf["status"] = [r[0] for r in results]
                    pdf["body"] = [r[1] for r in results]
                    pdf["error"] = [r[2] for r in results]
                    pdf["attempts"] = [r[3] for r in results]
                    yield pdf

        return scheduled.mapInPandas(run_batches, schema=out_schema)
