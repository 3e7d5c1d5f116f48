"""Real-network fetch path: HttpTransport against a localhost HTTP
server — end-to-end crawl (engine -> politeness schedule ->
mapInPandas thread pool -> urllib -> retry loop) with no mocked
transport."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.transport import HttpTransport


class Handler(BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        pages = {
            "/": '<a href="/a">a</a><a href="/flaky">f</a><a href="/missing">m</a>',
            "/a": "<p>leaf</p>",
        }
        if self.path == "/flaky":
            Handler.flaky_hits += 1
            if Handler.flaky_hits < 3:
                self.send_response(503)
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
            body = b"<p>finally</p>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path in pages:
            body = pages[self.path].encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture
def server():
    Handler.flaky_hits = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_crawl_end_to_end(spark, server):
    config = CrawlConfig(
        depth=1, domain_filter=False, rate=60_000.0,
        retry_delays=(0.05, 0.1),
    )
    transport = HttpTransport(config, timeout=5.0, pool_size=4)
    r = CrawlEngine(spark, config, transport).run([f"{server}/"])

    rows = {row["url"]: row for row in r.results.collect()}
    assert rows[f"{server}/"]["status"] == 200
    assert rows[f"{server}/a"]["status"] == 200
    assert [s["kind"] for s in rows[f"{server}/a"]["spans"]] == ["text"]

    # retry loop: 2x 503 (Retry-After: 0) then 200 on attempt 3
    flaky = rows[f"{server}/flaky"]
    assert flaky["status"] == 200
    assert flaky["attempts"] == 3
    assert flaky["error"] is None

    # 404: error recorded, body still parsed (deferred ReceiveResponse
    # semantics, scrape.go:170-176)
    missing = rows[f"{server}/missing"]
    assert missing["status"] == 404
    assert missing["error"] == "404 error"

    # links extracted from the real fetch fed generation 1
    seen = {row["url"] for row in r.seen.collect()}
    assert seen == {f"{server}/", f"{server}/a", f"{server}/flaky",
                    f"{server}/missing"}


class RevalHandler(BaseHTTPRequestHandler):
    """ETag'd page: 304 when If-None-Match matches, else 200 + body.
    Counts how many full bodies were served."""

    etag = '"v1"'
    full_serves = 0
    conditional_seen = 0

    def log_message(self, *a):
        pass

    def do_GET(self):
        inm = self.headers.get("If-None-Match")
        if inm is not None:
            RevalHandler.conditional_seen += 1
        if inm == RevalHandler.etag:
            self.send_response(304)
            self.send_header("ETag", RevalHandler.etag)
            self.end_headers()
            return
        RevalHandler.full_serves += 1
        body = b"<p>fresh body</p>"
        self.send_response(200)
        self.send_header("ETag", RevalHandler.etag)
        self.send_header("Last-Modified", "Mon, 01 Jan 2026 00:00:00 GMT")
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def reval_server():
    RevalHandler.full_serves = 0
    RevalHandler.conditional_seen = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), RevalHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_conditional_revalidation_304(spark, reval_server):
    from pyspark.sql import functions as F

    from flyscrape_spark.sources.transport import RevalidatingTransport

    cfg = CrawlConfig()
    frontier = spark.createDataFrame(
        [(f"{reval_server}/page", "127.0.0.1", 0)],
        "url string, host string, depth int",
    )
    # first crawl: full fetch captures the validators
    first = HttpTransport(cfg, pace=False).fetch(frontier).collect()[0]
    assert first["status"] == 200 and first["body"] == "<p>fresh body</p>"
    assert first["etag"] == '"v1"'
    assert first["last_modified"] == "Mon, 01 Jan 2026 00:00:00 GMT"
    assert RevalHandler.full_serves == 1

    # second crawl revalidates: 304 answered from the stored body
    prior = spark.createDataFrame(
        [(first["url"], first["etag"], first["last_modified"], first["body"])],
        "url string, etag string, last_modified string, body string",
    )
    reval = RevalidatingTransport(HttpTransport(cfg, pace=False), prior)
    second = reval.fetch(frontier).collect()[0]
    assert second["not_modified"] is True
    assert second["status"] == 200
    assert second["body"] == "<p>fresh body</p>"
    assert second["etag"] == '"v1"'
    assert RevalHandler.full_serves == 1        # no second body transfer
    assert RevalHandler.conditional_seen >= 1   # validator actually sent


def test_revalidation_changed_page_refetches(spark, reval_server):
    from flyscrape_spark.sources.transport import RevalidatingTransport

    cfg = CrawlConfig()
    frontier = spark.createDataFrame(
        [(f"{reval_server}/page", "127.0.0.1", 0)],
        "url string, host string, depth int",
    )
    # stale validator: server's etag is "v1", ours is "v0" -> full 200
    prior = spark.createDataFrame(
        [(f"{reval_server}/page", '"v0"', None, "<p>stale</p>")],
        "url string, etag string, last_modified string, body string",
    )
    out = RevalidatingTransport(HttpTransport(cfg, pace=False), prior) \
        .fetch(frontier).collect()[0]
    assert out["not_modified"] is False
    assert out["status"] == 200 and out["body"] == "<p>fresh body</p>"
    # frontier rows with NO prior entry fetch unconditionally
    frontier2 = spark.createDataFrame(
        [(f"{reval_server}/page", "127.0.0.1", 0)],
        "url string, host string, depth int",
    )
    empty_prior = spark.createDataFrame(
        [], "url string, etag string, last_modified string, body string",
    )
    out2 = RevalidatingTransport(HttpTransport(cfg, pace=False), empty_prior) \
        .fetch(frontier2).collect()[0]
    assert out2["status"] == 200 and out2["not_modified"] is False


# ------------------------------------------------- per-host pacing


class PacedHandler(BaseHTTPRequestHandler):
    """Records (Host header, monotonic arrival) per request."""

    arrivals: list = []

    def log_message(self, *a):
        pass

    def do_GET(self):
        import time as _t

        PacedHandler.arrivals.append(
            (self.headers.get("Host", "?"), _t.monotonic()))
        body = b"<p>ok</p>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def paced_server():
    PacedHandler.arrivals = []
    srv = ThreadingHTTPServer(("0.0.0.0", 0), PacedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_port
    srv.shutdown()


def test_per_host_pacing_under_real_io(spark, paced_server):
    """Round-4 pin for the clock-anchor fix: the fetch_time offsets
    are awaited relative to FIRST BATCH ARRIVAL (not generator
    creation — the JVM's schedule shuffle used to consume the first
    ~0.3s of offsets, collapsing pacing into a same-host burst), plus
    the per-host client-side floor. 127.0.0.x loopback addresses are
    distinct politeness keys on one listener."""
    interval = 0.15
    hosts, pages = 3, 4
    seeds = [
        f"http://127.0.0.{h + 2}:{paced_server}/h{h}/p{p}"
        for h in range(hosts) for p in range(pages)
    ]
    cfg = CrawlConfig(depth=0, domain_filter=False,
                      rate=60.0 / interval, retry_delays=(0.05,))
    r = CrawlEngine(spark, cfg,
                    HttpTransport(cfg, timeout=5.0, pool_size=32),
                    collect_metrics=False).run(seeds)
    assert r.results.filter("status = 200").count() == hosts * pages

    from collections import defaultdict

    per_host = defaultdict(list)
    for host, ts in PacedHandler.arrivals:
        per_host[host].append(ts)
    assert len(per_host) == hosts
    for host, ts in per_host.items():
        assert len(ts) == pages
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        # no same-host burst: every arrival gap well above the
        # pre-fix ~1ms collapse (50% allowance covers accept-queue
        # jitter on a loaded box)
        assert min(gaps) > 0.5 * interval, (host, gaps)
        # sustained per-host rate within budget (+20% jitter allowance)
        span = ts[-1] - ts[0]
        assert (pages - 1) / span <= 1.2 / interval, (host, span)
