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
