"""HTTP client lib (js_lib.go:57-103 get/postForm/postJSON via
jsFetch :192-224) and proxy routing (modules/proxy/proxy.go:34-61),
against real localhost servers."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flyscrape_spark.sources import client


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("X-Server", "origin")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/404":
            self._reply(404, {"gone": True})
        else:
            self._reply(200, {"path": self.path})

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(length).decode()
        self._reply(200, {
            "path": self.path,
            "content_type": self.headers.get("Content-Type", ""),
            "raw": raw,
        })


class ProxyHandler(BaseHTTPRequestHandler):
    """Minimal forward proxy: absolute-URI GET requests answered
    directly (no upstream), so a response proves proxy routing."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = json.dumps({"via": "proxy", "target": self.path}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.fixture
def origin():
    srv = _serve(Handler)
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture
def proxy():
    srv = _serve(ProxyHandler)
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_get(origin):
    r = client.get(f"{origin}/x")
    assert r["status"] == 200 and r["error"] == ""
    assert json.loads(r["body"]) == {"path": "/x"}
    assert r["headers"]["X-Server"] == "origin"


def test_get_non_2xx_is_a_response_not_error(origin):
    # jsFetch: client.Do does not error on HTTP status codes
    r = client.get(f"{origin}/404", retries=None)
    assert r["status"] == 404 and r["error"] == ""
    assert json.loads(r["body"]) == {"gone": True}


def test_get_transport_error():
    r = client.get("http://127.0.0.1:1/unreachable", retries=None, timeout=0.5)
    assert r["status"] == 0 and r["error"] != "" and r["body"] == ""


def test_post_form(origin):
    # js_lib.go:67-89: list values append one pair per element
    r = client.post_form(f"{origin}/form", {"a": 1, "tags": ["x", "y"]})
    body = json.loads(r["body"])
    assert body["content_type"] == "application/x-www-form-urlencoded"
    parsed = urllib.parse.parse_qs(body["raw"])
    assert parsed == {"a": ["1"], "tags": ["x", "y"]}


def test_post_json(origin):
    r = client.post_json(f"{origin}/j", {"k": [1, 2], "s": "v"})
    body = json.loads(r["body"])
    assert body["content_type"] == "application/json"
    assert json.loads(body["raw"]) == {"k": [1, 2], "s": "v"}


def test_client_inside_script_udf(spark, origin):
    """The reference exposes http.get INSIDE scrape scripts
    (js_lib.go:23-45); same here — executor-side call from a
    vectorized script UDF."""
    from flyscrape_spark.parse.script import make_script_udf

    def script(ctx):
        side = client.get(ctx.url.replace("/page", "/api"), retries=None)
        return {"api_status": side["status"], "api": json.loads(side["body"])}

    df = spark.createDataFrame(
        [(f"{origin}/page", "<p>x</p>")], "url string, body string"
    )
    row = df.select(make_script_udf(script)("body", "url").alias("s")).head()
    data = json.loads(row["s"]["data"])
    assert data["api_status"] == 200
    assert data["api"] == {"path": "/api"}


def test_proxy_routing_client(origin, proxy):
    r = client.get(f"{origin}/x", proxy=proxy, retries=None)
    body = json.loads(r["body"])
    assert body["via"] == "proxy"
    assert body["target"] == f"{origin}/x"  # absolute-URI through proxy


def test_proxy_rotation_http_transport(spark, proxy, origin):
    """HttpTransport with proxies: every fetch is answered by the
    proxy (deterministic per-URL pick), proving the ProxyHandler
    wiring inside the mapInPandas fetch path."""
    from flyscrape_spark.config import CrawlConfig
    from flyscrape_spark.sources.transport import HttpTransport

    config = CrawlConfig(rate=60_000.0)
    transport = HttpTransport(config, timeout=5.0, pool_size=2,
                              proxies=[proxy])
    frontier = spark.createDataFrame(
        [(f"{origin}/p1", "127.0.0.1"), (f"{origin}/p2", "127.0.0.1")],
        "url string, host string",
    )
    rows = {r["url"]: r for r in transport.fetch(frontier).collect()}
    for url, row in rows.items():
        assert row["status"] == 200
        body = json.loads(row["body"])
        assert body["via"] == "proxy" and body["target"] == url


class DownloadHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/cd":
            body = b"attached bytes"
            self.send_response(200)
            self.send_header("Content-Disposition", 'attachment; filename="report.bin"')
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/miss":
            self.send_response(404)
            self.end_headers()
        else:
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"payload:" + self.path.encode())


@pytest.fixture
def dl_origin():
    srv = _serve(DownloadHandler)
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_download_to_file_and_dir(dl_origin, tmp_path):
    logs = []
    d = client.Downloader(log=logs.append, retries=None)
    # explicit file destination
    d.download(f"{dl_origin}/a.txt", str(tmp_path / "out.txt"))
    # directory destination -> URL basename
    d.download(f"{dl_origin}/img.bin", str(tmp_path) + "/")
    # directory destination + Content-Disposition filename wins
    d.download(f"{dl_origin}/cd", str(tmp_path) + "/")
    paths = d.wait()
    assert (tmp_path / "out.txt").read_bytes() == b"payload:/a.txt"
    assert (tmp_path / "img.bin").read_bytes() == b"payload:/img.bin"
    assert (tmp_path / "report.bin").read_bytes() == b"attached bytes"
    assert sorted(p.rsplit("/", 1)[-1] for p in paths) == [
        "img.bin", "out.txt", "report.bin"]
    assert logs == []


def test_download_never_overwrites_and_logs_errors(dl_origin, tmp_path):
    logs = []
    existing = tmp_path / "keep.txt"
    existing.write_bytes(b"original")
    d = client.Downloader(log=logs.append, retries=None)
    d.download(f"{dl_origin}/keep.txt", str(existing))   # exists: skipped
    d.download(f"{dl_origin}/miss", str(tmp_path / "gone.txt"))  # 404: logged
    paths = d.wait()
    assert existing.read_bytes() == b"original"          # js_lib.go:174-176
    assert not (tmp_path / "gone.txt").exists()
    assert paths[0] == str(existing) and paths[1] is None
    assert len(logs) == 1 and "unexpected status code 404" in logs[0]
