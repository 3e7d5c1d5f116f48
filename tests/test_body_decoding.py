"""Body decoding: charset + Content-Encoding handling in the real
fetch path (round-3 verdict item #1). The reference gets both free
from Go's net/http + goquery (/root/reference/scrape.go:178-196);
this engine's equivalent is ``decode_body`` wired into
``_http_fetch_one``. Unit tests cover the decode matrix; the
end-to-end test crawls a localhost server that serves ISO-8859-1,
Shift-JIS and gzip pages and asserts byte-exact span text."""

import gzip
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.transport import HttpTransport, decode_body


# ------------------------------------------------------- unit matrix


def test_charset_from_content_type_header():
    raw = "café ±".encode("iso-8859-1")
    assert decode_body(raw, "text/html; charset=ISO-8859-1") == "café ±"


def test_charset_quoted_and_mixed_case():
    raw = "café".encode("iso-8859-1")
    assert decode_body(raw, 'text/html; CHARSET="iso-8859-1"') == "café"


def test_shift_jis_header():
    raw = "日本語テスト".encode("shift_jis")
    assert decode_body(raw, "text/html; charset=Shift_JIS") == "日本語テスト"


def test_html5_meta_charset_sniff():
    body = '<html><head><meta charset="iso-8859-1"></head>' \
           "<body>café</body></html>"
    raw = body.encode("iso-8859-1")
    assert decode_body(raw, "text/html") == body


def test_html5_meta_http_equiv_sniff():
    body = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1"></head>'
            "<body>café</body></html>")
    raw = body.encode("iso-8859-1")
    assert decode_body(raw, None) == body


def test_meta_sniff_limited_to_prescan_window():
    # a charset declaration past the 1024-byte prescan window is
    # ignored (the HTML5 rule) -> utf-8 fallback
    body = "<html>" + "x" * 1100 + '<meta charset="iso-8859-1">café'
    raw = body.encode("utf-8")
    assert decode_body(raw, "text/html") == body


def test_bom_wins_over_default():
    raw = b"\xef\xbb\xbf" + "café".encode("utf-8")
    assert decode_body(raw, "text/html") == "café"  # BOM stripped


def test_unknown_charset_label_falls_back_to_utf8():
    raw = "café".encode("utf-8")
    assert decode_body(raw, "text/html; charset=bogus-9") == "café"


def test_default_utf8_replace():
    assert decode_body(b"ok \xff", "text/html") == "ok �"


def test_gzip_content_encoding():
    raw = gzip.compress("café".encode("utf-8"))
    assert decode_body(raw, "text/html; charset=utf-8", "gzip") == "café"


def test_gzip_then_charset():
    raw = gzip.compress("café".encode("iso-8859-1"))
    assert decode_body(raw, "text/html; charset=iso-8859-1", "gzip") == "café"


def test_deflate_zlib_wrapped():
    raw = zlib.compress(b"hello deflate")
    assert decode_body(raw, None, "deflate") == "hello deflate"


def test_deflate_raw_rfc1951():
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw = co.compress(b"raw deflate") + co.flush()
    assert decode_body(raw, None, "deflate") == "raw deflate"


def test_undeclared_gzip_magic_sniff():
    # server gzips regardless of Accept-Encoding and sends no
    # Content-Encoding header: magic bytes catch it
    raw = gzip.compress(b"forced gzip body")
    assert decode_body(raw, "text/html", None) == "forced gzip body"


def test_identity_and_unknown_encodings_pass_through():
    assert decode_body(b"plain", None, "identity") == "plain"
    assert decode_body(b"plain", None, "br") == "plain"


def test_chained_encodings_reverse_order():
    raw = gzip.compress(b"chained")
    assert decode_body(raw, None, "identity, gzip") == "chained"


def test_truncated_gzip_degrades_not_raises():
    raw = gzip.compress(b"x" * 100)[:10]
    out = decode_body(raw, "text/html; charset=utf-8", "gzip")
    assert isinstance(out, str)


# ------------------------------------------------- end-to-end crawl


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/":
            body = ('<a href="/latin1">l</a><a href="/gz">g</a>'
                    '<a href="/sjis">s</a><a href="/forced">f</a>'
                    '<a href="/meta">m</a>').encode()
            self._send(body, "text/html; charset=utf-8")
        elif self.path == "/latin1":
            self._send("<p>café crémeux ±</p>".encode("iso-8859-1"),
                       "text/html; charset=ISO-8859-1")
        elif self.path == "/sjis":
            self._send("<p>日本語のページ</p>".encode("shift_jis"),
                       "text/html; charset=Shift_JIS")
        elif self.path == "/gz":
            # honors Accept-Encoding: gzip (the transport advertises it)
            assert "gzip" in self.headers.get("Accept-Encoding", "")
            body = gzip.compress("<p>gzippé</p>".encode("utf-8"))
            self._send(body, "text/html; charset=utf-8",
                       encoding="gzip")
        elif self.path == "/forced":
            # gzip with NO Content-Encoding header (misconfigured
            # server): magic-byte sniff must still recover the text
            body = gzip.compress(b"<p>forced</p>")
            self._send(body, "text/html; charset=utf-8")
        elif self.path == "/meta":
            # no charset in Content-Type; HTML5 meta prescan applies
            body = ('<html><head><meta charset="iso-8859-1"></head>'
                    "<body><p>métadonnée</p></body></html>"
                    ).encode("iso-8859-1")
            self._send(body, "text/html")
        else:
            self.send_response(404)
            self.end_headers()

    def _send(self, body, ctype, encoding=None):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        if encoding:
            self.send_header("Content-Encoding", encoding)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_charset_and_encoding_end_to_end(spark, server):
    """Byte-exact span text through the full engine: politeness
    schedule -> mapInPandas thread pool -> urllib -> decode_body ->
    parse UDF -> spans."""
    config = CrawlConfig(
        depth=1, domain_filter=False, rate=60_000.0,
        retry_delays=(0.05,),
    )
    transport = HttpTransport(config, timeout=5.0, pool_size=4)
    r = CrawlEngine(spark, config, transport).run([f"{server}/"])

    texts = {
        row["url"]: [s["text"] for s in row["spans"] if s["kind"] == "text"]
        for row in r.results.collect()
    }
    assert texts[f"{server}/latin1"] == ["café crémeux ±"]
    assert texts[f"{server}/sjis"] == ["日本語のページ"]
    assert texts[f"{server}/gz"] == ["gzippé"]
    assert texts[f"{server}/forced"] == ["forced"]
    assert texts[f"{server}/meta"] == ["métadonnée"]
