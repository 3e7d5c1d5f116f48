"""WARC ingest tests: record framing round trip (plain + per-record
gzip members), HTTP parsing, non-response skipping, truncation safety,
and the Spark blob reader/writer pair."""

from flyscrape_spark.sources.warc import (
    build_warc, iter_warc_records, pages_to_warc, parse_http_response,
    read_warc_blobs,
)
from tests.conftest import spark  # noqa: F401

PAGES = [
    ("http://a.test/", 200, "<p>hello</p>"),
    ("http://a.test/x", 404, "not here"),
    ("http://b.test/æøå", 200, "unicode: ☃ body"),
]


def _roundtrip(compress):
    blob = build_warc(PAGES, compress=compress)
    out = []
    for _off, headers, payload in iter_warc_records(blob):
        assert headers["warc-type"] == "response"
        status, ctype, body = parse_http_response(payload)
        out.append((headers["warc-target-uri"], status,
                    body.decode("utf-8")))
    assert out == PAGES
    return blob


def test_roundtrip_plain():
    _roundtrip(compress=False)


def test_roundtrip_gzip_members():
    blob = _roundtrip(compress=True)
    assert blob[:2] == b"\x1f\x8b"


def test_deterministic_bytes():
    assert build_warc(PAGES) == build_warc(PAGES)


def test_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
    )
    blob = info + build_warc(PAGES[:1], compress=False)
    kinds = [h["warc-type"] for _o, h, _p in iter_warc_records(blob)]
    assert kinds == ["warcinfo", "response"]


def test_truncated_blob_stops_cleanly():
    blob = build_warc(PAGES, compress=False)
    recs = list(iter_warc_records(blob[: len(blob) // 2]))
    assert 0 < len(recs) < len(PAGES) + 1  # no exception, partial ok


def test_garbage_blob_yields_nothing():
    assert list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope")) == []


def test_spark_write_read_pair(spark):  # noqa: F811
    rows = [(f"http://h{i % 3}.test/{i}", "h%d" % (i % 3), 200,
             f"<p>doc {i}</p>") for i in range(50)]
    pages = spark.createDataFrame(
        rows, "url string, host string, status int, html string")
    blobs = pages_to_warc(pages, group_col="host")
    assert blobs.count() == 3
    back = read_warc_blobs(blobs, content_col="warc")
    got = sorted((r["url"], r["status"], r["html"])
                 for r in back.collect())
    want = sorted((u, s, h) for u, _host, s, h in rows)
    assert got == want
