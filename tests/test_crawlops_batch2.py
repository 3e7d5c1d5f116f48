"""Crawl-ops batch 2: snapshot churn diff, charset declaration audit,
sitemap-index round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from flyscrape_spark.operators.encoding import charset_audit
from flyscrape_spark.operators.recrawl import crawl_diff
from flyscrape_spark.sources.sitemaps import parse_sitemap_index


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url string, content_hash string"
    )


def test_crawl_diff_statuses(spark):
    old = _snap(spark, [
        ("h", "u1", "a"),     # unchanged
        ("h", "u2", "b"),     # changed
        ("h", "u3", "c"),     # gone
    ])
    new = _snap(spark, [
        ("h", "u1", "a"),
        ("h", "u2", "B"),
        ("h", "u4", "d"),     # new
    ])
    r = crawl_diff(old, new).collect()[0]
    assert (r["n_urls"], r["n_new"], r["n_gone"], r["n_changed"],
            r["n_unchanged"]) == (4, 1, 1, 1, 1)
    assert r["churn_rate"] == 0.75


def test_crawl_diff_null_hash_presence(spark):
    """A URL present in BOTH snapshots with a NULL hash on one side is
    CHANGED (not new/gone); NULL-vs-NULL is unchanged; presence still
    decides new/gone."""
    old = _snap(spark, [
        ("h", "u1", None),    # present both, hash appeared -> changed
        ("h", "u2", None),    # present both, NULL both -> unchanged
        ("h", "u3", "c"),     # present both, hash vanished -> changed
    ])
    new = _snap(spark, [
        ("h", "u1", "a"),
        ("h", "u2", None),
        ("h", "u3", None),
        ("h", "u4", None),    # only in new (NULL hash) -> new
    ])
    r = crawl_diff(old, new).collect()[0]
    assert (r["n_urls"], r["n_new"], r["n_gone"], r["n_changed"],
            r["n_unchanged"]) == (4, 1, 0, 2, 1)


def test_crawl_diff_host_isolation(spark):
    old = _snap(spark, [("h1", "u1", "a")])
    new = _snap(spark, [("h2", "u2", "b")])
    out = {r["host"]: r for r in crawl_diff(old, new).collect()}
    assert out["h1"]["n_gone"] == 1 and out["h2"]["n_new"] == 1


def test_charset_audit_variants(spark):
    pages = spark.createDataFrame(
        [
            # header+meta agree (case/quoting variants normalize)
            ("h", 'text/html; CHARSET="UTF-8"',
             '<head><meta charset=utf-8></head>'),
            # disagree
            ("h", "text/html; charset=utf-8",
             '<head><meta charset="iso-8859-1"></head>'),
            # legacy http-equiv form only
            ("h", "text/html",
             '<head><meta http-equiv="Content-Type" content="text/html; '
             'charset=windows-1252"></head>'),
            # nothing declared
            ("h", "text/html", "<head></head>"),
        ],
        "host string, content_type string, html string",
    )
    r = charset_audit(pages).collect()[0]
    assert (r["n_pages"], r["n_header"], r["n_meta"], r["n_mismatch"],
            r["n_undeclared"]) == (4, 2, 3, 1, 1)
    assert r["mismatch_rate"] == 0.25


def test_parse_sitemap_index_roundtrip(spark):
    xml = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://h.example/sm/1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://h.example/sm/2.xml</loc></sitemap>"
        "<sitemap><lastmod>no-loc-dropped</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("h.example", xml)], "host string, xml string"
    )
    rows = sorted(
        parse_sitemap_index(df).collect(), key=lambda r: r["sitemap_url"]
    )
    assert [(r["sitemap_url"], r["lastmod"]) for r in rows] == [
        ("https://h.example/sm/1.xml", "2026-02-01"),
        ("https://h.example/sm/2.xml", None),
    ]
