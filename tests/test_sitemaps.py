"""Sitemap ingestion + seed planning — hand-authored XML pinned
block by block: the from_xml parser's optional-field handling
(sources/sitemaps.py), the robots.txt discovery composition
(operators/robots.py + canonicalize), and the per-host prioritized
seed ranking (operators/sitemaps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flyscrape_spark.operators.sitemaps import sitemap_seeds
from flyscrape_spark.sources.sitemaps import (
    parse_sitemap_index,
    parse_sitemaps,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example/one </loc>
    <lastmod>2026-02-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc>https://a.example/two</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

_INDEX = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>https://a.example/s1.xml</loc>
    <lastmod>2026-03-01</lastmod></sitemap>
  <sitemap><loc>https://a.example/s2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "sitemap_url string, xml string")


def test_parse_urlset_optional_fields(spark):
    out = parse_sitemaps(
        _df(spark, [("https://a.example/sitemap.xml", _URLSET)]),
        host_col="sitemap_url",
    ).collect()
    # the loc-less third block is dropped (spec: loc is required)
    assert len(out) == 2
    by_loc = {r["url"]: r for r in out}
    # pretty-printed whitespace around <loc> is trimmed
    one = by_loc["https://a.example/one"]
    assert one["lastmod"] == "2026-02-01"
    assert one["changefreq"] == "daily"
    assert one["priority"] == 0.9
    two = by_loc["https://a.example/two"]
    assert two["lastmod"] is None
    assert two["changefreq"] is None
    assert two["priority"] == 0.5   # protocol default


def test_parse_index(spark):
    out = parse_sitemap_index(
        _df(spark, [("https://a.example/sitemap.xml", _INDEX)]),
        host_col="sitemap_url",
    ).collect()
    assert [(r["sitemap_url"], r["lastmod"]) for r in sorted(
        out, key=lambda r: r["sitemap_url"]
    )] == [
        ("https://a.example/s1.xml", "2026-03-01"),
        ("https://a.example/s2.xml", None),
    ]


def test_robots_sitemap_discovery_composition(spark):
    """robots.txt Sitemap: lines -> canonicalized sitemap URLs — the
    documented discovery path (sitemap_directives + canonicalize)."""
    from flyscrape_spark.functions.urls import canonicalize
    from flyscrape_spark.operators.robots import sitemap_directives

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "SITEMAP: HTTPS://A.Example/sitemap.xml\n"
        "  sitemap:\thttps://a.example/news.xml  \n"
        "# sitemap: https://a.example/commented-out.xml is prose\n"
    )
    df = spark.createDataFrame(
        [("a.example", body)], "host string, body string"
    )
    out = sorted(
        (r["host"], r["sitemap_loc"])
        for r in sitemap_directives(df)
        .select("host", canonicalize(F.col("sitemap_url")).alias("sitemap_loc"))
        .collect()
    )
    assert out == [
        ("a.example", "https://a.example/news.xml"),
        ("a.example", "https://a.example/sitemap.xml"),
    ]


def test_seed_ranking_dedup_and_cap(spark):
    def urlset(entries):
        body = "".join(
            f"<url><loc>{loc}</loc>"
            + (f"<priority>{p}</priority>" if p is not None else "")
            + (f"<lastmod>{lm}</lastmod>" if lm else "")
            + "</url>"
            for loc, p, lm in entries
        )
        return f"<urlset>{body}</urlset>"

    # two sitemaps on one host repeat a loc: max priority/lastmod win;
    # the first loc needs canonicalizing (case, default port, fragment)
    xml_a = urlset([
        ("HTTPS://H.Example:443/p1#frag", 0.3, "2026-01-01"),
        ("https://h.example/p2", None, None),        # default 0.5
        ("https://h.example/p3", 0.9, None),
    ])
    xml_b = urlset([
        ("https://h.example/p1", 0.8, "2026-02-02"),
        ("https://other.example/q", 0.1, None),
    ])
    df = _df(spark, [
        ("https://h.example/s_a.xml", xml_a),
        ("https://h.example/s_b.xml", xml_b),
    ])
    out = sitemap_seeds(df, per_host_cap=2).collect()
    by_host = {}
    for r in sorted(out, key=lambda r: (r["host"], r["seed_rank"])):
        by_host.setdefault(r["host"], []).append(
            (r["loc"], r["priority"], r["lastmod"], r["seed_rank"])
        )
    # h.example: p3 (0.9) then merged p1 (0.8, newest lastmod); p2
    # (0.5) falls past the cap
    assert by_host["h.example"] == [
        ("https://h.example/p3", 0.9, None, 1),
        ("https://h.example/p1", 0.8, "2026-02-02", 2),
    ]
    assert by_host["other.example"] == [
        ("https://other.example/q", 0.1, None, 1),
    ]
