"""Web feeds: RSS 2.0 / Atom parsing (sources/feeds.py) and the
feed-driven planning operators (operators/feeds.py).

The reference has no feed channel (it seeds from config URLs only,
/root/reference/modules/starturl/starturl.go:27-35); these pin the
engine-added discovery path: RFC-822 date normalization variants,
Atom link-rel selection, per-host seed ranking, cadence math."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flyscrape_spark.operators.feeds import (
    feed_cadence,
    feed_discovery,
    feed_seeds,
)
from flyscrape_spark.sources.feeds import parse_atom, parse_rss

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>Blog</title><link>https://h1.example/</link>
<item><title>A</title><link>https://h1.example/post/1</link>
  <guid>g1</guid><pubDate>Mon, 05 Jan 2026 10:30:00 +0000</pubDate></item>
<item><title>B</title><link> https://h1.example/post/2 </link>
  <pubDate>06 Feb 2026 11:00:00 GMT</pubDate></item>
<item><title>zone</title><link>https://h1.example/post/3</link>
  <pubDate>Wed, 11 Mar 2026 23:59:59 EST</pubDate></item>
<item><title>bad date</title><link>https://h1.example/post/4</link>
  <pubDate>yesterday-ish</pubDate></item>
<item><title>no link</title><guid>skip-me</guid></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>Blog</title>
<entry><title>A</title><id>tag:1</id>
  <published>2026-01-05T10:30:00Z</published>
  <updated>2026-01-06T00:00:00Z</updated>
  <link rel="self" href="https://h2.example/atom.xml"/>
  <link rel="alternate" href="https://h2.example/a"/></entry>
<entry><title>B</title><id>tag:2</id>
  <updated>2026-02-06T11:00:00Z</updated>
  <link href="https://h2.example/b"/></entry>
<entry><title>enclosure only</title><id>tag:3</id>
  <updated>2026-03-01T00:00:00Z</updated>
  <link rel="enclosure" href="https://cdn.example/x.mp3"/></entry>
</feed>"""


def _feed_df(spark, xml):
    return spark.createDataFrame(
        [("https://h.example/feed", xml)], "feed_url string, xml string"
    )


def test_parse_rss_rows(spark):
    rows = {
        r["link"]: r
        for r in parse_rss(_feed_df(spark, RSS)).collect()
    }
    # item with no <link> is dropped
    assert set(rows) == {f"https://h1.example/post/{i}" for i in (1, 2, 3, 4)}
    a = rows["https://h1.example/post/1"]
    assert (a["guid"], a["title"], a["position"]) == ("g1", "A", 0)
    assert a["pub_ts"] == dt.datetime(2026, 1, 5, 10, 30)
    # weekdayless date + GMT zone name both normalize; link whitespace trims
    assert rows["https://h1.example/post/2"]["pub_ts"] == dt.datetime(
        2026, 2, 6, 11
    )
    # named zone converts to UTC (EST = -0500)
    assert rows["https://h1.example/post/3"]["pub_ts"] == dt.datetime(
        2026, 3, 12, 4, 59, 59
    )
    # unparseable pubDate -> NULL, row kept
    assert rows["https://h1.example/post/4"]["pub_ts"] is None


def test_parse_atom_link_selection(spark):
    rows = {r["guid"]: r for r in parse_atom(_feed_df(spark, ATOM)).collect()}
    # rel=alternate wins over rel=self; published wins over updated
    assert rows["tag:1"]["link"] == "https://h2.example/a"
    assert rows["tag:1"]["pub_ts"] == dt.datetime(2026, 1, 5, 10, 30)
    # bare href (no rel) is the default alternate
    assert rows["tag:2"]["link"] == "https://h2.example/b"
    assert rows["tag:2"]["pub_ts"] == dt.datetime(2026, 2, 6, 11)
    # enclosure-only entry still yields its only link (last coalesce arm)
    assert rows["tag:3"]["link"] == "https://cdn.example/x.mp3"


def test_feed_discovery_orders_and_dedup(spark):
    html = (
        '<head><link rel="stylesheet" href="/main.css">'
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
        '<link href="/atom.xml" rel="alternate" type="application/atom+xml">'
        # same feed advertised twice with different markup -> one row
        '<link href="/feed.xml" type="application/rss+xml"></head>'
    )
    rows = sorted(
        feed_discovery(
            spark.createDataFrame(
                [("https://h.example/p", html)], "url string, html string"
            )
        ).collect()
    )
    assert [(r["feed_url"], r["feed_type"]) for r in rows] == [
        ("/atom.xml", "atom"),
        ("/feed.xml", "rss"),
    ]


def test_feed_seeds_rank_dedup_and_cap(spark):
    entries = parse_rss(_feed_df(spark, RSS)).unionByName(
        parse_atom(_feed_df(spark, ATOM))
    )
    seeds = {
        (r["host"], r["link"]): r["seed_rank"]
        for r in feed_seeds(entries, per_host_cap=2).collect()
    }
    # per-host cap of 2, ranked by recency; h1's newest are post/3
    # (Mar 12) then post/2 (Feb 6); h2's are tag:2 (Feb 6) then tag:1
    assert seeds == {
        ("h1.example", "https://h1.example/post/3"): 1,
        ("h1.example", "https://h1.example/post/2"): 2,
        ("h2.example", "https://h2.example/b"): 1,
        ("h2.example", "https://h2.example/a"): 2,
        ("cdn.example", "https://cdn.example/x.mp3"): 1,
    }


def test_feed_seeds_newest_pub_wins_dedup(spark):
    entries = spark.createDataFrame(
        [
            ("f", "https://h.example/a", dt.datetime(2026, 1, 1)),
            ("g", "https://h.example/a", dt.datetime(2026, 2, 1)),
        ],
        "feed_url string, link string, pub_ts timestamp",
    )
    rows = feed_seeds(entries).collect()
    assert len(rows) == 1
    assert rows[0]["pub_ts"] == dt.datetime(2026, 2, 1)


def test_feed_cadence_math(spark):
    base = dt.datetime(2026, 1, 1)
    entries = spark.createDataFrame(
        [
            # gaps 3600s and 7200s -> median 5400 -> interval 2700
            ("f", "u1", base),
            ("f", "u2", base + dt.timedelta(hours=1)),
            ("f", "u3", base + dt.timedelta(hours=3)),
            # single dated entry -> no gaps -> max interval
            ("g", "v1", base),
            # undated entries count but contribute no gaps
            ("g", "v2", None),
        ],
        "feed_url string, link string, pub_ts timestamp",
    )
    rows = {r["feed_url"]: r for r in feed_cadence(entries).collect()}
    f = rows["f"]
    assert (f["n_entries"], f["median_gap_s"], f["fetch_interval_s"]) == (
        3, 5400.0, 2700,
    )
    assert (f["first_ts"], f["last_ts"]) == (
        base, base + dt.timedelta(hours=3),
    )
    g = rows["g"]
    assert (g["n_entries"], g["median_gap_s"], g["fetch_interval_s"]) == (
        2, None, 86400,
    )


def test_feed_cadence_clamps(spark):
    base = dt.datetime(2026, 1, 1)
    fast = [("f", f"u{i}", base + dt.timedelta(seconds=10 * i))
            for i in range(5)]
    slow = [("s", f"v{i}", base + dt.timedelta(days=30 * i))
            for i in range(3)]
    entries = spark.createDataFrame(
        fast + slow, "feed_url string, link string, pub_ts timestamp"
    )
    rows = {r["feed_url"]: r for r in feed_cadence(entries).collect()}
    assert rows["f"]["fetch_interval_s"] == 900  # clamped up from 5s
    assert rows["s"]["fetch_interval_s"] == 86400  # clamped down


def test_feeds_no_python_in_plan(spark):
    df = parse_rss(_feed_df(spark, RSS))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
