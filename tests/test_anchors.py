"""Anchor-text aggregation (operators/anchors.py): target
absolutization, per-target stats, and the deterministic anchor cap."""

import pytest

from flyscrape_spark.operators.anchors import anchor_stats

SCHEMA = (
    "url string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _page(url, links):
    return (url, [("link", t, h, i) for i, (t, h) in enumerate(links)])


@pytest.fixture
def parsed(spark):
    rows = [
        _page("http://a.test/1", [("home", "http://t.test/x"),
                                  ("root", "/x")]),
        _page("https://b.test/2", [("xref", "http://t.test/x"),
                                   ("mail", "mailto:z@z"),
                                   ("rel", "sub/page"),
                                   ("rootb", "/x")]),
        _page("http://a.test/3", [("home", "http://t.test/x")]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_targets_and_stats(parsed):
    out = {r["target_url"]: r for r in anchor_stats(parsed).collect()}
    # mailto: and non-root-relative hrefs are dropped by this operator
    assert set(out) == {"http://t.test/x", "http://a.test/x",
                        "https://b.test/x"}
    hub = out["http://t.test/x"]
    assert hub["n_inlinks"] == 3
    assert hub["n_src_hosts"] == 2  # a.test (twice) + b.test
    assert hub["anchors"] == "home,xref"  # distinct, sorted
    # root-relative resolves against the page's scheme+host
    assert out["https://b.test/x"]["n_inlinks"] == 1
    assert out["https://b.test/x"]["anchors"] == "rootb"


def test_anchor_cap_is_alphabetical_prefix(spark):
    links = [(f"t{i}", "http://t.test/hub") for i in range(10)]
    df = spark.createDataFrame([_page("http://s.test/", links)], SCHEMA)
    out = anchor_stats(df, max_anchors=3).collect()[0]
    assert out["anchors"] == "t0,t1,t2"
    assert out["n_inlinks"] == 10  # the cap bounds anchors, not counts
