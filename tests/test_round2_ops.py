"""Round-2 session-2 operators: PII scrub (operators/pii.py),
per-host crawl budget (operators/politeness.host_budget) and
per-source length quantiles (operators/mixing.source_length_quantiles)."""

import pytest

from flyscrape_spark.operators.mixing import source_length_quantiles
from flyscrape_spark.operators.pii import pii_scrub
from flyscrape_spark.operators.politeness import host_budget


@pytest.fixture
def pii_docs(spark):
    rows = [
        (0, "mail me at alice.smith+spam@corp.example.org thanks"),
        (1, "server at 10.0.255.7 and 192.168.1.1 rebooted"),
        (2, "call +1 (415) 555-0199 or 020 7946 0958 today"),
        (3, "bob@ex.io from 8.8.8.8 dial 555-123-4567 now"),
        (4, "clean text with no personal data at all"),
        (5, "version 1.2.3 is not an ip, nor is 1.2.3.4.5 clean"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(pii_docs):
    out = {r["doc_id"]: r for r in pii_scrub(pii_docs).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 0
    assert "<EMAIL>" in out[0]["redacted"]
    assert "alice" not in out[0]["redacted"]
    assert out[1]["n_ips"] == 2 and out[1]["redacted"].count("<IP>") == 2
    assert out[2]["n_phones"] == 2
    assert "<PHONE>" in out[2]["redacted"]
    # mixed row: one of each, redacted in email -> ip -> phone order
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (1, 1, 1)
    assert out[4]["redacted"] == pii_docs.collect()[4]["text"] or out[4][
        "n_emails"
    ] + out[4]["n_ips"] + out[4]["n_phones"] == 0


def test_pii_clean_text_unchanged(pii_docs):
    row = pii_scrub(pii_docs.filter("doc_id = 4")).head()
    assert row["redacted"] == "clean text with no personal data at all"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (0, 0, 0)


def test_pii_version_string_not_ip(pii_docs):
    # "1.2.3" must not match the dotted-quad pattern; "1.2.3.4.5" has
    # no \b-delimited 4-octet run either engine would accept the same
    # way, so just assert cross-consistency of count vs redaction
    row = pii_scrub(pii_docs.filter("doc_id = 5")).head()
    assert row["redacted"].count("<IP>") == row["n_ips"]
    assert "1.2.3 is not an ip" in row["redacted"] or row["n_ips"] > 0


@pytest.fixture
def frontier(spark):
    # host a: 5 urls across depths, host b: 2 urls
    rows = [
        ("http://a/1", "a", 1), ("http://a/2", "a", 0), ("http://a/3", "a", 0),
        ("http://a/4", "a", 2), ("http://a/5", "a", 1),
        ("http://b/1", "b", 0), ("http://b/2", "b", 3),
    ]
    return spark.createDataFrame(rows, "url string, host string, depth int")


def test_host_budget_caps_and_orders(frontier):
    out = host_budget(frontier, 3).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["a"]) == 3 and len(by_host["b"]) == 2
    # admitted = lowest (depth, url) first: a/2, a/3 (depth 0) then a/1
    a_urls = {r["url"] for r in by_host["a"]}
    assert a_urls == {"http://a/2", "http://a/3", "http://a/1"}
    ranks = sorted((r["host_rank"], r["url"]) for r in by_host["a"])
    assert ranks[0] == (1, "http://a/2")


def test_host_budget_rank_deterministic(frontier):
    one = sorted(map(tuple, host_budget(frontier, 2).collect()))
    two = sorted(map(tuple, host_budget(frontier.repartition(7), 2).collect()))
    assert one == two


def test_source_length_quantiles(spark):
    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate([1, 2, 3, 4])]
    rows += [(10, "t", "a b"), (11, "t", "")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_length_quantiles(df).collect()}
    # continuous interpolation over [1,2,3,4]: p25=1.75, p50=2.5, p75=3.25
    assert out["s"]["p25_tokens"] == 1.75
    assert out["s"]["p50_tokens"] == 2.5
    assert out["s"]["p75_tokens"] == 3.25
    assert out["s"]["min_tokens"] == 1 and out["s"]["max_tokens"] == 4
    assert out["t"]["min_tokens"] == 0 and out["t"]["max_tokens"] == 2
    assert out["t"]["n_docs"] == 2
