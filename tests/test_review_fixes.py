"""Regression pins for the round-4 session-2 self-review findings:
each test reproduces a reviewer-reported failure scenario against the
fixed code."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flyscrape_spark.operators.budget import waterfill
from flyscrape_spark.operators.encoding import charset_audit, meta_charset
from flyscrape_spark.operators.mixing import pack_sequences, pack_weighted
from flyscrape_spark.operators.robots import robots_churn
from flyscrape_spark.operators.segments import strip_host_boilerplate
from flyscrape_spark.sources.feeds import rfc822_timestamp


def test_robots_churn_empty_disallow_no_phantom(spark):
    # empty Disallow (allow-all) must not swallow the next line
    old = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow:\nDisallow: /admin\n")],
        "host string, body string",
    )
    new = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow:\nCrawl-delay: 2\n")],
        "host string, body string",
    )
    r = robots_churn(old, new).collect()[0]
    # old rules = {/admin}, new rules = {} -> loosened, no phantom
    # 'Crawl-delay:' or next-line tokens
    assert (r["n_old"], r["n_new"], r["added"], r["removed"],
            r["direction"]) == (1, 0, 0, 1, "loosened")


def test_meta_charset_not_fooled_by_attribute_values(spark):
    df = spark.createDataFrame(
        [
            # charset= inside a content VALUE is not a declaration
            ('<meta name="description" content="set charset=utf-8 here">',),
            # ...but a real later-position attribute is
            ('<meta id="x" charset="iso-8859-1">',),
            # ...and the first-attribute HTML5 form is
            ("<meta charset=utf-8>",),
        ],
        "html string",
    )
    got = [r["c"] for r in
           df.select(meta_charset("html").alias("c")).collect()]
    assert got == [None, "iso-8859-1", "utf-8"]


def test_charset_audit_counts_prose_mention_as_undeclared(spark):
    pages = spark.createDataFrame(
        [("h", "text/html",
          '<head><meta name="d" content="use charset=utf-8"></head>')],
        "host string, content_type string, html string",
    )
    r = charset_audit(pages).collect()[0]
    assert (r["n_meta"], r["n_undeclared"]) == (0, 1)


def test_waterfill_null_caps_dont_poison_level(spark):
    hosts = spark.createDataFrame(
        [("a", 10, 99), ("b", 99, 20), ("c", 40, 40),
         ("z", None, None)],  # both unknown -> effective cap 0
        "host string, demand long, cap long",
    )
    out = {r["host"]: r for r in waterfill(hosts, budget=50).collect()}
    # same level as the null-free case; z allocates nothing
    assert (out["a"]["alloc"], out["b"]["alloc"], out["c"]["alloc"],
            out["z"]["alloc"]) == (10.0, 20.0, 20.0, 0.0)
    # one-sided null: the known signal still caps the host
    hosts2 = spark.createDataFrame(
        [("a", None, 5), ("b", 7, None)], "host string, demand long, cap long"
    )
    out2 = {r["host"]: r for r in waterfill(hosts2, budget=100).collect()}
    assert (out2["a"]["alloc"], out2["b"]["alloc"]) == (5.0, 7.0)


def test_rfc822_optional_seconds_and_short_day(spark):
    df = spark.createDataFrame(
        [("Thu, 05 Apr 2026 10:00 GMT",),
         ("5 Jan 2026 10:30:00 +0000",),
         ("Mon, 5 Jan 2026 10:30 EST",)],
        "s string",
    )
    got = [r["ts"] for r in
           df.select(rfc822_timestamp(F.col("s")).alias("ts")).collect()]
    assert got == [
        dt.datetime(2026, 4, 5, 10, 0),
        dt.datetime(2026, 1, 5, 10, 30),
        dt.datetime(2026, 1, 5, 15, 30),
    ]


def test_pack_zero_weight_first_row_occupies_no_bin(spark):
    rows = spark.createDataFrame(
        [(1, 0), (2, 30), (3, 0)], "doc_id long, w long"
    )
    out = {r["doc_id"]: r for r in
           pack_weighted(rows, budget=100, weight_col="w").collect()}
    # first row zero-weight: bin_end = bin_start - 1 = -1 (the DuckDB
    # floor-division convention), not 0
    assert (out[1]["bin_start"], out[1]["bin_end"]) == (0, -1)
    assert (out[3]["bin_start"], out[3]["bin_end"]) == (0, -1)
    # pack_sequences (now delegating) inherits the same convention
    docs = spark.createDataFrame(
        [(1, ""), (2, "a b c")], "doc_id long, text string"
    )
    seq = {r["doc_id"]: r for r in pack_sequences(docs, 100).collect()}
    assert (seq[1]["seq_start"], seq[1]["seq_end"]) == (0, -1)
    assert (seq[2]["seq_start"], seq[2]["seq_end"]) == (0, 0)


def test_strip_boilerplate_keeps_empty_docs(spark):
    rows = [("h", i, f"NAV\nbody {i}") for i in range(5)] + [
        ("h", 99, ""), ("h", 100, "\n\n"),
    ]
    pages = spark.createDataFrame(
        rows, "host string, doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           strip_host_boilerplate(pages, min_docs=5).collect()}
    assert len(out) == 7  # empty docs still present
    for empty_id in (99, 100):
        assert (out[empty_id]["n_lines"], out[empty_id]["n_removed"],
                out[empty_id]["clean_text"]) == (0, 0, "")


def test_corpus_pipeline_example(spark):
    """examples/corpus_pipeline.py end-to-end: every stage yields the
    documented shape on the demo corpus."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "examples" / "corpus_pipeline.py"
    spec = importlib.util.spec_from_file_location("corpus_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    pages, feeds_xml = mod._demo_inputs(spark)
    out = mod.run(spark, pages, feeds_xml)
    # every page advertises exactly one feed
    assert out["discovered"].count() == 24
    # all 24 links seeded, ranked within 3 hosts
    seeds = out["seeds"].collect()
    assert len(seeds) == 24
    assert max(r["seed_rank"] for r in seeds) == 8
    # plan allocates the full budget (demand 8/host, cap 30 > demand)
    plan = out["plan"].collect()
    assert sum(r["alloc"] for r in plan) == 24.0  # min(budget, total c)
    # template lines stripped: every doc keeps exactly its body line
    stripped = out["stripped"].collect()
    assert all(r["n_removed"] == 2 and r["n_lines"] == 3 for r in stripped)
    # the demo bodies differ only by one number -> SimHash collapses
    # all 24 into ONE near-dup cluster; the canonical pick keeps the
    # longest copy (two-digit ids are a char longer; doc 10 wins the
    # tie-break) and reports 23 discards
    keepers = out["keepers"].collect()
    assert len(keepers) == 1
    assert (keepers[0]["keeper_doc_id"], keepers[0]["n_discarded"]) == (
        10, 23,
    )
    # the lone survivor packs into shard 0
    shards = out["shards"].collect()
    assert len(shards) == 1 and shards[0]["shard_id"] == 0
