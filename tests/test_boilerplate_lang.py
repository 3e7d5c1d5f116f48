"""Batch: host-scoped boilerplate strip + declared-language audit."""

from __future__ import annotations

from flyscrape_spark.operators.encoding import declared_lang_audit
from flyscrape_spark.operators.segments import strip_host_boilerplate


def test_strip_host_boilerplate_basic(spark):
    # 5 docs on h1 share "NAV" and "FOOT"; each has a unique body.
    # h2 has the same NAV text but only 2 docs -> below min_docs,
    # nothing stripped there (per-host scope).
    rows = [
        ("h1", i, f"NAV\nbody {i}\nFOOT") for i in range(5)
    ] + [
        ("h2", 10 + i, f"NAV\nother {i}") for i in range(2)
    ]
    pages = spark.createDataFrame(
        rows, "host string, doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           strip_host_boilerplate(pages, min_docs=5).collect()}
    for i in range(5):
        assert (out[i]["n_lines"], out[i]["n_removed"],
                out[i]["clean_text"]) == (3, 2, f"body {i}")
    for i in (10, 11):
        assert out[i]["n_removed"] == 0
        assert out[i]["clean_text"].startswith("NAV\n")


def test_strip_host_boilerplate_whole_page_template(spark):
    rows = [("h", i, "only line") for i in range(6)]
    pages = spark.createDataFrame(
        rows, "host string, doc_id long, text string"
    )
    out = strip_host_boilerplate(pages, min_docs=5).collect()
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


EN = ("the and is of to in that it was for on are as with his they "
      "at be this have from") * 3


def test_declared_lang_audit(spark):
    pages = spark.createDataFrame(
        [
            ("h", '<html lang="en">', EN),          # match
            ("h", '<html lang="en-US">', EN),       # region subtag -> match
            ("h", '<html LANG="DE">', EN),          # wrong declaration
            ("h", "<html><head>", EN),              # undeclared
        ],
        "host string, html string, text string",
    )
    r = declared_lang_audit(pages).collect()[0]
    assert (r["n_pages"], r["n_declared"], r["n_mismatch"]) == (4, 3, 1)
    assert r["mismatch_rate"] == 0.25
