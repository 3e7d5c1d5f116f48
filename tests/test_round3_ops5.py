"""Round-3 batch-3 operators: C4 line cleaning, Gopher gate,
temperature mixing, SURT/CDX indexing, JSD corpus drift, DSIR
selection — hand-computed values plus each operator's core invariant."""

import math

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.functions.urls import surt_key
from flyscrape_spark.operators.drift import corpus_drift
from flyscrape_spark.operators.dsir import dsir_select
from flyscrape_spark.operators.mixing import temperature_mix
from flyscrape_spark.operators.rules import c4_line_filter, gopher_quality_gate
from flyscrape_spark.sources.warc import cdx_index


# ------------------------------------------------------------- C4


def test_c4_real_newlines_and_punct(spark):
    """The published rules: newline lines, terminal punctuation
    required, javascript/blocklist lines dropped, <3 kept lines
    drops the doc (Raffel et al. 2020 §2.2)."""
    good = "this line has enough words and ends properly."
    docs = spark.createDataFrame(
        [
            (0, f"{good}\nshort one.\nenable javascript to view this content.\n{good}\n{good}"),
            (1, f"{good}\nno terminal punctuation on this long line\n{good}"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in c4_line_filter(docs, min_kept_lines=3).collect()
    }
    # doc 0: 5 lines; "short one." (<5 words) and the javascript line
    # drop -> 3 kept -> doc kept
    assert rows[0]["n_lines"] == 5
    assert rows[0]["n_kept_lines"] == 3
    assert rows[0]["keep"] is True
    assert "javascript" not in rows[0]["clean_text"]
    # doc 1: middle line lacks terminal punct -> 2 kept -> dropped
    assert rows[1]["n_kept_lines"] == 2
    assert rows[1]["keep"] is False


def test_c4_pseudo_lines_windowing(spark):
    """line_words>0 derives fixed-width token windows; a 25-token doc
    at width 12 yields 3 lines of 12/12/1 tokens."""
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(25)))], "doc_id long, text string"
    )
    r = c4_line_filter(
        docs, line_words=12, require_terminal_punct=False, min_kept_lines=2
    ).collect()[0]
    assert r["n_lines"] == 3
    assert r["n_kept_lines"] == 2  # the 1-token tail fails min_line_words
    assert r["keep"] is True
    assert r["clean_text"].split(" ")[0] == "w0"
    assert len(r["clean_text"].split(" ")) == 24


# --------------------------------------------------------- Gopher


def test_gopher_fail_reason_order(spark):
    """First failing rule in the published order is reported."""
    long_word = "x" * 30
    docs = spark.createDataFrame(
        [
            (0, "the and " + " ".join(f"word{i}" for i in range(48))),  # pass
            (1, "the and short doc"),  # too few words
            (2, "the and " + " ".join([long_word] * 48)),  # word_length
            (3, "the " + " ".join(f"word{i}" for i in range(49))),  # stopwords (1 hit)
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_quality_gate(
            docs, min_words=50, stopwords=("the", "and"), min_stop_hits=2
        ).collect()
    }
    assert rows[0]["keep"] is True and rows[0]["fail_reason"] is None
    assert rows[1]["fail_reason"] == "too_few_words"
    assert rows[2]["fail_reason"] == "word_length"
    assert rows[3]["fail_reason"] == "stopwords"
    assert rows[0]["stop_hits"] == 2


def test_gopher_symbol_and_alpha(spark):
    docs = spark.createDataFrame(
        [(0, "# # # # ... " + " ".join(["ok"] * 45))],
        "doc_id long, text string",
    )
    r = gopher_quality_gate(
        docs, min_words=10, min_stop_hits=0, min_mean_word_len=1.0
    ).collect()[0]
    # 5 symbol hits / 50 words = 0.1 -> at the <= boundary, passes;
    # alpha frac: 45/50 = 0.9 >= 0.8
    assert r["symbol_ratio"] == pytest.approx(0.1)
    assert r["alpha_frac"] == pytest.approx(0.9)
    assert r["keep"] is True


# --------------------------------------------------- temperature mix


def test_temperature_mix_math(spark):
    # sources with 100 / 400 tokens: shares .2/.8
    docs = spark.createDataFrame(
        [(i, "s1", "w " * 10) for i in range(10)]
        + [(100 + i, "s2", "w " * 10) for i in range(40)],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in temperature_mix(docs, alpha=0.5, token_budget=1000).collect()}
    s = math.sqrt(0.2) + math.sqrt(0.8)
    assert rows["s1"]["weight"] == pytest.approx(math.sqrt(0.2) / s, abs=1e-6)
    assert rows["s2"]["weight"] == pytest.approx(math.sqrt(0.8) / s, abs=1e-6)
    # weights sum to 1; smaller source is UP-weighted vs its raw share
    assert rows["s1"]["weight"] + rows["s2"]["weight"] == pytest.approx(1.0, abs=2e-6)
    assert rows["s1"]["weight"] > rows["s1"]["raw_share"]
    assert rows["s1"]["epochs"] == pytest.approx(
        math.floor(rows["s1"]["weight"] * 1000) / 100, abs=1e-6
    )


def test_temperature_alpha_one_is_proportional(spark):
    docs = spark.createDataFrame(
        [(0, "a", "w w w"), (1, "b", "w")], "doc_id long, source string, text string"
    )
    rows = {r["source"]: r for r in temperature_mix(docs, alpha=1.0).collect()}
    assert rows["a"]["weight"] == pytest.approx(rows["a"]["raw_share"], abs=1e-6)


# ------------------------------------------------------- SURT / CDX


def test_surt_key_cases(spark):
    cases = [
        ("http://www.example.com/path", "com,example)/path"),
        ("https://a.b.example.org/", "org,example,b,a)/"),
        ("http://example.com/p?b=2&a=1", "com,example)/p?a=1&b=2"),
        ("http://example.com/p?single=1", "com,example)/p?single=1"),
        # a second '?' is legal inside the query: everything after
        # the FIRST '?' is the query (matches surt_key_sql's split)
        ("http://example.com/x?a=1?b=2", "com,example)/x?a=1?b=2"),
        ("http://example.com/x?b=2?z&a=1", "com,example)/x?a=1&b=2?z"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["s"] for r in df.select(surt_key("url").alias("s")).collect()]
    assert got == [want for _, want in cases]


def test_cdx_index_shard_positions(spark):
    pages = spark.createDataFrame(
        [
            ("http://h1.example/b", 2, 11),
            ("http://h1.example/a", 1, 10),
            ("http://h1.example/a", 3, 12),  # later capture of same URL
            ("http://h2.example/x", 1, 13),
        ],
        "url string, ts long, digest long",
    )
    rows = cdx_index(pages).collect()
    h1 = sorted(
        [(r["surt_key"], r["ts"], r["shard_pos"]) for r in rows if r["shard_host"] == "h1.example"]
    )
    # /a@1, /a@3 (same SURT, ts ordered), then /b@2
    assert h1 == [
        ("example,h1)/a", 1, 0),
        ("example,h1)/a", 3, 1),
        ("example,h1)/b", 2, 2),
    ]
    assert [r["shard_pos"] for r in rows if r["shard_host"] == "h2.example"] == [0]


# ----------------------------------------------------------- drift


def test_corpus_drift_identical_and_disjoint(spark):
    a = spark.createDataFrame([(0, "x y"), (1, "x y")], "doc_id long, text string")
    same = corpus_drift(a, a).collect()
    assert all(r["jsd_term"] == 0.0 for r in same)

    b = spark.createDataFrame([(2, "z z")], "doc_id long, text string")
    disjoint = corpus_drift(a, b).collect()
    # disjoint vocabularies -> total JSD = 1 bit
    assert sum(r["jsd_term"] for r in disjoint) == pytest.approx(1.0, abs=1e-6)
    # one-sided terms carry p*log2(2)/2 = p/2
    z = {r["token"]: r for r in disjoint}["z"]
    assert z["p_old"] == 0.0 and z["p_new"] == 1.0
    assert z["jsd_term"] == pytest.approx(0.5, abs=1e-6)


# ------------------------------------------------------------ DSIR


def test_dsir_prefers_target_like_docs(spark):
    # target (lang=en) docs speak 'alpha beta'; others speak 'gamma
    # delta'; a fresh doc in the target dialect must score higher
    rows = [(i, "en", "alpha beta alpha beta") for i in range(5)]
    rows += [(10 + i, "de", "gamma delta gamma delta") for i in range(5)]
    rows += [(20, "zz", "alpha beta"), (21, "zz", "gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r
        for r in dsir_select(docs, F.col("lang") == "en", dim=64).collect()
    }
    assert got[20]["log_ratio"] > got[21]["log_ratio"]
    assert got[20]["selected"] is True
    assert got[21]["selected"] is False
    # in-target docs select themselves
    assert all(got[i]["selected"] for i in range(5))


def test_dsir_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "en", "alpha"), (1, "de", " ")], "doc_id long, lang string, text string"
    )
    got = {r["doc_id"]: r for r in dsir_select(docs, F.col("lang") == "en", dim=8).collect()}
    assert got[1]["n_tokens"] == 0
    assert got[1]["log_ratio"] == 0.0
    assert got[1]["selected"] is False


# ------------------------------------------------ composed funnel


def test_refinedweb_funnel_stages(spark):
    """Each stage claims its doc: gopher kills the short doc, C4 the
    blocklisted one, exact dedup the verbatim copy, LSH the near-copy;
    the senior survives."""
    from flyscrape_spark.operators.curate import refinedweb_funnel

    words = [w for i in range(20) for w in (f"word{i}", "the", "and")]
    base = " ".join(words)  # 60 words, 5 pseudo-lines at width 12
    nearw = list(words)
    nearw[30] = "changedword"  # one token differs INSIDE the kept lines
    near = " ".join(nearw)
    other = "javascript " + " ".join(
        f"thing{i} the and" for i in range(20)
    )  # disjoint stems: no near-dup with base; 1 blocked line only
    docs = spark.createDataFrame(
        [
            (0, base),            # kept (senior)
            (1, base),            # exact duplicate of 0
            (2, near),            # near duplicate of 0
            (3, "the and tiny"),  # gopher: too few words
            (4, other),           # kept: one blocked line is not a doc kill
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in refinedweb_funnel(
            docs,
            line_words=12, require_terminal_punct=False, min_kept_lines=3,
            min_words=20, stopwords=("the", "and"), min_stop_hits=2,
            threshold=0.5,
        ).collect()
    }
    assert got[0]["keep"] is True and got[0]["drop_stage"] is None
    assert got[1]["drop_stage"] == "exact_dup"
    assert got[2]["drop_stage"] == "near_dup"
    assert got[3]["drop_stage"] == "gopher_too_few_words"
    assert got[4]["keep"] is True


def test_refinedweb_funnel_c4_kill(spark):
    """A doc whose every pseudo-line carries a blocklist token dies at
    the c4 stage (after passing gopher)."""
    from flyscrape_spark.operators.curate import refinedweb_funnel

    text = " ".join(
        ("javascript" if i % 12 == 0 else f"word{i}") + " the and"
        for i in range(20)
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = refinedweb_funnel(
        docs,
        line_words=4, require_terminal_punct=False, min_kept_lines=30,
        min_words=20, stopwords=("the", "and"), min_stop_hits=2,
    ).collect()[0]
    assert r["drop_stage"] == "c4_lines"


# ------------------------------------------------------ span stats


def test_span_stats_per_row(spark):
    from flyscrape_spark.parse.udfs import parse_spans_udf
    from pyspark.sql import functions as F

    html = '<p>hello</p><a href="/x">x</a><img src="/m.png"><a href="/y">y</a>'
    pages = spark.createDataFrame([("u1", html)], "url string, html string")
    df = pages.select(F.col("url").alias("doc_id"),
                      parse_spans_udf("html").alias("sp"))
    sp = F.col("sp")

    def nk(k):
        return F.size(F.filter(sp, lambda s: s["kind"] == k))

    r = df.select(
        F.size(sp).alias("n"), nk("text").alias("t"), nk("media").alias("m"),
        nk("link").alias("l"),
        F.array_min(F.transform(F.filter(sp, lambda s: s["kind"] == "media"),
                                lambda s: s["offset"])).alias("fm"),
    ).collect()[0]
    assert (r["n"], r["t"], r["m"], r["l"]) == (4, 1, 1, 2)
    assert r["fm"] == 2  # text, link, media, link


# ------------------------------------------------- LPA communities


def test_lpa_two_cliques(spark):
    """Two triangles joined by nothing: each collapses to its
    smallest node id within one iteration; labels are stable by 3."""
    from flyscrape_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 10, 11, 12)], "node long"
    )
    got = {r["node"]: r["community"]
           for r in lpa_communities(nodes, edges, iterations=3).collect()}
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}


def test_lpa_isolated_keeps_own_label(spark):
    from flyscrape_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (7,)], "node long")
    got = {r["node"]: r["community"]
           for r in lpa_communities(nodes, edges, iterations=2).collect()}
    assert got[7] == 7
    assert got[0] == 0 and got[1] == 0


def test_lpa_string_node_ids_deterministic(spark):
    """String node ids (URL/host graphs) must get the same smallest-
    label tie-break as numeric ids — negating a string label yields
    NULL and would silently degrade to an arbitrary pick."""
    from flyscrape_spark.operators.graph import lpa_communities

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"),
         ("z", "x")],
        "src string, dst string",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in ("a", "b", "c", "x", "y", "z")], "node string"
    )
    got = {r["node"]: r["community"]
           for r in lpa_communities(nodes, edges, iterations=3).collect()}
    assert {got["a"], got["b"], got["c"]} == {"a"}
    assert {got["x"], got["y"], got["z"]} == {"x"}


# ------------------------------------------------- inverted index


def test_inverted_index_rank_and_cap(spark):
    from flyscrape_spark.operators.index import inverted_index

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple banana banana"),
         (3, "apple")],
        "doc_id long, text string",
    )
    rows = inverted_index(docs, max_postings=2).collect()
    apple = sorted(
        [(r["rank"], r["doc_id"], r["tf"], r["df"]) for r in rows
         if r["token"] == "apple"]
    )
    # df counts ALL 3 docs even though postings cap at 2
    assert apple == [(1, 1, 2, 3), (2, 2, 1, 3)]
    banana = sorted(
        [(r["rank"], r["doc_id"], r["tf"]) for r in rows
         if r["token"] == "banana"]
    )
    assert banana == [(1, 2, 2), (2, 1, 1)]
