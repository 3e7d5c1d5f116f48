"""Round-3 batch-6 operators: UT1-style domain blocklist gate and
CCNet head/middle/tail perplexity buckets — hand-computed values plus
each operator's core invariant."""

from pyspark.sql import functions as F

from flyscrape_spark.operators.blocklist import (
    domain_blocklist_filter,
    host_suffixes,
)
from flyscrape_spark.operators.lm import ccnet_buckets


# ------------------------------------------------------- blocklist


def _bl(spark):
    return spark.createDataFrame(
        [
            ("site0.co.uk", "adult"),
            ("b.site3.org.uk", "gambling"),
            ("site3.org.uk", "phishing"),
        ],
        "domain string, category string",
    )


def test_blocklist_label_aligned_suffix(spark):
    """host matches D iff host == D or host endswith '.'+D —
    'evilsite0.co.uk' must NOT match 'site0.co.uk'."""
    hosts = spark.createDataFrame(
        [
            (0, "www.site0.co.uk"),   # suffix match
            (1, "site0.co.uk"),       # exact match
            (2, "evilsite0.co.uk"),   # NOT label-aligned
            (3, "clean.example.com"), # unlisted
        ],
        "doc_id long, host string",
    )
    rows = {
        r["doc_id"]: r
        for r in domain_blocklist_filter(hosts, _bl(spark), n_blocked=3).collect()
    }
    assert rows[0]["blocked"] and rows[0]["category"] == "adult"
    assert rows[1]["blocked"] and rows[1]["matched_domain"] == "site0.co.uk"
    assert not rows[2]["blocked"] and rows[2]["category"] is None
    assert not rows[3]["blocked"]


def test_blocklist_most_specific_wins(spark):
    """a.b.site3.org.uk matches both b.site3.org.uk (pos 1) and
    site3.org.uk (pos 2) — the deeper listing decides the category."""
    hosts = spark.createDataFrame(
        [(0, "a.b.site3.org.uk"), (1, "c.site3.org.uk")],
        "doc_id long, host string",
    )
    rows = {
        r["doc_id"]: r
        for r in domain_blocklist_filter(hosts, _bl(spark), n_blocked=3).collect()
    }
    assert rows[0]["category"] == "gambling"
    assert rows[0]["matched_domain"] == "b.site3.org.uk"
    assert rows[1]["category"] == "phishing"


def test_blocklist_broadcasts_when_sized(spark):
    """n_blocked under the threshold must put the list on the
    broadcast side — the URL side shuffles nothing for the match."""
    hosts = spark.createDataFrame(
        [(0, "www.site0.co.uk")], "doc_id long, host string"
    )
    plan = domain_blocklist_filter(
        hosts, _bl(spark), n_blocked=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_host_suffixes_shape(spark):
    df = spark.range(1).select(
        host_suffixes(F.lit("A.B.example.COM")).alias("s")
    )
    sfx = [(s["pos"], s["suffix"]) for s in df.collect()[0]["s"]]
    assert sfx == [
        (0, "a.b.example.com"),
        (1, "b.example.com"),
        (2, "example.com"),
    ]


# --------------------------------------------------- ccnet buckets


def _corpus(spark):
    # per lang, three scorable docs with strictly ordered LM scores
    # (more repetition of one bigram => higher avg logprob) plus one
    # unscorable single-word doc.
    rep = "alpha beta " * 12          # one dominant bigram -> head
    mid = "alpha beta gamma delta alpha beta"
    rare = "zeta eta theta iota kappa mu"  # all-rare bigrams -> tail
    rows = []
    for lang_i, lang in enumerate(("en", "de")):
        base = 10 * lang_i
        rows += [
            (base + 0, lang, rep),
            (base + 1, lang, mid),
            (base + 2, lang, rare),
            (base + 3, lang, "solo"),
        ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ccnet_tercile_assignment(spark):
    out = {
        r["doc_id"]: r for r in ccnet_buckets(_corpus(spark)).collect()
    }
    for base in (0, 10):
        assert out[base + 0]["bucket"] == "head"
        assert out[base + 1]["bucket"] == "middle"
        assert out[base + 2]["bucket"] == "tail"
        # unscorable doc: tail by definition, excluded from terciles
        assert out[base + 3]["bucket"] == "tail"
        assert out[base + 3]["n_bigrams"] == 0
        assert out[base + 3]["avg_logprob"] is None
        # sanity: the tercile order tracks the score order
        assert out[base + 0]["avg_logprob"] > out[base + 1]["avg_logprob"]
        assert out[base + 1]["avg_logprob"] > out[base + 2]["avg_logprob"]
    assert len(out) == 8


def test_ccnet_threshold_path_broadcasts(spark):
    """The production path: precomputed per-lang cutoffs are
    broadcast-joined; bucket boundaries are inclusive at >=."""
    docs = _corpus(spark)
    thresholds = spark.createDataFrame(
        [("en", -2.0, -4.0), ("de", -2.0, -4.0)],
        "lang string, t_head double, t_middle double",
    )
    out_df = ccnet_buckets(docs, thresholds=thresholds)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out = {r["doc_id"]: r for r in out_df.collect()}
    for doc_id, row in out.items():
        score = row["avg_logprob"]
        if score is None:
            expect = "tail"
        elif score >= -2.0:
            expect = "head"
        elif score >= -4.0:
            expect = "middle"
        else:
            expect = "tail"
        assert row["bucket"] == expect, (doc_id, score, row["bucket"])
