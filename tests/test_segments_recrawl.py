"""Segment-level dedup (operators/segments.py), recrawl snapshot
delta (operators/recrawl.py), and best-first frontier admission
(plans/priority.py) against hand-computed values."""

import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.recrawl import snapshot_delta
from flyscrape_spark.operators.segments import (
    boilerplate_segments,
    dedup_segments,
    segment_table,
)
from flyscrape_spark.plans.priority import prioritize_frontier


@pytest.fixture
def corpus(spark):
    # "x y z" appears in 3 docs (boilerplate at min_docs=3);
    # everything else is unique. Doc 3 is pure boilerplate.
    rows = [
        (0, "x y z a b c"),
        (1, "p q r x y z"),
        (2, "x y z"),
        (3, "x y z x y z"),
        (4, "one two three four"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_table_windows(corpus):
    segs = {
        (r["doc_id"], r["seg_idx"]): r["seg_text"]
        for r in segment_table(corpus, width=3).collect()
    }
    assert segs[(0, 0)] == "x y z" and segs[(0, 1)] == "a b c"
    # 4 tokens -> ceil(4/3) = 2 windows, last clamped to 1 token
    assert segs[(4, 0)] == "one two three" and segs[(4, 1)] == "four"


def test_boilerplate_distinct_doc_count(corpus):
    segs = segment_table(corpus, width=3)
    boiler = boilerplate_segments(segs, min_docs=3).collect()
    # doc 3 contains "x y z" twice but counts once -> 4 distinct docs
    assert len(boiler) == 1 and boiler[0]["n_docs"] == 4


def test_dedup_segments_reassembly(corpus):
    out = {r["doc_id"]: r for r in
           dedup_segments(corpus, width=3, min_docs=3).collect()}
    assert out[0]["clean_text"] == "a b c" and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "p q r"
    assert out[2]["clean_text"] == "" and out[2]["n_segs"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["clean_text"] == "one two three four"
    assert out[4]["n_removed"] == 0


def test_snapshot_delta_labels(spark):
    cur = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "doc_id long, content_hash long"
    )
    prev = spark.createDataFrame(
        [(1, 10), (3, 30), (4, 40)], "doc_id long, content_hash long"
    )
    out = {r["doc_id"]: (r["status"], r["refetch"])
           for r in snapshot_delta(cur, prev).collect()}
    assert out[1] == ("unchanged", False)
    assert out[2] == ("new", True)
    assert out[3] == ("changed", True)
    assert out[4] == ("gone", False)


def test_prioritize_frontier_budget_and_fifo_tiebreak(spark):
    frontier = spark.createDataFrame(
        [(i, 0, i) for i in range(6)],
        "url_key long, depth int, discovery_order long",
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 9.0)], "url_key long, score double"
    )
    out = prioritize_frontier(frontier, scores, budget=3).collect()
    admitted = {r["url_key"]: r["admit_rank"] for r in out}
    # 3 (score 9) first; 1 and 2 tie at 5, FIFO order breaks the tie
    assert admitted == {3: 1, 1: 2, 2: 3}


def test_prioritize_constant_score_is_fifo_prefix(spark):
    frontier = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)],
        "url_key long, depth int, discovery_order long",
    )
    scores = spark.createDataFrame([], "url_key long, score double")
    out = prioritize_frontier(frontier, scores, budget=2)
    got = sorted((r["depth"], r["url_key"]) for r in out.collect())
    # unscored = FIFO: first 2 discovery orders per depth
    assert got == [(0, 0), (0, 2), (1, 1), (1, 3)]
