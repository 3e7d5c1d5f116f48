"""Exact-substring (overlapping token-window) dedup — hand-computed
fixtures for operators/substrings.py (Lee et al. ACL 2022 semantics:
a k-token window occurring ≥2× corpus-wide marks a duplicated span;
value parity with DuckDB is pinned by the substring_dedup oracle)."""

import pytest

from flyscrape_spark.operators.substrings import (
    substring_dup_stats,
    window_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b c d e f"),          # shares "b c d e" with doc 1
            (1, "x y b c d e z"),
            (2, "p q"),                   # shorter than k: no windows
            (3, "m n o m n o m n"),       # in-doc repetition
        ],
        "doc_id bigint, text string",
    )


def test_window_table_shapes(spark, docs):
    rows = window_table(docs, k=3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in rows}
    # len-k+1 windows; sub-k docs produce none
    assert counts == {0: 4, 1: 5, 3: 6}


def test_substring_dup_stats(spark, docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in substring_dup_stats(docs, k=3).collect()
    }
    assert set(out) == {0, 1, 2, 3}

    # doc 0: windows [a b c, b c d, c d e, d e f]; "b c d"/"c d e"
    # repeat in doc 1 -> 2 dup windows at idx 2,3 = one run of 2
    assert out[0]["n_windows"] == 4
    assert out[0]["dup_windows"] == 2
    assert out[0]["dup_frac"] == 0.5
    assert out[0]["max_dup_run"] == 2

    # doc 1: 5 windows, same 2 shared
    assert out[1]["n_windows"] == 5
    assert out[1]["dup_windows"] == 2
    assert out[1]["dup_frac"] == 0.4
    assert out[1]["max_dup_run"] == 2

    # doc 2: too short — present with zeros (corpus-complete output)
    assert out[2] == {
        "doc_id": 2, "n_windows": 0, "dup_windows": 0,
        "dup_frac": 0.0, "max_dup_run": 0,
    }

    # doc 3: every window repeats WITHIN the doc (suffix-array
    # semantics count total occurrences, not distinct docs)
    assert out[3]["n_windows"] == 6
    assert out[3]["dup_windows"] == 6
    assert out[3]["dup_frac"] == 1.0
    assert out[3]["max_dup_run"] == 6


def test_longest_run_maps_to_span_length(spark):
    # a repeated substring of L tokens yields L-k+1 consecutive dup
    # windows: max_dup_run + k - 1 recovers L
    docs = spark.createDataFrame(
        [
            (0, "s1 s2 s3 s4 s5 s6 t u"),
            (1, "v w s1 s2 s3 s4 s5 s6"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["max_dup_run"]
        for r in substring_dup_stats(docs, k=3).collect()
    }
    # shared span L=6 -> 4 consecutive windows each side
    assert out == {0: 4, 1: 4}
