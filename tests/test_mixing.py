"""Corpus mixing: per-source stats and the two-phase token-budget
prefix sampler (operators/mixing.py)."""

import pytest

from flyscrape_spark.operators.mixing import source_mix_stats, token_budget_sample


@pytest.fixture
def docs(spark):
    # skewed: src_a has 6 docs (4 tokens each), src_b has 2, src_c empty-ish
    rows = [(i, "src_a", "w x y z") for i in range(6)]
    rows += [(100, "src_b", "one two"), (101, "src_b", "three four five")]
    rows += [(200, "src_c", "")]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_source_mix_stats(docs):
    out = {r["source"]: r for r in source_mix_stats(docs).collect()}
    assert out["src_a"]["n_docs"] == 6 and out["src_a"]["total_tokens"] == 24
    assert out["src_b"]["total_tokens"] == 5
    assert out["src_c"]["total_tokens"] == 0
    # shares sum to 1 over the 29 corpus tokens
    assert out["src_a"]["token_share"] == round(24 / 29, 6)
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-4
    assert out["src_b"]["mean_tokens"] == 2.5


def test_token_budget_prefix_semantics(docs):
    # budget 9: src_a keeps docs 0,1 (4+4=8; doc 2 would hit 12);
    # src_b keeps 100 (2) and 101 (2+3=5); src_c's empty doc (cum 0)
    kept = {r["doc_id"]: r for r in token_budget_sample(docs, budget=9).collect()}
    assert sorted(kept) == [0, 1, 100, 101, 200]
    assert kept[1]["cum_tokens"] == 8 and kept[101]["cum_tokens"] == 5
    # a doc is kept iff the running total INCLUDING it fits
    kept4 = {r["doc_id"] for r in token_budget_sample(docs, budget=4).collect()}
    assert kept4 == {0, 100, 200}


def test_token_budget_partition_independent(docs):
    # the two-phase offset computation must make the result identical
    # for any partition count (incl. partitions splitting one source)
    a = sorted(map(tuple, token_budget_sample(docs, budget=9, parts=1).collect()))
    b = sorted(map(tuple, token_budget_sample(docs, budget=9, parts=3).collect()))
    c = sorted(map(tuple, token_budget_sample(docs, budget=9, parts=8).collect()))
    assert a == b == c
