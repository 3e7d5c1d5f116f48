"""Round-4 composition queries: language-temperature mixing and
per-language quality pass rates."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_lang_mix_weights_sum_to_one(spark):
    from flyscrape_spark.queries import q_lang_mix

    rows = q_lang_mix(spark, SF).collect()
    assert len(rows) >= 2  # the fixture corpus is multilingual
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 < r["raw_share"] < 1.0
        assert r["budget_tokens"] >= 0


def test_lang_mix_temperature_flattens(spark):
    """alpha < 1 must move every language's weight toward uniform:
    the largest language's weight drops below its raw share, the
    smallest rises above it."""
    from flyscrape_spark.queries import q_lang_mix

    rows = sorted(q_lang_mix(spark, SF).collect(),
                  key=lambda r: r["raw_share"])
    small, big = rows[0], rows[-1]
    assert small["weight"] > small["raw_share"]
    assert big["weight"] < big["raw_share"]


def test_lang_quality_gate_consistency(spark):
    """Pass counts must reconcile with the standalone gopher gate and
    lang_id outputs joined by hand."""
    from flyscrape_spark.queries import (
        q_gopher_gate, q_lang_id, q_lang_quality_gate)

    per_lang = {r["lang"]: r for r in
                q_lang_quality_gate(spark, SF).collect()}
    gate = {r["doc_id"]: r["keep"] for r in q_gopher_gate(spark, SF).collect()}
    langs = {r["doc_id"]: r["lang_pred"] for r in
             q_lang_id(spark, SF).collect()}
    expect: dict[str, list[bool]] = {}
    for d, lang in langs.items():
        expect.setdefault(lang, []).append(gate[d])
    assert set(per_lang) == set(expect)
    for lang, keeps in expect.items():
        row = per_lang[lang]
        assert row["n_docs"] == len(keeps)
        assert row["n_pass"] == sum(keeps)
        assert row["pass_rate"] == round(sum(keeps) / len(keeps), 6)
