"""Curation funnel (operators/curate.py): quality gate → exact dedup
→ near-dup representative, pinned on a hand-built corpus where every
outcome class occurs."""

from flyscrape_spark.operators.curate import curate

GOOD = "the quick brown fox jumps over the lazy dog and runs of into town"


def test_curate_labels(spark):
    docs = spark.createDataFrame(
        [
            # 0: keeper (en, long enough, low repetition)
            (0, GOOD, "en"),
            # 1: exact duplicate of 0 (same normalized text, higher id)
            (1, "  " + GOOD.upper() + "  ", "en"),
            # 2: near duplicate of 0 (one word changed -> close simhash)
            (2, GOOD.replace("lazy", "sleepy"), "en"),
            # 3: too short
            (3, "the of and", "en"),
            # 4: too repetitive
            (4, "the the the the the the the the", "en"),
            # 5: wrong language
            (5, "el la de el la de el la de el la de", "es"),
            # 6: independent keeper
            (6, "a completely different story about ships and the sea "
                "with many of the finest sailors", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in curate(docs, min_tokens=5).collect()}
    assert len(out) == 7

    assert out[0]["kept"] and out[0]["drop_reason"] is None
    assert out[1]["drop_reason"] == "exact_duplicate"
    assert out[3]["drop_reason"] == "quality"
    assert out[4]["drop_reason"] == "quality"
    assert out[5]["drop_reason"] == "quality"
    assert out[5]["lang_pred"] == "es"
    assert out[6]["kept"]
    # doc 2: near-dup of 0 IF simhash put them in one component —
    # structural invariant either way: exactly one keeper per cluster
    assert out[2]["drop_reason"] in (None, "near_duplicate")
    clusters = {}
    for r in out.values():
        if r["kept"]:
            clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in clusters.items():
        assert len(members) == 1, f"cluster {cid} kept {members}"
    # keeper is always the min doc_id among its cluster's survivors
    if out[2]["drop_reason"] == "near_duplicate":
        assert out[2]["cluster_id"] == out[0]["cluster_id"]


def test_curate_empty_and_all_dupes(spark):
    docs = spark.createDataFrame(
        [(i, GOOD, "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    out = curate(docs).collect()
    kept = [r["doc_id"] for r in out if r["kept"]]
    assert kept == [0]
    reasons = sorted(r["drop_reason"] for r in out if not r["kept"])
    assert reasons == ["exact_duplicate"] * 3


def test_flag_contaminated(spark):
    from flyscrape_spark.operators.curate import flag_contaminated

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # benchmark doc
            (2, "x alpha beta gamma y"),        # shares 3-gram "alpha beta gamma"
            (3, "completely different words here"),
            (4, "beta gamma alpha"),            # same words, different order: clean
            (5, "ab"),                          # shorter than n: clean
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1")
    out = {r["doc_id"]: r for r in flag_contaminated(docs, bench, n=3).collect()}
    assert len(out) == 5                        # every doc labeled
    assert out[1]["contaminated"] and out[1]["n_hits"] == 2
    assert out[2]["contaminated"] and out[2]["n_hits"] == 1
    assert not out[3]["contaminated"] and out[3]["n_hits"] == 0
    assert not out[4]["contaminated"]
    assert not out[5]["contaminated"]
