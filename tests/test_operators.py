"""Operator tests: sinks, multimodal plumbing, nested scrape, and the
dedup/text/ann operator family (semantics pinned here; cross-engine
value equality is pinned by tools/check_oracles.py against DuckDB)."""

import json

import pyspark.sql.functions as F
import pytest

from flyscrape_spark.config import CrawlConfig
from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.fixtures import SCENARIOS
from flyscrape_spark.sources.transport import JoinTransport


# ------------------------------------------------------------------ sinks

def test_json_sinks(spark, tmp_path):
    from flyscrape_spark.operators.sinks import to_json_array, write_ndjson
    from flyscrape_spark.parse.udfs import make_extract_udf

    scenario = SCENARIOS["extract_basic"]
    udf = make_extract_udf({"headline": ("h1", "text")})
    result = CrawlEngine(
        spark, scenario.config, scenario.transport(spark), extract_udf=udf
    ).run(scenario.seeds)

    arr = json.loads(to_json_array(result.results))
    assert len(arr) == 1
    assert arr[0]["url"] == "https://localhost/"
    assert arr[0]["data"]["headline"] == "headline"
    assert arr[0]["error"] is None and arr[0]["timestamp"]

    out = str(tmp_path / "ndjson")
    write_ndjson(result.results, out)
    back = spark.read.json(out)
    assert back.count() == 1
    assert set(back.columns) >= {"url", "data"}


def test_sink_skips_empty_rows(spark):
    # json.go:67-69: rows with neither data nor error are skipped
    from flyscrape_spark.operators.sinks import to_json_array

    scenario = SCENARIOS["extract_basic"]
    result = CrawlEngine(
        spark, scenario.config, scenario.transport(spark)  # no extract udf
    ).run(scenario.seeds)
    assert json.loads(to_json_array(result.results)) == []


# ------------------------------------------------------------- multimodal

def test_media_pipeline(spark):
    from flyscrape_spark.operators.multimodal import (
        extract_features,
        media_from_results,
    )

    pages = spark.createDataFrame(
        [
            ("http://m.test/", "m.test", 200,
             '<img src="/a.png"><img src="/b.png"><a href="/p2">n</a>'),
            ("http://m.test/p2", "m.test", 200, '<img src="/a.png">'),
        ],
        "url string, host string, status int, html string",
    )
    config = CrawlConfig(depth=1)
    result = CrawlEngine(spark, config, JoinTransport(pages, config)).run(
        ["http://m.test/"]
    )
    media = media_from_results(result.results)
    refs = sorted(r["media_ref"] for r in media.collect())
    assert refs == ["/a.png", "/b.png"]  # deduped across pages

    feats = extract_features(media)
    rows = {r["media_ref"]: r for r in feats.collect()}
    assert rows["/a.png"]["byte_len"] > 0
    assert rows["/a.png"]["width"] >= 16 and rows["/a.png"]["height"] >= 16
    # deterministic
    rows2 = {r["media_ref"]: r for r in extract_features(media).collect()}
    assert rows == rows2


# ----------------------------------------------------------- simhash pairs

def test_simhash_near_dup_pairs(spark):
    """Banded hamming join finds exactly the pairs within the distance
    bound: identical docs pair at hamming 0, a one-word edit stays
    near, an unrelated doc pairs with nothing."""
    from flyscrape_spark.operators.dedup import simhash_near_dup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (2, "the quick brown fox jumps over the lazy cat"),  # near dup
            (3, "entirely unrelated totally different corpus text words here"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup(docs, bits=16, bands=4, max_distance=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert all(h <= 3 for h in pairs.values())
    assert not any(3 in p for p in pairs)


# ----------------------------------------------------------- nested scrape

def test_nested_scrape(spark):
    """js_test.go:205-261: child fetched+extracted inline, resolved
    against the parent URL; child NOT in seen/frontier."""
    from flyscrape_spark.parse.udfs import make_extract_udf
    from flyscrape_spark.plans.nested import scrape_children

    pages = spark.createDataFrame(
        [
            ("http://localhost/", "localhost", 200,
             '<h1>parent</h1><span class="ref">/foo</span>'),
            ("http://localhost/foo", "localhost", 200, "<h1>child</h1>"),
        ],
        "url string, host string, status int, html string",
    )
    config = CrawlConfig(depth=0, domain_filter=False)
    transport = JoinTransport(pages, config)
    result = CrawlEngine(spark, config, transport).run(["http://localhost/"])

    # child never entered seen/frontier (scrape.go:224-268 skips
    # ReceiveResponse for processImmediate)
    assert {r["url"] for r in result.seen.collect()} == {"http://localhost/"}

    parents = result.results.withColumn("child_ref", F.lit("/foo"))
    child_udf = make_extract_udf({"title": ("h1", "text")})
    nested = scrape_children(parents, "child_ref", transport, child_udf)
    row = nested.collect()[0]
    assert row["child_url"] == "http://localhost/foo"
    assert json.loads(row["child_data"])["title"] == "child"
    assert row["child_error"] is None


def test_nested_scrape_two_deep(spark):
    """js_test.go:205-261 TestJSScrapeParamScrapeDeep: scrape('/foo/',
    fn) whose fn itself calls scrape('bar', ...) — the grandchild ref
    resolves against the CHILD's URL (/foo/ + bar -> /foo/bar), and
    the grandchild payload nests inside the child payload."""
    from flyscrape_spark.parse.udfs import make_extract_udf
    from flyscrape_spark.plans.nested import scrape_children

    pages = spark.createDataFrame(
        [
            ("http://localhost/", "localhost", 200, "<h1>root</h1>"),
            ("http://localhost/foo/", "localhost", 200, "<h1>mid</h1>"),
            ("http://localhost/foo/bar", "localhost", 200, "<h1>leaf</h1>"),
        ],
        "url string, host string, status int, html string",
    )
    transport = JoinTransport(pages, CrawlConfig())
    parents = spark.createDataFrame(
        [("http://localhost/", "/foo/")], "url string, child_ref string"
    )
    leaf_udf = make_extract_udf({"title": ("h1", "text")})

    def mid_level(fetched_children):
        # the child page's own scrape('bar', fn): one more generation,
        # resolved against the child URL
        mid = fetched_children.withColumn("gc_ref", F.lit("bar"))
        out = scrape_children(mid, "gc_ref", transport, leaf_udf, prefix="deep")
        return out.select(
            "url",
            F.to_json(
                F.struct(
                    F.get_json_object("deep_data", "$.url").alias("deep"),
                    F.col("url"),
                )
            ).alias("data"),
            "error",
        )

    nested = scrape_children(
        parents, "child_ref", transport, child_results_fn=mid_level
    )
    row = nested.collect()[0]
    assert row["child_url"] == "http://localhost/foo/"
    data = json.loads(row["child_data"])
    assert data["url"] == "http://localhost/foo/"
    assert data["deep"] == "http://localhost/foo/bar"  # /foo/ + bar


# ------------------------------------------------------ dedup/ann behavior

def test_exact_dedup_groups(spark):
    from flyscrape_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    groups = {r["representative"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert groups == {1: 2, 3: 1}  # normalization folds case+whitespace


def test_minhash_lsh_finds_near_dups(spark):
    from flyscrape_spark.operators.dedup import minhash_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra tail"),      # near-dup of 1
            (3, "completely different content about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_srp_topk_contains_query(spark):
    from flyscrape_spark.operators.ann import srp_topk

    import math

    vecs = [(i, [math.sin(i * d + 1) for d in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qv = vecs[7][1]
    top = srp_topk(emb, qv, k=5, num_planes=4)
    rows = top.collect()
    assert rows[0]["vec_id"] == 7 and rows[0]["cosine"] == 1.0


def test_ivf_topk_exact_when_probing_all(spark):
    """nprobe == n_centroids degrades IVF to exact brute force: the
    result must equal cosine_topk on the full corpus."""
    import math

    from flyscrape_spark.operators.ann import cosine_topk, ivf_topk

    vecs = [(i, [math.sin(i * d + 1) for d in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    query = emb.filter("vec_id = 7").selectExpr("embedding AS qv")
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(emb, vecs[7][1], k=5).collect()]
    ivf_all = [(r["vec_id"], r["cosine"])
               for r in ivf_topk(emb, query, k=5, n_centroids=8, nprobe=8).collect()]
    assert ivf_all == exact


def test_ivf_topk_probes_subset(spark):
    import math

    from flyscrape_spark.operators.ann import ivf_assign, ivf_topk

    vecs = [(i, [math.sin(i * d + 1) for d in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    query = emb.filter("vec_id = 7").selectExpr("embedding AS qv")
    top = ivf_topk(emb, query, k=5, n_centroids=8, nprobe=2).collect()
    # the query vector itself is always in a probed list
    assert top[0]["vec_id"] == 7 and top[0]["cosine"] == 1.0
    # every vector is assigned exactly one centroid
    assign = ivf_assign(emb, n_centroids=8)
    assert assign.count() == 60
    assert assign.select("vec_id").distinct().count() == 60
    assert assign.select("cent_id").distinct().count() <= 8


def test_repetition_scores(spark):
    from flyscrape_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),        # no repetition
            (2, "spam spam spam spam"),    # max repetition
            (3, "one"),                    # single word: no bigrams
            (4, ""),                       # empty
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert rows[1]["dup_word_frac"] == 0.0
    assert rows[2]["dup_word_frac"] == 0.75      # 4 words, 1 distinct
    assert rows[2]["top_bigram_frac"] == 1.0     # "spam spam" x3
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[4]["top_bigram_frac"] == 0.0


def test_tfidf_top_terms(spark):
    from flyscrape_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "durian durian durian"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 3: "durian" df=1 -> idf=ln(5/2), tf=3 — its only (and top) term
    assert [r["term"] for r in by_doc[3]] == ["durian"]
    import math
    assert by_doc[3][0]["score"] == round(3 * math.log(5 / 2), 6)
    # doc 1: "apple" (tf=2, df=1) outscores shared terms
    assert by_doc[1][0]["term"] == "apple" and by_doc[1][0]["rank"] == 1
    # empty doc yields no rows; ranks never exceed k
    assert 4 not in by_doc and all(r["rank"] <= 2 for r in rows)
    # shuffle-join path produces identical rows
    nob = tfidf_top_terms(docs, k=2, broadcast_idf=False).collect()
    assert sorted(map(tuple, nob)) == sorted(map(tuple, rows))


def test_top_ngrams(spark):
    from flyscrape_spark.operators.text import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "to be or not to be"),
            (2, "to be is to be"),
            (3, "one"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [r["ngram"] for r in rows][0] == "to be"   # 4 occurrences
    assert rows[0]["n_occurrences"] == 4
    # short/empty docs contribute no grams; ties break on ngram text
    counts = {r["ngram"]: r["n_occurrences"] for r in rows}
    assert all(c <= 4 for c in counts.values()) and len(rows) == 3
    tri = top_ngrams(docs, n=3, k=10).collect()
    assert {r["ngram"] for r in tri} >= {"to be or", "to be is"}


def test_resize_images_contract(spark):
    from flyscrape_spark.operators.multimodal import resize_images

    media = spark.createDataFrame(
        [("a", bytes([200, 10]) * 40),   # w=16+200%64=24, h=16+10=26
         ("b", bytes([1])),              # w=17, h=16 (no 2nd byte)
         ("c", b"")],                    # empty -> zeros
        "media_ref string, content binary")
    rows = {r["media_ref"]: r for r in resize_images(media, max_dim=20).collect()}
    a = rows["a"]
    assert (a["width"], a["height"]) == (24, 26)
    # longest side 26 -> out = (24*20//26, 20) = (18, 20); len = min(80, 38)
    assert (a["out_width"], a["out_height"]) == (18, 20)
    assert len(a["content"]) == 38
    b = rows["b"]
    assert (b["out_width"], b["out_height"]) == (17, 16)  # within max? 17<=20
    assert rows["c"]["out_width"] == 0 and rows["c"]["content"] == b""


def test_sample_frames_fanout(spark):
    from flyscrape_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [("v", b"x" * 16)],  # 16 bytes -> 2000 ms -> 2 frames @1000ms
        "media_ref string, content binary")
    rows = sorted(sample_frames(media, every_ms=1000).collect(),
                  key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [(0, 0), (1, 1000)]
    import hashlib
    assert bytes(rows[0]["frame"]) == hashlib.md5(b"v:0").hexdigest().encode()
    # deterministic across runs
    again = sorted(sample_frames(media, every_ms=1000).collect(),
                   key=lambda r: r["frame_idx"])
    assert [bytes(r["frame"]) for r in again] == [bytes(r["frame"]) for r in rows]
