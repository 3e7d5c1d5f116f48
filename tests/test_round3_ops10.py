"""Round-3 batch-10 operators: media fetch planning and multimodal
sample serialization over interleaved spans."""

from pyspark.sql import functions as F

from flyscrape_spark.operators.multimodal import (
    interleave_render,
    media_frontier,
)

_SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d0", [("text", "hello", "", 0),
                    ("media", "", "/m/1.png", 1),
                    ("link", "next", "http://x/2", 2)]),
            ("d1", [("media", "", "/m/1.png", 0),
                    ("media", "", "/m/2.png", 1)]),
            ("d2", [("text", "plain", "", 0)]),
        ],
        _SPAN_SCHEMA,
    )


def test_media_frontier_demand_and_antijoin(spark):
    fetched = spark.createDataFrame([("/m/2.png",)], "media_ref string")
    out = {r["media_ref"]: r
           for r in media_frontier(_docs(spark), fetched=fetched).collect()}
    # /m/1.png demanded twice, first by d0; /m/2.png already fetched
    assert set(out) == {"/m/1.png"}
    assert out["/m/1.png"]["n_refs"] == 2
    assert out["/m/1.png"]["first_doc"] == "d0"


def test_media_frontier_without_fetched_set(spark):
    out = {r["media_ref"]: r["n_refs"]
           for r in media_frontier(_docs(spark)).collect()}
    assert out == {"/m/1.png": 2, "/m/2.png": 1}


def test_interleave_render_order_and_sentinels(spark):
    out = {r["doc_id"]: r for r in interleave_render(_docs(spark)).collect()}
    assert out["d0"]["sample"] == "hello <|media:/m/1.png|> next"
    assert out["d0"]["n_spans"] == 3 and out["d0"]["n_media"] == 1
    assert out["d1"]["sample"] == "<|media:/m/1.png|> <|media:/m/2.png|>"
    assert out["d2"]["sample"] == "plain" and out["d2"]["n_media"] == 0


def test_interleave_render_sorts_by_offset(spark):
    """Spans arriving out of order must still render in offset order."""
    docs = spark.createDataFrame(
        [("d", [("text", "second", "", 1), ("text", "first", "", 0)])],
        _SPAN_SCHEMA,
    )
    assert interleave_render(docs).collect()[0]["sample"] == "first second"


def test_interleave_render_no_shuffle(spark):
    plan = (
        interleave_render(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
