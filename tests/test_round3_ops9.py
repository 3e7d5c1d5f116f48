"""Round-3 batch-9 operators: robots meta directives and the
composed importance-x-change-rate recrawl priority."""

from pyspark.sql import functions as F

from flyscrape_spark.operators.metarobots import meta_robots


def test_meta_robots_directive_forms(spark):
    pages = spark.createDataFrame(
        [
            (0, '<meta name="robots" content="noindex, nofollow"/>'),
            (1, '<meta content="noindex" name="robots"/>'),  # reversed
            (2, '<meta name="robots" content="NOFOLLOW"/>'),  # case
            (3, '<meta name="robots" content="none"/>'),      # expands
            (4, "<p>no meta at all</p>"),
            (5, '<meta name="robots" content="index, follow"/>'),
            # multiple tags: directives UNION across tags (robots-meta
            # spec: most restrictive wins) — the second tag must not
            # be lost to a first-match-only extract
            (6, '<meta name="robots" content="noindex"/>'
                '<meta name="robots" content="nofollow"/>'),
            (7, '<meta name="robots" content="index"/>'
                '<meta content="none" name="robots"/>'),
        ],
        "doc_id long, html string",
    )
    out = {
        int(r["url"]): (r["noindex"], r["nofollow"])
        for r in meta_robots(
            pages.select(F.col("doc_id").cast("string").alias("url"), "html")
        ).collect()
    }
    assert out[0] == (True, True)
    assert out[1] == (True, False)
    assert out[2] == (False, True)
    assert out[3] == (True, True)   # none -> both
    assert out[4] == (False, False)
    assert out[5] == (False, False)
    assert out[6] == (True, True)   # union across two tags
    assert out[7] == (True, True)   # later reversed-order 'none' tag


def test_meta_robots_is_pure_jvm(spark):
    """Extraction must fuse into the scan — no Python boundary."""
    pages = spark.createDataFrame(
        [("u", '<meta name="robots" content="noindex"/>')],
        "url string, html string",
    )
    plan = meta_robots(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_recrawl_priority_orders_by_importance_times_rate(spark):
    """Composition sanity at sf0.001: priority == round(pr *
    lambda_hat * 86400, 8) row-wise, and static pages (lambda 0)
    carry zero priority regardless of rank."""
    from flyscrape_spark.queries import q_recrawl_priority

    rows = q_recrawl_priority(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert abs(r["priority"] - round(r["pr"] * r["lambda_hat"] * 86400.0, 8)) < 1e-9
    statics = [r for r in rows if r["lambda_hat"] == 0.0]
    assert all(r["priority"] == 0.0 for r in statics)
