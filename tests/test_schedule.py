"""schedule_crawl tests: per-host budget allocation over change-rate
estimates (top-k most volatile per host, deterministic tie-break)."""

from pyspark.sql import functions as F

from flyscrape_spark.operators.recrawl import schedule_crawl
from tests.conftest import spark  # noqa: F401


def _rates(spark):  # noqa: F811
    rows = []
    for h in range(3):
        for i in range(6):
            rows.append((f"http://h{h}.test/p/{i}",
                         float(i % 5) / 100.0, 1000.0 + i))
    return spark.createDataFrame(
        rows, "url string, lambda_hat double, next_due double")


def test_budget_per_host(spark):  # noqa: F811
    out = schedule_crawl(_rates(spark), budget_per_host=2).collect()
    assert len(out) == 6  # 3 hosts x 2
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        assert len(rs) == 2
        assert sorted(r["sched_rank"] for r in rs) == [1, 2]
        # the two highest lambda_hat values per host are 0.04 and 0.03
        assert sorted(round(r["lambda_hat"], 2) for r in rs) == [0.03, 0.04]


def test_tiebreak_is_url_order(spark):  # noqa: F811
    df = spark.createDataFrame(
        [("http://h.test/b", 0.5, 1.0), ("http://h.test/a", 0.5, 1.0)],
        "url string, lambda_hat double, next_due double")
    out = schedule_crawl(df, budget_per_host=1).collect()
    assert [r["url"] for r in out] == ["http://h.test/a"]
