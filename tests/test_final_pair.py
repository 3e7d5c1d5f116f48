"""Final round-4 pair: priority dequeue + politeness resolution."""

from __future__ import annotations

from flyscrape_spark.operators.politeness import effective_delay
from flyscrape_spark.plans.frontier import take_front


def test_take_front_order_and_plan(spark):
    rows = [(f"u{i}", i % 3, i) for i in range(30)]
    frontier = spark.createDataFrame(
        rows, "url string, depth int, discovery_order long"
    )
    out = take_front(frontier, 7).collect()
    got = [(r["depth"], r["discovery_order"]) for r in out]
    expect = sorted(((i % 3, i) for i in range(30)))[:7]
    assert sorted(got) == expect
    plan = take_front(frontier, 7)._jdf.queryExecution().executedPlan()
    s = plan.toString()
    assert "TakeOrderedAndProject" in s
    assert "Exchange" not in s.split("== Initial Plan ==")[0]


def test_effective_delay_resolution(spark):
    robots = spark.createDataFrame(
        [("r-wins", 5.0), ("a-wins", 0.5), ("none", None),
         ("tie", 2.0), ("only-robots", 3.0)],
        "host string, crawl_delay double",
    )
    adaptive = spark.createDataFrame(
        [("r-wins", 2.0), ("a-wins", 4.0), ("none", 0.2), ("tie", 2.0),
         ("only-adaptive", 2.5)],
        "host string, adjusted_delay_s double",
    )
    out = {r["host"]: r for r in
           effective_delay(robots, adaptive, default_delay_s=1.0).collect()}
    assert (out["r-wins"]["effective_delay_s"],
            out["r-wins"]["source"]) == (5.0, "robots")
    assert (out["a-wins"]["effective_delay_s"],
            out["a-wins"]["source"]) == (4.0, "adaptive")
    # neither signal beats the default
    assert (out["none"]["effective_delay_s"],
            out["none"]["source"]) == (1.0, "default")
    # tie prefers the explicit robots ask
    assert out["tie"]["source"] == "robots"
    # full-outer edges: host present on only one side
    assert (out["only-robots"]["effective_delay_s"],
            out["only-robots"]["source"]) == (3.0, "robots")
    assert (out["only-adaptive"]["effective_delay_s"],
            out["only-adaptive"]["source"]) == (2.5, "adaptive")
