"""Round-3 batch-11 operators: server-level politeness rollup and
per-depth frontier growth."""

from flyscrape_spark.operators.politeness import server_politeness


def test_server_politeness_throttle_and_fair_share(spark):
    hosts = spark.createDataFrame(
        [
            ("a.test", "1.1.1.1", 40.0),
            ("b.test", "1.1.1.1", 50.0),   # joint 90 > 60 cap
            ("c.test", "2.2.2.2", 20.0),   # alone, under cap
        ],
        "host string, ip string, requested_rate double",
    )
    out = {r["ip"]: r for r in server_politeness(hosts, server_cap=60.0).collect()}
    shared = out["1.1.1.1"]
    assert shared["n_hosts"] == 2
    assert shared["total_requested"] == 90.0
    assert shared["throttled"]
    assert shared["effective_host_rate"] == 30.0  # min(60, 90)/2
    solo = out["2.2.2.2"]
    assert not solo["throttled"]
    assert solo["effective_host_rate"] == 20.0    # min(60, 20)/1
    assert not solo["shared_hosting"]


def test_server_politeness_shared_hosting_flag(spark):
    rows = [(f"h{i}.test", "3.3.3.3", 1.0) for i in range(10)]
    out = server_politeness(
        spark.createDataFrame(rows, "host string, ip string, requested_rate double")
    ).collect()[0]
    assert out["shared_hosting"] and out["n_hosts"] == 10


def test_frontier_growth_consistency(spark):
    """Depth-0 row has NULL growth; every other row's growth equals
    the count ratio; counts sum to the flagship's 28 URLs."""
    from flyscrape_spark.queries import q_frontier_growth

    rows = sorted(
        q_frontier_growth(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["depth"],
    )
    assert rows[0]["depth"] == 0 and rows[0]["growth"] is None
    assert sum(r["n_urls"] for r in rows) == 28
    for prev, cur in zip(rows, rows[1:]):
        assert cur["growth"] == round(cur["n_urls"] / prev["n_urls"], 6)
