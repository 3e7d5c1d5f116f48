"""Cycle-planning batch: composed fetch plan, shard balance report,
discovery-channel attribution."""

from __future__ import annotations

from flyscrape_spark.functions.hashing import portable_hash64
from flyscrape_spark.operators.budget import cycle_plan, shard_assignment
from flyscrape_spark.operators.discovery import discovery_mix


def test_cycle_plan_composition(spark):
    # h1: 5 pending at 1s delay -> cap 60; h2: 100 pending at 2s ->
    # cap 30; h3: 10 pending, NO delay row -> cap 0 (robots-unknown
    # hosts get nothing). budget 20 -> h1 fully funded (c=5), h2
    # levels at 15, h3 at 0.
    frontier = spark.createDataFrame(
        [("h1", f"u{i}") for i in range(5)]
        + [("h2", f"v{i}") for i in range(100)]
        + [("h3", f"w{i}") for i in range(10)],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("h1", 1.0), ("h2", 2.0)], "host string, adjusted_delay_s double"
    )
    out = {
        r["host"]: r
        for r in cycle_plan(frontier, delays, budget=20, cycle_s=60).collect()
    }
    assert (out["h1"]["demand"], out["h1"]["cap"], out["h1"]["alloc"]) == (
        5, 60, 5.0,
    )
    assert (out["h2"]["demand"], out["h2"]["cap"], out["h2"]["alloc"]) == (
        100, 30, 15.0,
    )
    assert out["h2"]["coverage"] == 0.15
    assert (out["h3"]["cap"], out["h3"]["alloc"]) == (0, 0.0)
    assert sum(r["alloc"] for r in out.values()) == 20.0


def test_cycle_plan_zero_delay_is_unconstrained(spark):
    """A host whose adjusted delay is 0 has NO pacing constraint —
    its cap must be its demand (not NULL-coalesced to 0, which gave
    the LEAST-constrained host zero budget), and NULL delay stays
    cap-0 like an absent row."""
    frontier = spark.createDataFrame(
        [("fast", f"u{i}") for i in range(8)]
        + [("slow", f"v{i}") for i in range(8)]
        + [("nul", f"w{i}") for i in range(4)],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("fast", 0.0), ("slow", 2.0), ("nul", None)],
        "host string, adjusted_delay_s double",
    )
    out = {
        r["host"]: r
        for r in cycle_plan(frontier, delays, budget=100, cycle_s=60).collect()
    }
    assert out["fast"]["cap"] == 8          # demand-bounded, not 0
    assert out["fast"]["alloc"] == 8.0      # fully funded under big budget
    assert out["slow"]["cap"] == 30
    assert (out["nul"]["cap"], out["nul"]["alloc"]) == (0, 0.0)


def test_shard_assignment_balance(spark):
    hosts = spark.createDataFrame(
        [(f"h{i}.example", 10) for i in range(64)],
        "host string, n_urls long",
    )
    out = shard_assignment(hosts, n_shards=4, hash_fn=portable_hash64)
    rows = out.collect()
    assert {r["shard"] for r in rows} <= {0, 1, 2, 3}
    assert sum(r["n_hosts"] for r in rows) == 64
    assert sum(r["n_urls"] for r in rows) == 640
    # load_factor averages 1.0 by construction
    assert abs(sum(r["load_factor"] * r["n_urls"] / 640 for r in rows)
               - sum(r["n_urls"] ** 2 for r in rows) * 4 / 640**2) < 1e-9


def test_shard_assignment_deterministic(spark):
    hosts = spark.createDataFrame(
        [("a.example", 1), ("b.example", 2)], "host string, n_urls long"
    )
    a = sorted(map(tuple, shard_assignment(hosts, 8).collect()))
    b = sorted(map(tuple, shard_assignment(hosts, 8).collect()))
    assert a == b


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, channel string, gen long"
    )


def test_discovery_mix_first_wins(spark):
    ev = _events(spark, [
        # u1: sitemap@0 beats link@2
        ("u1", "h", "sitemap", 0), ("u1", "h", "link", 2),
        # u2: same-gen tie -> seed outranks feed
        ("u2", "h", "feed", 1), ("u2", "h", "seed", 1),
        # u3: plain link
        ("u3", "h", "link", 3),
        # u4: unknown channel ranks last on tie with link
        ("u4", "h", "wayback", 1), ("u4", "h", "link", 1),
    ])
    r = discovery_mix(ev).collect()[0]
    assert (r["n_urls"], r["n_seed"], r["n_sitemap"], r["n_feed"],
            r["n_link"]) == (4, 1, 1, 0, 2)
    assert r["link_share"] == 0.5


def test_discovery_mix_unknown_channel_preserved(spark):
    ev = _events(spark, [("u1", "h", "wayback", 0)])
    r = discovery_mix(ev).collect()[0]
    # counted in n_urls, credited to no named channel
    assert (r["n_urls"], r["n_seed"] + r["n_sitemap"] + r["n_feed"]
            + r["n_link"]) == (1, 0)
