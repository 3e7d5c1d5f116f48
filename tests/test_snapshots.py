"""Checkpoint/resume: a killed crawl resumes from the last complete
generation snapshot with zero re-fetches of committed work
(north_rule; reference analog is the bbolt cache idempotency,
/root/reference/modules/cache/cache.go)."""

import json

import pytest

from flyscrape_spark.plans.frontier import CrawlEngine
from flyscrape_spark.sources.fixtures import SCENARIOS
from flyscrape_spark.sources.snapshots import SnapshotStore


@pytest.fixture
def scenario():
    return SCENARIOS["depth_cycle"]


def canonical(result):
    return [
        (r["depth"], r["discovery_order"], r["url"])
        for r in result.seen.orderBy("discovery_order").collect()
    ]


def test_checkpointed_equals_plain(spark, scenario, tmp_path):
    plain = CrawlEngine(spark, scenario.config, scenario.transport(spark)).run(
        scenario.seeds
    )
    store = SnapshotStore(str(tmp_path / "snap"))
    ck = CrawlEngine(
        spark, scenario.config, scenario.transport(spark), checkpoint=store
    ).run(scenario.seeds)
    assert canonical(ck) == canonical(plain)
    strip = lambda ms: [{k: v for k, v in m.items() if k != "sec"} for m in ms]
    assert strip(ck.metrics) == strip(plain.metrics)


def test_kill_and_resume_zero_refetch(spark, scenario, tmp_path):
    store_dir = str(tmp_path / "snap")

    # uninterrupted reference run (no checkpoint)
    full = CrawlEngine(spark, scenario.config, scenario.transport(spark)).run(
        scenario.seeds
    )

    # "killed" run: stop after generation 1 commits
    killed = CrawlEngine(
        spark, scenario.config, scenario.transport(spark),
        checkpoint=SnapshotStore(store_dir), max_generations=2,
    ).run(scenario.seeds)
    assert killed.generations == 2

    # resume with a fresh engine over the same store
    resumed = CrawlEngine(
        spark, scenario.config, scenario.transport(spark),
        checkpoint=SnapshotStore(store_dir),
    ).run(scenario.seeds)

    assert canonical(resumed) == canonical(full)
    # metrics = 2 replayed-from-manifest + only the NEW generations;
    # fetch work re-done is exactly the post-kill generations
    strip = lambda ms: [{k: v for k, v in m.items() if k != "sec"} for m in ms]
    assert strip(resumed.metrics[:2]) == strip(full.metrics[:2])
    new_gens = resumed.metrics[2:]
    assert [m["generation"] for m in new_gens] == [
        m["generation"] for m in full.metrics[2:]
    ]
    refetched = sum(m["fetched"] for m in new_gens)
    assert refetched == sum(m["fetched"] for m in full.metrics[2:])


def test_invalidate_forces_refetch(spark, scenario, tmp_path):
    """Cache bypass (utils.go:14, cache.go:89-95): invalidating a URL
    after a completed crawl makes the next resume refetch exactly that
    URL — everything else stays zero-refetch."""
    store_dir = str(tmp_path / "snap")
    target = "http://www.google.com"

    first = CrawlEngine(
        spark, scenario.config, scenario.transport(spark),
        checkpoint=SnapshotStore(store_dir),
    ).run(scenario.seeds)
    n_gens = len(first.metrics)
    assert target in {r["url"] for r in first.results.collect()}

    store = SnapshotStore(store_dir)
    assert store.invalidate(spark, [target]) == 1
    # dropped from the committed snapshots
    for m in store.manifests():
        snap = spark.read.parquet(m["tables"]["fetched"])
        assert snap.filter(snap["url"] == target).count() == 0

    resumed = CrawlEngine(
        spark, scenario.config, scenario.transport(spark),
        checkpoint=SnapshotStore(store_dir),
    ).run(scenario.seeds)

    # exactly one new generation fetching exactly the invalidated URL
    new_gens = resumed.metrics[n_gens:]
    assert sum(m["fetched"] for m in new_gens) == 1
    rows = resumed.results.filter(resumed.results["url"] == target).collect()
    assert len(rows) == 1 and rows[0]["status"] == 200
    # full result set equals the pre-invalidation crawl's URL set
    assert {r["url"] for r in resumed.results.collect()} == {
        r["url"] for r in first.results.collect()
    }
    # idempotent: a further resume refetches nothing
    again = CrawlEngine(
        spark, scenario.config, scenario.transport(spark),
        checkpoint=SnapshotStore(store_dir),
    ).run(scenario.seeds)
    assert sum(m["fetched"] for m in again.metrics[len(resumed.metrics):]) == 0


def test_manifest_lineage_recorded(spark, scenario, tmp_path):
    store = SnapshotStore(str(tmp_path / "snap"))
    CrawlEngine(
        spark, scenario.config, scenario.transport(spark), checkpoint=store
    ).run(scenario.seeds)
    manifests = store.manifests()
    assert manifests, "no manifests committed"
    for m in manifests:
        assert {"frontier", "fetched", "links"} <= set(m["tables"])
        assert m["lineage"], "per-partition lineage missing"
        for part in m["lineage"]:
            assert part["rows"] > 0
            assert part["host_min"] <= part["host_max"]
        json.dumps(m)  # manifest is valid JSON-serializable
