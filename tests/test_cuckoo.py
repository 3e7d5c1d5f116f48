"""Cuckoo-filter shard tests: numpy kernel invariants (no false
negatives, low FP, delete, stash overflow) and the Spark shard layer
(cogrouped build/probe/delete, engine split contract)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flyscrape_spark.operators.cuckoo import (
    CuckooShards, _alt_index, _bulk_delete, _bulk_insert, _fingerprints,
    _index1, _lookup, _sized_buckets, _SLOTS,
)
from tests.conftest import spark  # noqa: F401  (session fixture)


def _rand_keys(n, seed, lo=-(1 << 62), hi=1 << 62):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=n, dtype=np.int64)


# ------------------------------------------------------------- kernels

def test_alt_index_is_an_involution():
    mask = (1 << 12) - 1
    keys = _rand_keys(5000, 1)
    f = _fingerprints(keys)
    i1 = _index1(keys, mask)
    i2 = _alt_index(i1, f, mask)
    assert np.array_equal(_alt_index(i2, f, mask), i1)
    assert ((i2 >= 0) & (i2 <= mask)).all()


def test_fingerprints_nonzero():
    assert (_fingerprints(_rand_keys(100_000, 2)) != 0).all()


def test_no_false_negatives_at_design_load():
    n = 20_000
    keys = _rand_keys(n, 3)
    tbl = np.zeros((_sized_buckets(n), _SLOTS), dtype=np.uint16)
    stash = _bulk_insert(tbl, keys)
    assert stash.size == 0  # 80% load: eviction loop always converges
    assert _lookup(tbl, stash, keys).all()


def test_false_positive_rate_low():
    n = 20_000
    keys = _rand_keys(n, 4)
    tbl = np.zeros((_sized_buckets(n), _SLOTS), dtype=np.uint16)
    stash = _bulk_insert(tbl, keys)
    other = _rand_keys(50_000, 5, lo=1 << 62, hi=(1 << 63) - 1)  # disjoint
    fp = _lookup(tbl, stash, other).mean()
    assert fp < 0.005  # 16-bit fp, 2 buckets x 4 slots: ~0.012% expected


def test_stash_overflow_keeps_exact_membership():
    # 3x the table's capacity: most keys cannot place, stash catches them
    keys = _rand_keys(96, 6)
    tbl = np.zeros((8, _SLOTS), dtype=np.uint16)  # capacity 32
    stash = np.sort(_bulk_insert(tbl, keys, max_rounds=20))
    assert stash.size > 0
    assert _lookup(tbl, stash, keys).all()


def test_delete_removes_and_preserves_others():
    n = 8_000
    keys = _rand_keys(n, 7)
    keys = np.unique(keys)
    tbl = np.zeros((_sized_buckets(len(keys)), _SLOTS), dtype=np.uint16)
    stash = _bulk_insert(tbl, keys)
    gone, kept = keys[: len(keys) // 2], keys[len(keys) // 2:]
    stash = _bulk_delete(tbl, stash, gone)
    # kept keys are still present (no false negatives survive deletion
    # of OTHER keys, up to fingerprint+bucket collisions — keys are
    # 64-bit random so collisions at n=8k are ~n^2 * 8/2^16/2^13,
    # i.e. essentially none at these sizes with distinct buckets;
    # assert exact)
    assert _lookup(tbl, stash, kept).all()
    # deleted keys are gone (fp collisions could keep a few positive)
    assert _lookup(tbl, stash, gone).mean() < 0.01


def test_delete_duplicates_multiset():
    keys = np.array([42, 42, 42], dtype=np.int64)
    tbl = np.zeros((8, _SLOTS), dtype=np.uint16)
    stash = _bulk_insert(tbl, keys)
    stash = _bulk_delete(tbl, stash, np.array([42, 42], dtype=np.int64))
    assert _lookup(tbl, stash, np.array([42], dtype=np.int64)).all()
    stash = _bulk_delete(tbl, stash, np.array([42], dtype=np.int64))
    assert not _lookup(tbl, stash, np.array([42], dtype=np.int64)).any()


def test_stash_overflow_delete():
    keys = _rand_keys(96, 8)
    keys = np.unique(keys)
    tbl = np.zeros((8, _SLOTS), dtype=np.uint16)
    stash = np.sort(_bulk_insert(tbl, keys, max_rounds=20))
    assert stash.size > 0
    stash = _bulk_delete(tbl, stash, keys)
    assert _lookup(tbl, stash, keys).mean() < 0.05


# --------------------------------------------------------- Spark layer

def _key_df(spark, keys):  # noqa: F811
    return spark.createDataFrame(
        [(int(k),) for k in keys], "url_key long")


def test_shards_build_probe(spark):  # noqa: F811
    seen = _rand_keys(4_000, 10)
    cf = CuckooShards(spark, n_shards=8, capacity_per_shard=2_000)
    cf.add_keys(_key_df(spark, seen))
    assert cf.n_keys == 4_000

    probe_keys = np.concatenate([seen[:500], _rand_keys(500, 11, lo=1 << 62,
                                                        hi=(1 << 63) - 1)])
    flagged = cf.flag(_key_df(spark, probe_keys)).toPandas()
    by_key = dict(zip(flagged["url_key"], flagged["__maybe"]))
    for k in seen[:500]:
        assert by_key[int(k)], "false negative"
    fp = np.mean([by_key[int(k)] for k in probe_keys[500:]])
    assert fp < 0.02


def test_shards_incremental_add_and_delete(spark):  # noqa: F811
    a, b = _rand_keys(1_000, 12), _rand_keys(1_000, 13)
    cf = CuckooShards(spark, n_shards=4, capacity_per_shard=2_000)
    cf.add_keys(_key_df(spark, a))
    cf.add_keys(_key_df(spark, b))
    assert cf.n_keys == 2_000
    both = cf.flag(_key_df(spark, np.concatenate([a, b]))).toPandas()
    assert both["__maybe"].all()

    cf.delete_keys(_key_df(spark, a))
    after = cf.flag(_key_df(spark, np.concatenate([a, b]))).toPandas()
    by_key = dict(zip(after["url_key"], after["__maybe"]))
    assert np.mean([by_key[int(k)] for k in a]) < 0.02  # retracted
    assert all(by_key[int(k)] for k in b)               # untouched


def test_split_contract(spark):  # noqa: F811
    seen = _rand_keys(2_000, 14)
    cf = CuckooShards(spark, n_shards=4, capacity_per_shard=1_000)
    cf.add_keys(_key_df(spark, seen))
    cand = _key_df(spark, np.concatenate(
        [seen[:300], _rand_keys(700, 15, lo=1 << 62, hi=(1 << 63) - 1)]))
    maybe, fresh = cf.split(cand)
    n_maybe, n_fresh = maybe.count(), fresh.count()
    assert n_maybe + n_fresh == 1_000
    # every seen candidate is on the maybe side (no false negatives)
    assert maybe.filter(F.col("url_key").isin(
        [int(k) for k in seen[:300]])).count() == 300


@pytest.mark.parametrize("name", ["follow_default", "depth_cycle"])
def test_engine_crawl_with_cuckoo_matches_plain(spark, name):  # noqa: F811
    from flyscrape_spark.plans.frontier import CrawlEngine
    from flyscrape_spark.sources.fixtures import SCENARIOS

    scenario = SCENARIOS[name]

    def run(cuckoo):
        engine = CrawlEngine(
            spark, scenario.config, scenario.transport(spark),
            seen_cuckoo=cuckoo,
        )
        result = engine.run(scenario.seeds)
        seen = sorted(
            (r["url"], r["depth"], r["discovery_order"])
            for r in result.seen.collect()
        )
        fetched = sorted(r["url"] for r in result.results.collect())
        return seen, fetched

    plain = run(None)
    filtered = run(CuckooShards(spark, n_shards=4, capacity_per_shard=4_096))
    assert filtered == plain


def test_invalidate_readmission_through_prefilter(spark):  # noqa: F811
    """The recrawl-invalidation flow: a URL retracted from the live
    filter must come out of split() on the DEFINITELY-new side, so the
    engine re-enqueues (refetches) it without consulting the exact
    anti-join — snapshots.invalidate's live-filter counterpart."""
    urls = [f"http://h{i % 5}.example/d/{i}" for i in range(1_000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string") \
        .withColumn("url_key", F.xxhash64("url"))
    cf = CuckooShards(spark, n_shards=4, capacity_per_shard=2_048)
    cf.add_keys(df)

    stale = df.filter(F.col("url").endswith("/7"))
    cf.delete_keys(stale)
    maybe, fresh = cf.split(df)
    readmitted = {r["url"] for r in fresh.collect()}
    assert {r["url"] for r in stale.collect()} <= readmitted
    # everything NOT retracted stays on the possibly-seen side
    assert maybe.count() == 1_000 - len(readmitted)
