"""Per-partition cuckoo-filter shards over 64-bit URL keys — the
second half of the north-star's "broadcast bloom filter plus
per-partition cuckoo-filter shards" URL-seen design (the reference
keeps one in-process visited hashmap, /root/reference/scrape.go:62-67).

Why a cuckoo filter next to the bloom (Fan, Andersen, Kaminsky,
Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014):

- **Sharded, not broadcast.** The filter lives as a DataFrame of
  ``(shard_id, table)`` rows, hash-sharded on the key — the same
  ``pmod(url_key, n_shards)`` both sides compute — and probes run as a
  cogrouped ``applyInPandas``: each task gets ONE shard's bytes plus
  the frontier rows that hash to it. Nothing is driver-held, so the
  structure scales past the broadcast bloom's ~10^8-10^9-key ceiling
  (operators/bloom.py sizing math) to the 10^10 design point: 10^10
  keys at ~2.4 bytes/key is ~24 GB TOTAL, but spread over (say) 4096
  shards it is ~6 MB per task — executor-sized, like the seen store's
  buckets.
- **Deletion.** A cuckoo filter stores displaceable fingerprints, so
  it supports delete — cache invalidation and recrawl re-admission
  (sources/snapshots.py ``invalidate``) can retract keys, which a
  bloom bitmap fundamentally cannot.
- **Lower FP per bit at low rates.** 16-bit fingerprints in 4-slot
  buckets give FP ≈ 2·4/2^16 ≈ 0.012% at ~19 bits/key vs a bloom's
  ~20 bits/key for the same rate.

Semantics guarantee: NO FALSE NEGATIVES, ever — inserts that the
bounded-eviction loop cannot place go to a per-shard overflow stash
that lookups also consult, so a key that was added always probes
positive (until deleted). False positives only route a candidate
through the exact anti-join; the engine's output is exact either way
(plans/frontier.py step 3a).

All kernels are numpy-vectorized over Arrow batches: the eviction loop
iterates over ROUNDS (a shrinking pending array), never over rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, IntegerType, LongType, StructField, StructType,
)

_SLOTS = 4                 # fingerprints per bucket (CF paper's b=4)
_MAX_LOAD = 0.8            # sizing target; b=4 sustains ~0.95 max
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)   # splitmix64 finalizer
_MIX2 = np.uint64(0x94D049BB133111EB)   # (public-domain PRNG constants)
_SEED_F = 0x9E3779B97F4A7C15   # fingerprint stream
_SEED_I = 0xC2B2AE3D27D4EB4F   # primary-index stream
_SEED_A = 0x165667B19E3779F9   # alt-index (fingerprint-hash) stream


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over uint64, seeded per stream."""
    with np.errstate(over="ignore"):
        h = h + np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        h = (h ^ (h >> np.uint64(30))) * _MIX1
        h = (h ^ (h >> np.uint64(27))) * _MIX2
        return h ^ (h >> np.uint64(31))


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint per key (0 is the empty slot)."""
    f = (_mix(keys.astype(np.uint64), _SEED_F)
         & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _index1(keys: np.ndarray, mask: int) -> np.ndarray:
    return (_mix(keys.astype(np.uint64), _SEED_I)
            & np.uint64(mask)).astype(np.int64)


def _alt_index(idx: np.ndarray, fps: np.ndarray, mask: int) -> np.ndarray:
    """Partial-key cuckoo hashing: i2 = i1 XOR h(fp). n_buckets is a
    power of two, so XOR stays in range and the relation is an
    involution — either bucket recovers the other from the
    fingerprint alone, which is what makes eviction possible without
    the original key."""
    h = (_mix(fps.astype(np.uint64), _SEED_A)
         & np.uint64(mask)).astype(np.int64)
    return idx ^ h


def _stash_codes(fps: np.ndarray, i1: np.ndarray, mask: int) -> np.ndarray:
    """Canonical 64-bit code for the overflow stash: the smaller of the
    two buckets concatenated with the fingerprint — computable from
    (fp, either index), so lookup and delete derive it identically."""
    alt = _alt_index(i1, fps, mask)
    canon = np.minimum(i1, alt).astype(np.uint64)
    return (canon << np.uint64(16)) | fps.astype(np.uint64)


def _sized_buckets(capacity: int) -> int:
    """Power-of-two bucket count holding ``capacity`` keys at
    ≤ _MAX_LOAD (≥ 8 buckets)."""
    need = max(int(np.ceil(capacity / (_SLOTS * _MAX_LOAD))), 8)
    return 1 << int(np.ceil(np.log2(need)))


def _bulk_insert(tbl: np.ndarray, keys: np.ndarray,
                 max_rounds: int = 500) -> np.ndarray:
    """Insert ``keys`` into ``tbl`` ((n_buckets, _SLOTS) uint16,
    mutated in place); returns stash codes for keys the eviction loop
    could not place (usually empty below _MAX_LOAD).

    Vectorized placement rounds: sort pending fingerprints by target
    bucket, rank within bucket, fill that bucket's free slots by rank;
    the first unplaced key per full bucket evicts a resident (who
    moves to its alternate bucket as new pending work), the rest bounce
    to their own alternate bucket and retry next round.
    """
    n_buckets = tbl.shape[0]
    mask = n_buckets - 1
    pending_f = _fingerprints(keys)
    pending_i = _index1(keys, mask)
    rounds = 0
    while len(pending_f) and rounds < max_rounds:
        rounds += 1
        order = np.argsort(pending_i, kind="stable")
        pf, pi = pending_f[order], pending_i[order]
        first = np.r_[True, pi[1:] != pi[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(len(pi)), 0))
        rank = np.arange(len(pi)) - grp_start
        rows = tbl[pi]                       # (m, _SLOTS) gathered
        z = rows == 0
        c = np.cumsum(z, axis=1)
        free_cnt = c[:, -1]
        can = rank < free_cnt
        # slot of the (rank+1)-th free position in the bucket row;
        # ranks are distinct within a bucket, so scatter targets are too
        target = (c == (rank + 1)[:, None]) & z
        slot = np.argmax(target, axis=1)
        tbl[pi[can], slot[can]] = pf[can]
        left = ~can
        if not left.any():
            return np.empty(0, dtype=np.uint64)
        lf, li = pf[left], pi[left]
        lrank, lfree = rank[left], free_cnt[left]
        evict = lrank == lfree               # exactly one per full bucket
        ef, ei = lf[evict], li[evict]
        vslot = (rounds + ei) % _SLOTS       # rotating victim slot
        victims = tbl[ei, vslot].copy()      # nonzero: bucket is full here
        tbl[ei, vslot] = ef
        bf, bi = lf[~evict], li[~evict]      # bounce to own alt bucket
        pending_f = np.concatenate([victims, bf])
        pending_i = np.concatenate(
            [_alt_index(ei, victims, mask), _alt_index(bi, bf, mask)])
    if not len(pending_f):
        return np.empty(0, dtype=np.uint64)
    return _stash_codes(pending_f, pending_i, mask)


def _lookup(tbl: np.ndarray, stash: np.ndarray,
            keys: np.ndarray) -> np.ndarray:
    """Boolean membership per key: fingerprint in either bucket, or in
    the overflow stash. No false negatives by construction."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    mask = tbl.shape[0] - 1
    f = _fingerprints(keys)
    i1 = _index1(keys, mask)
    i2 = _alt_index(i1, f, mask)
    hit = ((tbl[i1] == f[:, None]).any(axis=1)
           | (tbl[i2] == f[:, None]).any(axis=1))
    if stash.size:
        hit |= np.isin(_stash_codes(f, i1, mask), stash)
    return hit


def _bulk_delete(tbl: np.ndarray, stash: np.ndarray,
                 keys: np.ndarray) -> np.ndarray:
    """Remove ONE stored fingerprint per key occurrence (cuckoo-filter
    contract: only delete keys that were inserted — removing an absent
    key can, on fingerprint collision, retract someone else's entry).
    Returns the updated stash. Rounds resolve scatter conflicts when
    several deletions target the same slot."""
    mask = tbl.shape[0] - 1
    pending_f = _fingerprints(keys)
    pending_i = _index1(keys, mask)
    for round_no in range(64):
        if not len(pending_f):
            break
        done = np.zeros(len(pending_f), dtype=bool)
        found = np.zeros(len(pending_f), dtype=bool)
        for ib in (pending_i, _alt_index(pending_i, pending_f, mask)):
            rowmatch = tbl[ib] == pending_f[:, None]
            has = rowmatch.any(axis=1) & ~done
            found |= rowmatch.any(axis=1)
            if not has.any():
                continue
            slot = np.argmax(rowmatch, axis=1)
            target = ib * _SLOTS + slot
            idxs = np.flatnonzero(has)
            _, uniq_first = np.unique(target[idxs], return_index=True)
            sel = idxs[uniq_first]           # one clear per slot per round
            tbl[ib[sel], slot[sel]] = 0
            done[sel] = True
        # table misses fall through to the stash (one occurrence each)
        miss = ~done & ~found
        if stash.size and miss.any():
            codes = _stash_codes(pending_f[miss], pending_i[miss], mask)
            stash_sorted = np.sort(stash)
            kill_pos: list[int] = []
            taken: set[int] = set()
            for code in np.unique(codes):
                lo = int(np.searchsorted(stash_sorted, code))
                count = int(np.searchsorted(
                    stash_sorted, code, side="right")) - lo
                want = int((codes == code).sum())
                for j in range(lo, lo + min(count, want)):
                    kill_pos.append(j)
            if kill_pos:
                keep = np.ones(len(stash_sorted), dtype=bool)
                keep[kill_pos] = False
                stash = stash_sorted[keep]
        done |= miss
        pending_f, pending_i = pending_f[~done], pending_i[~done]
    return stash


_SHARD_SCHEMA = StructType([
    StructField("shard_id", IntegerType()),
    StructField("n_buckets", IntegerType()),
    StructField("n_keys", LongType()),
    StructField("tbl", BinaryType()),
    StructField("stash", BinaryType()),
])


class CuckooShards:
    """URL-seen membership as a DataFrame of per-shard cuckoo filters.

    ``shards`` is ``(shard_id, n_buckets, n_keys, tbl, stash)``; all
    build/probe/delete work runs executor-side over cogrouped Arrow
    batches — the driver never holds a filter. ``capacity_per_shard``
    sizes each shard's table at ≤ 80% load; keys past that spill to
    the shard's stash (still exact-membership, linearly slower) and a
    one-time warning points at re-sharding.
    """

    def __init__(self, spark: SparkSession, n_shards: int = 32,
                 capacity_per_shard: int = 1 << 20):
        self.spark = spark
        self.n_shards = n_shards
        self.capacity = capacity_per_shard
        self.n_buckets = _sized_buckets(capacity_per_shard)
        self.shards: DataFrame | None = None
        self.n_added = 0          # add_keys calls (engine gate, like bloom)
        self.n_keys = 0
        self._warned = False

    # -- helpers ------------------------------------------------------

    def _shard(self, key_col: str) -> F.Column:
        return F.pmod(F.col(key_col), F.lit(self.n_shards)).cast("int")

    def _keyed(self, df: DataFrame, key_col: str) -> DataFrame:
        return df.select(self._shard(key_col).alias("shard_id"),
                         F.col(key_col).alias("key"))

    def _commit(self, shards: DataFrame) -> None:
        """Materialize the new shard generation (truncates the cogroup
        lineage so the next add/probe reads bytes, not a recompute)."""
        self.shards = shards.localCheckpoint(eager=True)
        agg = self.shards.agg(
            F.sum("n_keys").alias("k"),
            F.sum(F.length("stash")).alias("sb")).collect()[0]
        self.n_keys = agg["k"] or 0
        stash_bytes = agg["sb"] or 0
        if stash_bytes and not self._warned:
            import warnings

            self._warned = True
            warnings.warn(
                f"CuckooShards: {stash_bytes // 8} keys spilled to "
                f"overflow stashes ({self.n_keys:,} keys across "
                f"{self.n_shards} shards, capacity {self.capacity:,}/"
                "shard). Membership stays exact-no-false-negative but "
                "probes degrade linearly in stash size — rebuild with "
                "more shards or a larger capacity_per_shard.",
                stacklevel=3,
            )

    # -- build / maintain ----------------------------------------------

    def add_keys(self, df: DataFrame, key_col: str = "url_key") -> None:
        """Insert the keys of ``df``. First call builds the shard
        table; later calls cogroup the existing shards with the new
        keys, touching only shards that receive keys."""
        new = self._keyed(df, key_col)
        n_buckets = self.n_buckets

        def build(pdf):
            import pandas as pd

            shard = int(pdf["shard_id"].iloc[0])
            keys = pdf["key"].to_numpy(dtype=np.int64, na_value=0)
            tbl = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
            stash = _bulk_insert(tbl, keys)
            return pd.DataFrame({
                "shard_id": [shard], "n_buckets": [n_buckets],
                "n_keys": [len(keys)], "tbl": [tbl.tobytes()],
                "stash": [np.sort(stash).tobytes()],
            })

        def extend(left, right):
            import pandas as pd

            if left.empty:                    # brand-new shard
                return build(right)
            row = left.iloc[0]
            nb = int(row["n_buckets"])
            tbl = np.frombuffer(
                row["tbl"], dtype=np.uint16).reshape(nb, _SLOTS).copy()
            stash = np.frombuffer(row["stash"], dtype=np.uint64)
            n = int(row["n_keys"])
            if not right.empty:
                keys = right["key"].to_numpy(dtype=np.int64, na_value=0)
                extra = _bulk_insert(tbl, keys)
                stash = np.sort(np.concatenate([stash, extra]))
                n += len(keys)
            return pd.DataFrame({
                "shard_id": [int(row["shard_id"])], "n_buckets": [nb],
                "n_keys": [n], "tbl": [tbl.tobytes()],
                "stash": [stash.tobytes()],
            })

        if self.shards is None:
            out = new.groupby("shard_id").applyInPandas(build, _SHARD_SCHEMA)
        else:
            out = (
                self.shards.groupby("shard_id")
                .cogroup(new.groupby("shard_id"))
                .applyInPandas(lambda left, right: extend(left, right),
                               _SHARD_SCHEMA)
            )
        self._commit(out)
        self.n_added += 1

    def delete_keys(self, df: DataFrame, key_col: str = "url_key") -> None:
        """Retract one stored occurrence per key — the bloom-impossible
        operation (recrawl invalidation). Only delete keys that were
        inserted; see _bulk_delete."""
        if self.shards is None:
            return
        gone = self._keyed(df, key_col)

        def drop(left, right):
            import pandas as pd

            if left.empty:
                return pd.DataFrame(
                    {f.name: [] for f in _SHARD_SCHEMA.fields})
            row = left.iloc[0]
            nb = int(row["n_buckets"])
            tbl = np.frombuffer(
                row["tbl"], dtype=np.uint16).reshape(nb, _SLOTS).copy()
            stash = np.frombuffer(row["stash"], dtype=np.uint64)
            n = int(row["n_keys"])
            if not right.empty:
                keys = right["key"].to_numpy(dtype=np.int64, na_value=0)
                stash = _bulk_delete(tbl, stash, keys)
                n = max(n - len(keys), 0)
            return pd.DataFrame({
                "shard_id": [int(row["shard_id"])], "n_buckets": [nb],
                "n_keys": [n], "tbl": [tbl.tobytes()],
                "stash": [stash.tobytes()],
            })

        out = (
            self.shards.groupby("shard_id")
            .cogroup(gone.groupby("shard_id"))
            .applyInPandas(drop, _SHARD_SCHEMA)
        )
        self._commit(out)

    # -- probe ----------------------------------------------------------

    def flag(self, df: DataFrame, key_col: str = "url_key",
             flag_col: str = "__maybe") -> DataFrame:
        """``df`` plus a boolean ``flag_col``: False means DEFINITELY
        not added (exact); True means present or a ~0.01% fingerprint
        collision. One shuffle of df by shard id; each task probes one
        shard's table against its co-partitioned rows."""
        if self.shards is None:
            return df.withColumn(flag_col, F.lit(False))
        cols = df.columns
        out_schema = StructType(
            list(df.schema.fields) + [StructField(flag_col, BooleanType())])
        left = df.withColumn("__shard", self._shard(key_col))

        def probe(lpdf, rpdf):
            import pandas as pd

            lpdf = lpdf.drop(columns=["__shard"])
            if lpdf.empty:
                return pd.DataFrame({c: [] for c in cols + [flag_col]})
            if rpdf.empty:
                lpdf[flag_col] = False
                return lpdf
            row = rpdf.iloc[0]
            nb = int(row["n_buckets"])
            tbl = np.frombuffer(
                row["tbl"], dtype=np.uint16).reshape(nb, _SLOTS)
            stash = np.frombuffer(row["stash"], dtype=np.uint64)
            keys = lpdf[key_col].to_numpy(dtype=np.int64, na_value=0)
            lpdf[flag_col] = _lookup(tbl, stash, keys)
            return lpdf

        return (
            left.groupby("__shard")
            .cogroup(self.shards.groupby("shard_id"))
            .applyInPandas(probe, out_schema)
        )

    def split(self, df: DataFrame, key_col: str = "url_key"):
        """(possibly_seen, definitely_new) partition of ``df`` — the
        same contract as BroadcastBloom.split, so the engine's exact
        anti-join applies to the first frame only."""
        flagged = self.flag(df, key_col).localCheckpoint(eager=False)
        maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
        fresh = flagged.filter(~F.col("__maybe")).drop("__maybe")
        return maybe, fresh
