"""Broadcast bloom filter over 64-bit URL keys — the explicit form of
the north-star's "broadcast bloom filter + exact shards" URL-seen
design (reference keeps an in-process visited hashmap,
/root/reference/scrape.go:62-67; this is its distributed analogue).

Why explicit: Catalyst's runtime bloom-filter injection
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) does NOT apply to
the left-anti seen join (verified in BENCH.md), so the engine builds
its own. Per crawl generation the filter splits candidates into
"definitely new" (bypass the exact anti-join entirely — no false
negatives are possible) and "possibly seen" (the only rows that pay
the anti-join shuffle). The filter is INCREMENTAL: each generation
OR-folds only the newly admitted keys into the driver-held bitmap, so
maintenance cost is O(new URLs), never a rescan of the seen set.

Scale envelope: at 10 bits/key a 10^9-URL seen set is a 1.2 GB bitmap
— broadcastable; at the 10^10 design point the bitmap (12 GB) exceeds
broadcast budgets and the BucketedSeenStore (sources/seen_store.py)
is the primary mechanism, with the bloom still applicable per
host-partition shard. Both compose: bloom cuts the candidate-side
shuffle volume, bucketing eliminates the seen-side shuffle.

All executor-side work is Arrow-vectorized numpy (mapInPandas /
pandas_udf); nothing is per-row Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StructField, StructType

# splitmix64 constants (public domain PRNG finalizer) — k derived
# index functions from one 64-bit key, vectorized over numpy uint64
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _indices(keys: np.ndarray, n_hashes: int, mask: int) -> list[np.ndarray]:
    """k bit positions per key: splitmix64 finalizer seeded per hash."""
    out = []
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):  # uint64 wrapping is the point
        for j in range(n_hashes):
            seed = np.uint64(((j + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            h = k + seed
            h = (h ^ (h >> np.uint64(30))) * _MIX1
            h = (h ^ (h >> np.uint64(27))) * _MIX2
            h = h ^ (h >> np.uint64(31))
            out.append((h & np.uint64(mask)).astype(np.int64))
    return out


class BroadcastBloom:
    """Driver-held bloom bitmap over long keys.

    ``n_bits`` must be a power of two (mask indexing). Defaults give
    ~1.2 MB / ~2% false positives per million keys at k=4.
    """

    def __init__(self, spark, n_bits: int = 1 << 23, n_hashes: int = 4):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.spark = spark
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        self.n_added = 0
        self._bc = None

    # -- build --------------------------------------------------------

    def add_keys(self, df: DataFrame, key_col: str = "url_key") -> None:
        """OR the keys of ``df`` into the bitmap: one bitmap per
        partition computed executor-side (vectorized set-bits over the
        partition's Arrow batches), then a driver-side OR of the
        per-partition bitmaps — the treeAggregate shape; the collect
        is P × (n_bits/8) bytes of bitmap, never the keys."""
        n_bits, n_hashes, mask = self.n_bits, self.n_hashes, self.n_bits - 1
        schema = StructType([StructField("bitmap", BinaryType())])

        def per_partition(batches):
            bm = np.zeros(n_bits // 8, dtype=np.uint8)
            import pandas as pd

            for pdf in batches:
                keys = pdf.iloc[:, 0].to_numpy(dtype=np.int64, na_value=0)
                for idx in _indices(keys, n_hashes, mask):
                    np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

        rows = df.select(F.col(key_col)).mapInPandas(per_partition, schema).collect()
        for r in rows:
            self.bitmap |= np.frombuffer(r["bitmap"], dtype=np.uint8)
        self.n_added += 1
        self._bc = None  # bitmap changed: next filter re-broadcasts

    # -- probe --------------------------------------------------------

    def might_contain(self) -> "F.Column":
        """A pandas UDF column factory: might_contain()(key_col) is
        True iff all k bits are set (no false negatives)."""
        if self._bc is not None:
            self._bc.unpersist()
        self._bc = self.spark.sparkContext.broadcast(self.bitmap.tobytes())
        bc, n_hashes, mask = self._bc, self.n_hashes, self.n_bits - 1

        @pandas_udf("boolean")
        def probe(keys):
            import pandas as pd

            bm = np.frombuffer(bc.value, dtype=np.uint8)
            k = keys.to_numpy(dtype=np.int64, na_value=0)
            hit = np.ones(len(k), dtype=bool)
            for idx in _indices(k, n_hashes, mask):
                hit &= (bm[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
            return pd.Series(hit)

        return probe

    def split(self, df: DataFrame, key_col: str = "url_key"):
        """(possibly_seen, definitely_new) partition of ``df``. The
        definitely-new side can skip the exact anti-join: bloom
        filters have no false negatives."""
        probe = self.might_contain()
        flagged = df.withColumn("__maybe", probe(F.col(key_col)))
        maybe = flagged.filter(F.col("__maybe")).drop("__maybe")
        fresh = flagged.filter(~F.col("__maybe")).drop("__maybe")
        return maybe, fresh
