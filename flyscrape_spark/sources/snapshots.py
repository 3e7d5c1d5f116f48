"""Snapshot-committed table store: parquet data files + atomic JSON
manifests, one snapshot per crawl generation.

This reproduces the Iceberg usage the design calls for (SURVEY §3:
"snapshot-tag per generation", resume = last complete snapshot) without
Iceberg jars, which this environment lacks. The layout is deliberately
Iceberg-shaped so a real catalog can be swapped in on a cluster:

    root/
      data/<table>/gen=NNNNNN/part-*.parquet   -- immutable data files
      _manifests/gen-NNNNNN.json               -- atomic commit marker:
          {gen, tables, metrics, next_order, lineage}

A generation is visible iff its manifest exists; manifests are written
tmp+rename (atomic on POSIX), so a killed job leaves at most an
invisible partial data dir and resume starts from the last *complete*
generation with zero re-fetches of committed work.

Per-partition lineage (north_rule): each commit records per-partition
row counts and host ranges for the generation's frontier.

The reference's analog is the bbolt HTTP cache
(/root/reference/modules/cache/cache.go:46-81) — a KV of fetched
responses giving idempotent re-runs; here the fetched snapshots ARE
the cache, consulted by generation anti-joins instead of per-URL gets.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str):
        self.root = Path(root)
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)
        self._pending: dict[int, dict] = {}

    # -- paths ------------------------------------------------------------

    def _data_dir(self, table: str, gen: int) -> Path:
        return self.root / "data" / table / f"gen={gen:06d}"

    def _manifest_path(self, gen: int) -> Path:
        return self.root / "_manifests" / f"gen-{gen:06d}.json"

    # -- commit protocol ---------------------------------------------------

    def commit(self, df: DataFrame, table: str, gen: int) -> DataFrame:
        """Write a generation's table and return the read-back handle
        (lineage-truncated: downstream plans scan parquet, not the
        upstream DAG)."""
        path = str(self._data_dir(table, gen))
        df.write.mode("overwrite").parquet(path)
        self._pending.setdefault(gen, {"tables": {}})["tables"][table] = path
        spark = df.sparkSession
        out = spark.read.parquet(path)
        if table == "frontier":
            self._pending[gen]["lineage"] = self._partition_lineage(out)
        return out

    def _partition_lineage(self, frontier: DataFrame) -> list[dict]:
        """Per-partition lineage: row count + host/url-key range."""
        host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
        rows = (
            frontier.withColumn("host", host)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                F.count("*").alias("rows"),
                F.min("host").alias("host_min"),
                F.max("host").alias("host_max"),
            )
            .collect()
        )
        return [r.asDict() for r in rows]

    def commit_meta(self, gen: int, metrics: dict, next_order: int) -> None:
        """Atomically publish the generation (tmp+rename)."""
        pending = self._pending.pop(gen, {"tables": {}})
        manifest = {
            "gen": gen,
            "tables": pending["tables"],
            "lineage": pending.get("lineage", []),
            "metrics": metrics,
            "next_order": next_order,
        }
        fd, tmp = tempfile.mkstemp(dir=self.root / "_manifests", suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(gen))

    # -- resume -------------------------------------------------------------

    def manifests(self) -> list[dict]:
        out = []
        for p in sorted((self.root / "_manifests").glob("gen-*.json")):
            with open(p) as f:
                out.append(json.load(f))
        return out

    def resume(self, spark: SparkSession):
        """Return engine state after the last complete generation, or
        None for a fresh crawl:
        (seen_frames, candidates, result_frames, metrics, start_gen,
        next_order)."""
        manifests = self.manifests()
        if not manifests:
            return None
        last = manifests[-1]
        gens = [m["gen"] for m in manifests]
        seen_frames = [
            spark.read.parquet(m["tables"]["frontier"])
            for m in manifests if "frontier" in m["tables"]
        ]
        result_frames = [
            spark.read.parquet(m["tables"]["fetched"])
            for m in manifests if "fetched" in m["tables"]
        ]
        if "links" in last["tables"]:
            candidates = spark.read.parquet(last["tables"]["links"])
        else:
            candidates = None
        metrics = [m["metrics"] for m in manifests]
        return (
            seen_frames, candidates, result_frames, metrics,
            max(gens) + 1, last["next_order"],
        )
