"""Output sinks: JSON array / NDJSON, in canonical crawl order.

Reference: modules/output/json/json.go (streaming array, skips rows
with neither data nor error, json.go:67-69) and
modules/output/ndjson/ndjson.go (one object per line). The reference
emits in nondeterministic arrival order (500 workers, mutex-serialized
writes json.go:80-81); this engine makes the order canonical:
(depth, discovery_order). Output element shape matches
modules/output/json/json.go:114-119: {url, data, error, timestamp}.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def _records(results: DataFrame) -> DataFrame:
    has_data = "data" in results.columns
    data_col = F.col("data") if has_data else F.lit(None).cast("string")
    return (
        results.withColumn("data", data_col)
        # json.go:67-69: skip rows with neither data nor error
        .filter(F.col("data").isNotNull() | F.col("error").isNotNull())
        .orderBy("depth", "discovery_order")
        .select("url", "data", "error", F.current_timestamp().alias("timestamp"))
    )


def write_ndjson(results: DataFrame, path: str) -> None:
    """NDJSON directory sink — native distributed write (the scale
    path; one file per partition)."""
    _records(results).write.mode("overwrite").json(path)


def iter_ndjson_lines(results: DataFrame):
    """Yield NDJSON lines in canonical order (stdout path — the
    reference streams newline-delimited records to stdout when no
    output file is configured, modules/output/ndjson/ndjson.go:47).
    Uses toLocalIterator so only one partition is resident at a time."""
    for r in _records(results).toLocalIterator():
        yield json.dumps(
            {
                "url": r["url"],
                "data": json.loads(r["data"]) if r["data"] else None,
                "error": r["error"],
                "timestamp": r["timestamp"].isoformat() if r["timestamp"] else None,
            }
        )


def to_json_array(results: DataFrame) -> str:
    """Exact single-file JSON array (collects — only for result sets
    that fit the driver, like the reference's single-process sink)."""
    rows = []
    for r in _records(results).collect():
        rows.append(
            {
                "url": r["url"],
                "data": json.loads(r["data"]) if r["data"] else None,
                "error": r["error"],
                "timestamp": r["timestamp"].isoformat() if r["timestamp"] else None,
            }
        )
    return json.dumps(rows, indent=2)
