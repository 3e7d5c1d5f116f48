"""Local mirror of the driver's correctness gate: run every
__spark_entry__ query at a given SF and compare against its DuckDB
oracle (row count + column names + order-insensitive values).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from flyscrape_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            # Driver-gate contract: the canonicalizer (pandas
            # sort_values over every column) crashes on list/dict
            # cells, so EVERY query output must be atomic-only.
            # Set/array-valued results must serialize (array_join),
            # exactly as operators/anchors.py does.
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad_cols:
                print(
                    f"FAIL  {name}: non-atomic output columns {bad_cols} "
                    "(driver canonicalizer crashes on list cells — "
                    "serialize with array_join)"
                )
                failures.append(name)
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [c.lower() for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols = [c.lower() for c in cols]
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            # align oracle column order to spark's
            perm = [ocols.index(c) for c in scols]
            orows2 = [tuple(r[i] for i in perm) for r in orows]
            sn = normalize(srows, list(range(len(scols))))
            on = normalize(orows2, list(range(len(scols))))
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
