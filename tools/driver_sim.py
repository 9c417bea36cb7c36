#!/usr/bin/env python
"""Local rehearsal of the driver's correctness harness.

Replicates the driver's conditions as closely as its round-1 tracebacks
reveal them: a VANILLA SparkSession (none of session.build_spark's confs —
this is what exposed the events-nanos failure), every ``queries()`` entry run
at sf0.01, the matching ``oracle_sql()`` run in DuckDB over the same parquet,
then a pandas canonicalization (columns sorted by name, rows sorted by every
column — the step that crashed on array columns) and a value-level compare.

Usage: ``python tools/driver_sim.py [sf_dir] [query ...]``; prints one
status line per query and exits non-zero on any failure.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    """The driver's canonical form: columns sorted by name, rows sorted by
    all columns (raises TypeError on unhashable cells, like the driver)."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    return a == b


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        checked += 1
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            sql = osql.get(name)
            if sql is None:
                failures.append(name)
                print(f"{name:32s} NO-ORACLE ({len(sdf)} rows)")
                continue
            ddf = con.execute(sql).df()
            schema_ok = sorted(c.lower() for c in sdf.columns) == sorted(
                c.lower() for c in ddf.columns
            )
            rows_ok = len(sdf) == len(ddf)
            s, d = _canon(sdf), _canon(ddf)
            vals_ok = rows_ok and schema_ok and all(
                _cell_eq(s.iat[i, j], d.iat[i, j])
                for i in range(len(s))
                for j in range(len(s.columns))
            )
            status = "OK" if (schema_ok and rows_ok and vals_ok) else "MISMATCH"
            if status != "OK":
                failures.append(name)
            print(
                f"{name:32s} {status}  rows={len(sdf)}/{len(ddf)} "
                f"schema={schema_ok} values={vals_ok}"
            )
        except Exception as e:  # noqa: BLE001 — driver records the traceback
            failures.append(name)
            print(f"{name:32s} ERROR {type(e).__name__}: {str(e)[:160]}")
    print(f"\n{checked - len(failures)}/{checked} green")
    if failures:
        print("failures:", ", ".join(failures))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
