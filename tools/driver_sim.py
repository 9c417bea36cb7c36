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

Scale caveat: run the FULL sweep only at sf0.01 (the driver's gate).  At
sf0.1 the WITH RECURSIVE closure oracles (dedup_clusters,
pipeline_dedup_corpus, pipeline_semantic_dedup, pipeline_dbscan,
dedup_keep_best, pipeline_entity_resolution) compute all-pairs
reachability in DuckDB and run for hours — an oracle-side cost only.
Name-targeted non-closure subsets at sf0.1 are fine (80 queries verified
that way in round 4).
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


def _cell_repr(x) -> str:
    """Canonical string form of one cell, dtype-STRICT like the driver's
    value-hash: int64 334247 -> '334247' but float64 334247.0 -> '334247.0',
    so a DuckDB HUGEINT->float64 render vs a Spark int64 is a MISMATCH even
    though the values compare numerically equal (the r2 a_rollup_reagg bug
    class this rehearsal previously could not catch)."""
    import numpy as np

    if x is None:
        return "NULL"
    if isinstance(x, (np.floating, float)):
        f = float(x)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(x, np.bool_):
        return str(bool(x))
    if isinstance(x, np.integer):
        return str(int(x))
    try:
        import pandas as pd

        if x is pd.NaT:
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return str(x)


def _cell_eq(a, b) -> bool:
    return _cell_repr(a) == _cell_repr(b)


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
            first_diff = None
            vals_ok = rows_ok and schema_ok
            if vals_ok:
                for i in range(len(s)):
                    for j in range(len(s.columns)):
                        if not _cell_eq(s.iat[i, j], d.iat[i, j]):
                            first_diff = (
                                f"col={s.columns[j]} row={i} "
                                f"spark={_cell_repr(s.iat[i, j])!r}"
                                f"[{s.dtypes.iloc[j]}] vs "
                                f"oracle={_cell_repr(d.iat[i, j])!r}"
                                f"[{d.dtypes.iloc[j]}]"
                            )
                            vals_ok = False
                            break
                    if not vals_ok:
                        break
            status = "OK" if (schema_ok and rows_ok and vals_ok) else "MISMATCH"
            if status != "OK":
                failures.append(name)
            print(
                f"{name:32s} {status}  rows={len(sdf)}/{len(ddf)} "
                f"schema={schema_ok} values={vals_ok}"
                + (f"  first_diff: {first_diff}" if first_diff else "")
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
