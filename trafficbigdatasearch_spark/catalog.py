"""Testdata catalog: load the driver's parquet tables as DataFrames.

Replaces the reference's per-query ``registerTempTable`` churn
(src/OverSpeedCount.scala:33-35,109-114) with one logical DataFrame per table;
temp views are created only by the SQL facade when a caller wants ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (vectorized reader, pushdown on).

    ``events.ts`` is TIMESTAMP(NANOS) in the file; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as int64 and is
    converted here to a microsecond timestamp (truncating, exactly like
    DuckDB's native read of the same file).

    Both confs below are runtime-settable, so this works on any caller's
    session — including a vanilla ``SparkSession`` that never went through
    :func:`session.build_spark` (whose session-level pinning lives at
    session.py).  Without ``nanosAsLong`` a vanilla session throws
    ``PARQUET_TYPE_ILLEGAL`` on the events table before any query logic runs;
    without a UTC session zone, ``hour(ts)`` / ``CAST(ts AS DATE)`` would be
    skewed vs DuckDB's naive timestamps on machines in other zones.

    NOTE: loading ``events`` mutates the CALLER'S SESSION (both confs stay
    set for every later query on it — deliberate, so driver/oracle timestamp
    semantics agree; see also TrafficEngine's docstring for the facade-level
    contract)."""
    if name == "events":
        from pyspark.errors import AnalysisException

        for conf, value in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.session.timeZone", "UTC"),
        ):
            try:
                spark.conf.set(conf, value)
            except AnalysisException:
                # CANNOT_MODIFY_CONFIG / unknown legacy conf on an
                # older/newer Spark: fall through to the read, which throws
                # its own PARQUET_TYPE_ILLEGAL if the conf truly mattered
                pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) file surfaced as int64 via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] file without isAdjustedToUTC reads as NTZ; with
            # the session zone pinned UTC above, the cast is wall-clock
            # identity and matches DuckDB's naive read of the same file.
            # Strict-typed functions (unix_millis, window) need TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Expose the tables to ``spark.sql`` under their canonical names."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
