"""Partitioned Parquet storage layer.

Replaces the reference's hand-rolled month partitioning — one directory per
month with driver-loop path construction (src/OverSpeedCount.scala:43-48;
src/AverageSpeed.scala:128-133) — with Hive-style partitioned Parquet, so
Catalyst partition pruning (incl. dynamic partition pruning on the join side)
does the month selection that the reference does with string-built paths.

At 100 TB: a month-partitioned fact with ~128 MB row-groups gives the scan
layer prune-able units; no driver loop ever enumerates files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_month_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    *,
    mode: str = "overwrite",
    extra_partition_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as Parquet partitioned by a derived ``month`` column
    (``yyyyMM``, matching the reference's directory naming)."""
    ts = F.col(ts_col)
    if dict(df.dtypes)[ts_col] == "bigint":  # epoch millis
        ts = F.timestamp_millis(ts)
    out = df.withColumn("month", F.date_format(ts, "yyyyMM"))
    cols = ["month"] + (extra_partition_cols or [])
    out.write.mode(mode).partitionBy(*cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; month predicates prune at planning time."""
    return spark.read.parquet(path)
