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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted) Parquet
    table — the co-located-join layout.

    Two tables bucketed by the same keys into the same ``n_buckets`` join
    with NO shuffle exchange on either side (Spark plans a sort-merge join
    over aligned buckets); with ``sort_cols`` matching the join keys the sort
    is skipped too.  At 100 TB this is the difference between re-shuffling a
    fact table per join and reading it pre-partitioned — the standard layout
    for repeatedly-joined facts (e.g. speed obs ⋈ toll trips on plate).

    ``path`` makes the table external (data at ``path``, metadata in the
    catalog); bucketing metadata lives in the catalog, so reads must go
    through ``spark.table(table)``, not ``spark.read.parquet(path)``.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
