"""Time-hierarchy rollups: pre-aggregated coarse tables that answer
coarser-grained queries without touching raw data — the continuous-aggregate
/ hypertable-rollup pattern.

The invariant that makes this work at 100 TB: every aggregate kept in the
rollup is RE-AGGREGATABLE (count/sum/min/max re-combine; avg is derived from
sum/count at read time, never stored).  An hourly rollup is ~four orders of
magnitude smaller than raw events, so daily/weekly dashboards read the
rollup and only the current hour touches raw data.

Maintenance paths:
- batch: ``hourly_rollup(events)`` materialized with the month-partitioned
  writer (sources/parquet.py) and refreshed per partition;
- streaming: the same aggregation under ``tumbling_counts``-style windowing
  with append mode writes finalized hourly rows continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The re-aggregatable measure set kept per bucket.
_MEASURES = [
    F.count("*").alias("n"),
    F.sum("value").alias("sum_v"),
    F.min("value").alias("min_v"),
    F.max("value").alias("max_v"),
]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Raw events -> (hour_start, event_type, n, sum_v, min_v, max_v)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(*_MEASURES)
    )


def daily_from_hourly(rollup: DataFrame) -> DataFrame:
    """Re-aggregate the hourly rollup to days — never touches raw events.

    Exactness: counts and min/max re-combine EXACTLY; the double ``sum_v``
    (and the avg derived from it) re-associates floating-point addition, so
    it can differ from the direct daily sum in the last ulps.  For
    hash-exact re-aggregation keep integer measures in the rollup — see the
    ``a_rollup_reagg`` registry query, which stores integer cents and is
    bit-identical to its direct-aggregation oracle.
    """
    return (
        rollup.groupBy(
            F.date_trunc("day", F.col("hour_start")).alias("day_start"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )


def daily_direct(events: DataFrame) -> DataFrame:
    """The equivalent direct daily aggregation over raw events — the oracle
    for the rollup path (and the query the rollup replaces at scale)."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day_start"),
            F.col("event_type"),
        )
        .agg(*_MEASURES)
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )
