"""SparkSession factory (reference parity: TrafficStatistics.scala:17-23 D1/D3).

The reference builds a ``SparkConf`` from a user ``Map[String,String]`` plus a
master URL and tears down with ``sparkContext.stop(); sqlContext.clearCache()``
(src/TrafficStatistics.scala:37-40).  Here the same surface is a configured
``SparkSession`` with scale-oriented defaults:

- AQE on (runtime coalescing + skew-join handling — hot plate keys / hot join
  keys are the norm in traffic data).
- Shuffle partition count from ``SPARK_GRAFT_CPUS`` (local harness) but
  intended to be overridden cluster-side; AQE coalesces down.
- Session timezone pinned (reference quirk §2.10.7: epoch-millis values are
  timezone-dependent; the driver testdata oracle (DuckDB) treats timestamps as
  naive wall-clock, so UTC keeps hour()/date_trunc() semantics identical).
- Arrow enabled for the few Pandas-UDF operators (similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_TIMEZONE = "UTC"
# The reference's traffic timestamps are wall-clock Asia/Shanghai
# (SURVEY.md §2.10.7).  ``TrafficEngine(timezone=...)`` pins the SESSION
# timezone to its zone at construction so driver-side boundary millis and
# executor-side row parsing agree; pass this constant for reference parity
# against real deployment data.
TRAFFIC_TIMEZONE = "Asia/Shanghai"


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_spark(
    app_name: str = "trafficbigdatasearch-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    timezone: str = DEFAULT_TIMEZONE,
) -> SparkSession:
    """Build a SparkSession with the engine's scale-oriented defaults.

    ``extra_conf`` mirrors the reference's config-map passthrough
    (src/TrafficStatistics.scala:19-22).
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 16 MB splits: the local testdata is one parquet file per table, and
        # row-group-range splitting is the only scan parallelism available —
        # 128 MB would serialize whole-table scans onto one core.  Cluster
        # deployments (many files, 1000 executors) override via extra_conf.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as int64 and convert in the catalog (ns -> us trunc,
        # matching DuckDB's read of the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_spark(**kwargs) -> SparkSession:
    """Get-or-create the engine session."""
    return build_spark(**kwargs)


def stop_spark(spark: SparkSession) -> None:
    """Teardown parity with src/TrafficStatistics.scala:37-40 (D3)."""
    spark.catalog.clearCache()
    spark.stop()
