"""ORC source/sink — the second built-in columnar format.

The reference reads only CSV (src/OverSpeedCount.scala:47-48); the engine's
native store is Parquet (sources/parquet.py).  ORC rounds out the built-in
columnar formats for interop with Hive-era warehouses: same schema-ful
read contract (explicit StructType, never inference), same vectorized
reader + predicate pushdown + column pruning through Catalyst
(``spark.sql.orc.impl=native`` is the default), and the same sized-write
discipline via ``maxRecordsPerFile``.

Conversion between formats is one scan + one write (both vectorized, no
Python); results are row-identical either direction — pinned in
tests/test_sources.py and oracle-checked by the ``s_orc_roundtrip``
registry query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    rows_per_file: int | None = None,
) -> None:
    """Write ``df`` as ORC; ``rows_per_file`` bounds file sizes exactly like
    the parquet compaction sink (per-writer option, session untouched)."""
    w = df.write.mode(mode)
    if rows_per_file is not None:
        w = w.option("maxRecordsPerFile", rows_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Schema-ful ORC scan.  Pass the writer's schema to skip footer-based
    inference on wide directories; filters and projections push down to the
    vectorized ORC reader exactly as with parquet (pinned in
    tests/test_sources.py)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
