"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``trafficbigdatasearch_spark.queries.standard`` — one
entry per operator class from SURVEY.md §2 plus the beyond-parity pipeline
operators (dedup / similarity / text / multimodal); see that module for the
cross-engine determinism rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from trafficbigdatasearch_spark.queries import standard


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q3-shaped
    selective-join/top-k (scan pruning + broadcast joins + agg + top-k in one
    declarative plan)."""
    return standard.queries()["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return standard.queries()


def oracle_sql() -> dict[str, str]:
    return standard.oracle_sql()
