"""The driver-contract query registry: every operator class from SURVEY.md §2
plus the beyond-parity pipeline operators, each as a (Spark builder, DuckDB
oracle SQL) pair over the testdata tables.

Cross-engine determinism rules used throughout (the driver hash-compares
values):

- counts / keys / strings: naturally exact.
- money sums: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` — decimal
  sums are exact and order-independent, the final double cast is one
  correctly-rounded op; identical in both engines.
- averages: exact decimal sum cast to double, divided by the count — a fixed
  IEEE op sequence.
- similarity scores: quantized integer dot products (functions/vectors.py)
  -> bit-identical doubles.
- every computed column aliased identically on both sides.
"""


from __future__ import annotations


from collections.abc import Callable


from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import functions as F


from trafficbigdatasearch_spark.catalog import load_table


from trafficbigdatasearch_spark.functions import text as T


from trafficbigdatasearch_spark.functions import vectors as V


from trafficbigdatasearch_spark.operators import (
    dedup,
    graph,
    joins,
    multimodal,
    packing,
    sampling,
    similarity,
)


QueryFn = Callable[[SparkSession, str], DataFrame]


_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _cents(col):
    """x (2-decimal money as double) -> exact integer cents."""
    return F.round(col * 100).cast("bigint")


def _dsum(col):
    """Exact money sum: integer-cent sum (order-independent, overflow-free in
    int64 at any realistic SF) cast to double, /100.  Bit-identical to the
    oracle's ``CAST(SUM(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100``."""
    return F.sum(_cents(col)).cast("double") / 100
