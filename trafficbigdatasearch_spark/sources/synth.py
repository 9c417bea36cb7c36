"""Custom Python DataSource: deterministic synthetic event generator.

Spark 4's Python DataSource API is the sanctioned way to add a SOURCE the
built-in readers don't cover (internal services, custom formats, test-data
generation) without JVM code.  This one generates the canonical ``events``
shape from a seed — the fixture-free way to stand up arbitrarily large,
perfectly reproducible test/bench inputs on any cluster:

- **Partition-parallel**: ``partitions()`` splits the row range; each
  executor generates its slice independently (no driver data movement, no
  shuffle — generation scales linearly with executors).
- **Deterministic**: row ``i`` is a pure function of (seed, i) via md5, so
  any partitioning / retry / speculative attempt yields identical data —
  the same engine-reproducibility contract as the md5 sampling operators.
- **Slow-path by design**: rows cross the Python boundary one at a time;
  this is a TEST/tooling source, not a 100 TB ingest path (real corpora
  come from the parquet/CSV/JSONL readers).  Generation throughput is
  still parallel across partitions.

Usage::

    spark.dataSource.register(SyntheticEvents)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10000).option("seed", 7).load())
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SCHEMA_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)
_EPOCH = datetime(2024, 1, 1)


def _h(seed: int, i: int, field: str) -> int:
    """Deterministic 48-bit hash of (seed, row, field)."""
    return int(
        hashlib.md5(f"{seed}_{i}_{field}".encode()).hexdigest()[:12], 16
    )


def row_at(seed: int, i: int, n_users: int) -> tuple:
    """The i-th synthetic event — pure function of (seed, i)."""
    ts = _EPOCH + timedelta(seconds=_h(seed, i, "ts") % (30 * 86400))
    return (
        i,
        ts,
        _h(seed, i, "user") % n_users,
        EVENT_TYPES[_h(seed, i, "type") % len(EVENT_TYPES)],
        (_h(seed, i, "value") % 60000) / 100.0,
        '{"k": %d}' % (_h(seed, i, "k") % 100),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("users", 100))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield row_at(self.seed, i, self.n_users)


class SyntheticEvents(DataSource):
    """``spark.read.format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _StreamReader(self.options)


class _StreamReader(SimpleDataSourceStreamReader):
    """Bounded synthetic event STREAM: each micro-batch advances the row
    offset by ``rows_per_batch`` until ``rows`` is exhausted — the same
    (seed, i) pure function as the batch reader, so a drained stream equals
    the batch load exactly (pinned in tests).  Offsets are plain row
    indices: replay of any [start, end) range regenerates identical rows,
    which is precisely the reliable-source contract Structured Streaming
    recovery depends on."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("users", 100))
        self.per_batch = int(options.get("rows_per_batch", 250))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.per_batch, self.rows)
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s the
        # returned iterator, which generators don't support
        rows = [row_at(self.seed, i, self.n_users) for i in range(lo, hi)]
        return rows, {"i": hi}

    def readBetweenOffsets(self, start, end):
        return [
            row_at(self.seed, i, self.n_users)
            for i in range(start["i"], end["i"])
        ]
