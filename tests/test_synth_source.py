"""Custom Python DataSource (sources/synth.py) contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.sources.synth import SyntheticEvents, row_at


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticEvents)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_deterministic_and_partition_invariant(registered):
    a = sorted(map(tuple, _load(registered, rows=1500, seed=3).collect()))
    b = sorted(
        map(tuple, _load(registered, rows=1500, seed=3, partitions=5).collect())
    )
    assert a == b
    assert len(a) == 1500
    # row 7 matches the pure-function spec exactly
    assert a[7] == row_at(3, 7, 100)


def test_different_seed_differs(registered):
    a = sorted(map(tuple, _load(registered, rows=200, seed=1).collect()))
    b = sorted(map(tuple, _load(registered, rows=200, seed=2).collect()))
    assert a != b


def test_feeds_existing_operators(registered):
    """The generated frame is schema-compatible with the events operators:
    the hourly time-bucket aggregation runs on it unchanged."""
    df = _load(registered, rows=3000, seed=9)
    out = (
        df.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n"), F.count_distinct("user_id").alias("u"))
    )
    rows = out.collect()
    assert sum(r["n"] for r in rows) == 3000
    assert all(r["u"] >= 1 for r in rows)


def test_stream_equals_batch(registered, spark):
    """The streaming face of the source must deliver exactly the batch rows
    across micro-batches — same (seed, i) pure function, offsets are
    replayable row ranges.  (availableNow only snapshots one prefetched
    batch from a simple stream reader, so drain with a running trigger and
    stop once the bounded range is exhausted.)"""
    import time
    import uuid

    name = f"synth_stream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 1200)
        .option("seed", 4)
        .option("rows_per_batch", 500)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= 1200:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("synthetic_events")
            .option("rows", 1200)
            .option("seed", 4)
            .load()
            .collect(),
        )
    )
    assert got == want and len(got) == 1200
