"""Focused pins for partitioning.py (r13): the compute-width spread must
actually defeat AQE's byte-model coalescing, and the conditional variant
must be an identity exactly when it promises to be."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P


@pytest.fixture(scope="module")
def narrow(spark):
    # single-partition source — the local single-row-group-scan shape
    return spark.range(0, 10_000, 1, 1).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )


def test_spread_pins_session_width(spark, narrow):
    """spread() yields exactly the configured shuffle width, and AQE does
    not coalesce it back (the whole point: a bare repartition(col) on the
    same frame IS coalesced below the width at these byte sizes)."""
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spread_parts = P.spread(narrow, "id").rdd.getNumPartitions()
    assert spread_parts == width
    bare_parts = narrow.repartition(F.col("id")).rdd.getNumPartitions()
    assert bare_parts < width  # AQE's byte model collapses the bare form


def test_ensure_compute_width_widens_narrow_input(spark, narrow):
    out = P.ensure_compute_width(narrow, "id")
    assert out.rdd.getNumPartitions() == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_ensure_compute_width_identity_on_wide_input(spark):
    """At-scale contract: an input already at/above the session width is
    returned untouched — no exchange is added to a wide scan."""
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(0, 10_000, 1, width + 4)
    out = P.ensure_compute_width(wide, "id")
    assert out is wide


def test_ensure_compute_width_streaming_passthrough(spark, tmp_path):
    """Streaming frames pass through (the .rdd partition probe is illegal
    on a stream) — pinned by the stream_gopher_gate incident (r13)."""
    src_dir = tmp_path / "stream_src"
    spark.range(5).write.parquet(str(src_dir))
    stream = spark.readStream.schema("id bigint").parquet(str(src_dir))
    out = P.ensure_compute_width(stream, "id")
    assert out is stream


def test_spread_is_value_neutral(spark, narrow):
    a = sorted(r["id"] for r in narrow.collect())
    b = sorted(r["id"] for r in P.spread(narrow, "id").collect())
    assert a == b
