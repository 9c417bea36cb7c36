"""Incremental aggregate maintenance (operators/incremental.py): merged
partials must be bit-identical to a full rescan."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import incremental as I


def _cents(col):
    return F.round(col * 100).cast("bigint")


def _full(df):
    return df.groupBy("k").agg(
        F.count("*").alias("n_rows"),
        (F.sum(_cents(F.col("v"))).cast("double") / 100).alias("total"),
        (
            F.sum(_cents(F.col("v"))).cast("double") / 100 / F.count("*")
        ).alias("avg_value"),
        (F.min(_cents(F.col("v"))).cast("double") / 100).alias("min_value"),
        (F.max(_cents(F.col("v"))).cast("double") / 100).alias("max_value"),
    )


def test_three_way_merge_equals_full_rescan(spark):
    df = spark.createDataFrame(
        [(i % 4, "k%d" % (i % 3), i * 0.37 - 5) for i in range(300)],
        "slice int, k string, v double",
    )
    parts = [
        I.partial_aggregate(df.filter(F.col("slice") == s), ["k"], _cents(F.col("v")))
        for s in range(4)
    ]
    merged = I.finalize(I.merge_partials(parts, ["k"]), ["k"])
    full = _full(df.select("k", "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_empty_slice_is_identity(spark):
    df = spark.createDataFrame([("a", 1.5), ("a", 2.5), ("b", -1.0)], "k string, v double")
    empty = df.filter(F.lit(False))
    parts = [
        I.partial_aggregate(df, ["k"], _cents(F.col("v"))),
        I.partial_aggregate(empty, ["k"], _cents(F.col("v"))),
    ]
    merged = I.finalize(I.merge_partials(parts, ["k"]), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, _full(df).collect())
    )


def test_merge_is_associative(spark):
    df = spark.createDataFrame(
        [(i % 5, "g", float(i)) for i in range(50)], "slice int, k string, v double"
    )
    ps = [
        I.partial_aggregate(df.filter(F.col("slice") == s), ["k"], _cents(F.col("v")))
        for s in range(5)
    ]
    left = I.merge_partials([I.merge_partials(ps[:2], ["k"]), *ps[2:]], ["k"])
    right = I.merge_partials([*ps[:3], I.merge_partials(ps[3:], ["k"])], ["k"])
    assert sorted(map(tuple, I.finalize(left, ["k"]).collect())) == sorted(
        map(tuple, I.finalize(right, ["k"]).collect())
    )
