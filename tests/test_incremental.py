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


def test_apply_delta_equals_rescan_under_churn(spark):
    old = spark.createDataFrame(
        [(i, "k%d" % (i % 3), i * 1.5) for i in range(60)], "id long, k string, v double"
    )
    # churn: drop ids %7==0, add ids 100..110 (new group "k9"), reprice %5==0
    new_rows = [(i, "k%d" % (i % 3), i * 1.5 + (7.0 if i % 5 == 0 else 0.0))
                for i in range(60) if i % 7 != 0]
    new_rows += [(100 + j, "k9", 9.99) for j in range(11)]
    new = spark.createDataFrame(new_rows, "id long, k string, v double")

    cents = _cents(F.col("v"))
    base = I.additive_partial(old, ["k"], cents)
    added = new.join(old.select("id"), "id", "left_anti")
    removed = old.join(new.select("id"), "id", "left_anti")
    both = old.alias("o").join(new.alias("n"), "id").filter(
        ~F.col("o.v").eqNullSafe(F.col("n.v"))
    )
    upd_old = both.select(F.col("o.k").alias("k"), F.col("o.v").alias("v"))
    upd_new = both.select(F.col("n.k").alias("k"), F.col("n.v").alias("v"))
    refreshed = I.finalize_additive(
        I.apply_delta(base, [
            I.additive_partial(added, ["k"], cents),
            I.additive_partial(removed, ["k"], cents, sign=-1),
            I.additive_partial(upd_old, ["k"], cents, sign=-1),
            I.additive_partial(upd_new, ["k"], cents),
        ], ["k"]),
        ["k"],
    )
    rescan = I.finalize_additive(
        I.apply_delta(I.additive_partial(new, ["k"], cents), [], ["k"]), ["k"]
    )
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, rescan.collect())
    )


def test_apply_delta_drops_emptied_group(spark):
    old = spark.createDataFrame([("g", 1.0), ("g", 2.0), ("h", 3.0)], "k string, v double")
    gone = old.filter(F.col("k") == "g")
    cents = _cents(F.col("v"))
    out = I.apply_delta(
        I.additive_partial(old, ["k"], cents),
        [I.additive_partial(gone, ["k"], cents, sign=-1)],
        ["k"],
    )
    assert [r.k for r in out.collect()] == ["h"]
