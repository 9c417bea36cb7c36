"""Experiment assignment + two-proportion analysis (operators/abtest.py)
and the per-key exact-integer trend (operators/timeseries.trend_per_key).

The registry rows (a_ab_conversion, ts_trend_per_key) oracle-verify the
event-stream paths; these tests pin the statistics on hand-checkable
inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import abtest


def test_assign_arms_sticky_and_complete(spark):
    users = spark.range(2000).withColumnRenamed("id", "user_id")
    out = abtest.assign_arms(users, {"control": 0.5, "treatment": 0.5})
    counts = {r["arm"]: r["n"] for r in out.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"control", "treatment"}
    assert sum(counts.values()) == 2000
    # md5-uniform: loose binomial bound
    assert 800 < counts["control"] < 1200
    # sticky under repartitioning
    again = abtest.assign_arms(users.repartition(7), {"control": 0.5, "treatment": 0.5})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_conversion_by_arm_counts_users_once(spark):
    # user 1 fires 3 purchases -> converts ONCE; user 2 never converts
    ev = spark.createDataFrame(
        [(1, "purchase"), (1, "purchase"), (1, "purchase"),
         (2, "view"), (3, "purchase"), (4, "view")],
        "user_id BIGINT, event_type STRING",
    )
    out = abtest.conversion_by_arm(
        ev, F.col("event_type") == "purchase", {"a": 0.5, "b": 0.5}
    )
    rows = out.collect()
    assert sum(r["n_users"] for r in rows) == 4
    assert sum(r["n_converted"] for r in rows) == 2
    for r in rows:
        assert r["rate"] == pytest.approx(r["n_converted"] / r["n_users"])


def _z(na, ca, nb, cb):
    pa, pb = ca / na, cb / nb
    p = (ca + cb) / (na + nb)
    return (pa - pb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))


def test_two_proportion_z_hand_case(spark):
    summary = spark.createDataFrame(
        [("control", 4, 2, 0.5), ("treatment", 4, 1, 0.25)],
        "arm STRING, n_users BIGINT, n_converted BIGINT, rate DOUBLE",
    )
    row = abtest.two_proportion_z(summary, "control", "treatment").first()
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == (4, 2, 4, 1)
    assert row["rate_a"] == 0.5 and row["rate_b"] == 0.25
    assert row["z"] == pytest.approx(_z(4, 2, 4, 1))


def test_two_proportion_z_degenerate_null_not_crash(spark):
    # both arms convert 100%: zero pooled variance -> NULL z
    summary = spark.createDataFrame(
        [("control", 5, 5, 1.0), ("treatment", 5, 5, 1.0)],
        "arm STRING, n_users BIGINT, n_converted BIGINT, rate DOUBLE",
    )
    row = abtest.two_proportion_z(summary, "control", "treatment").first()
    assert row["z"] is None
    assert row["rate_a"] == 1.0


# ---------------------------------------------------------------------------
# trend_per_key
# ---------------------------------------------------------------------------


def test_trend_exact_line_and_units(spark):
    from trafficbigdatasearch_spark.operators import timeseries as TS

    # y = 2.0 * (seconds since epoch) in value units -> slope = 200 cents/s
    rows = [
        ("k", f"2024-01-01 00:00:{s:02d}", 2.0 * s) for s in range(0, 50, 7)
    ]
    df = spark.createDataFrame(rows, "k STRING, ts STRING, value DOUBLE").select(
        "k", F.to_utc_timestamp(F.col("ts"), "UTC").alias("ts"), "value"
    )
    out = TS.trend_per_key(df, key_col="k").first()
    assert out["slope"] == pytest.approx(200.0)
    assert out["mean_y"] == pytest.approx(
        sum(2.0 * s for s in range(0, 50, 7)) / len(rows)
    )
    assert out["n"] == len(rows)


def test_trend_single_instant_null_slope(spark):
    from trafficbigdatasearch_spark.operators import timeseries as TS

    df = spark.createDataFrame(
        [("k", "2024-01-05 12:00:00", 3.5), ("k", "2024-01-05 12:00:00", 9.0)],
        "k STRING, ts STRING, value DOUBLE",
    ).select("k", F.to_utc_timestamp(F.col("ts"), "UTC").alias("ts"), "value")
    out = TS.trend_per_key(df, key_col="k").first()
    assert out["slope"] is None          # zero denominator -> NULL, no crash
    assert out["mean_y"] == pytest.approx((3.5 + 9.0) / 2)


def test_trend_order_and_partition_invariant(spark):
    from trafficbigdatasearch_spark.operators import timeseries as TS

    import random

    rng = random.Random(7)
    rows = [
        ("a" if i % 3 else "b",
         f"2024-01-{1 + i % 28:02d} {i % 24:02d}:00:00",
         round(rng.uniform(-50, 50), 2))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k STRING, ts STRING, value DOUBLE").select(
        "k", F.to_utc_timestamp(F.col("ts"), "UTC").alias("ts"), "value"
    )
    a = {r["k"]: r for r in TS.trend_per_key(df, key_col="k").collect()}
    b = {
        r["k"]: r
        for r in TS.trend_per_key(df.repartition(13), key_col="k").collect()
    }
    for k in a:
        # EXACT equality, not approx: integer sufficient statistics make
        # the closing float algebra bit-identical at any parallelism
        assert a[k]["slope"] == b[k]["slope"]
        assert a[k]["mean_y"] == b[k]["mean_y"]


def test_trend_partial_merge_finalize_bit_identical(spark):
    """Slice -> partial -> merge -> finalize must equal the single-pass
    trend EXACTLY (integer moments make the closing float algebra
    bit-identical), including when a slice misses some keys entirely."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    import random

    rng = random.Random(23)
    rows = [
        ("a" if i % 3 else "b",
         f"2024-01-{1 + i % 28:02d} {i % 24:02d}:{i % 60:02d}:00",
         round(rng.uniform(-20, 120), 2))
        for i in range(400)
    ] + [("c", "2024-01-02 00:00:00", 5.0)]   # key only in the first slice
    df = spark.createDataFrame(rows, "k STRING, ts STRING, value DOUBLE").select(
        "k", F.to_utc_timestamp(F.col("ts"), "UTC").alias("ts"), "value"
    )
    single = {r["k"]: r for r in TS.trend_per_key(df, key_col="k").collect()}
    day = F.dayofmonth(F.col("ts"))
    parts = [
        TS.trend_partial(df.filter(day <= 10), key_col="k"),
        TS.trend_partial(df.filter((day > 10) & (day <= 20)), key_col="k"),
        TS.trend_partial(df.filter(day > 20), key_col="k"),
    ]
    merged = {
        r["k"]: r
        for r in TS.trend_finalize(TS.trend_merge(parts, key_col="k"),
                                   key_col="k").collect()
    }
    assert set(single) == set(merged)
    for k in single:
        assert single[k]["n"] == merged[k]["n"]
        assert single[k]["slope"] == merged[k]["slope"]     # exact, not approx
        assert single[k]["mean_y"] == merged[k]["mean_y"]


def test_trend_merge_rejects_empty(spark):
    from trafficbigdatasearch_spark.operators import timeseries as TS

    with pytest.raises(ValueError, match="non-empty"):
        TS.trend_merge([])


def test_conversion_null_predicate_counts_as_no(spark):
    """A NULL convert predicate (NULL value column) must count as
    non-converting — the oracle's CASE ... ELSE 0 — never poison the
    user's flag."""
    ev = spark.createDataFrame(
        [(1, "purchase", None), (1, "view", 10.0), (2, "purchase", 95.0)],
        "user_id BIGINT, event_type STRING, value DOUBLE",
    )
    out = abtest.conversion_by_arm(
        ev,
        (F.col("event_type") == "purchase") & (F.col("value") >= 90),
        {"a": 0.5, "b": 0.5},
    )
    assert sum(r["n_converted"] for r in out.collect()) == 1
    assert sum(r["n_users"] for r in out.collect()) == 2
