"""Hot-key skew (SURVEY.md §7 "what's hard" (d)): the toll interval join
under a deliberately skewed plate distribution.

Three pins on the 100 TB posture:
- correctness survives skew: the full overspeed pipeline on the hot fixture
  still matches the pure-Python oracle (AQE skew-join may split partitions
  at runtime; the ANSWER must not move);
- the salted variant of the J2 interval join is row-identical to the plain
  join (salting is a physical rewrite, never a semantic one);
- salting actually bounds the per-task key group: the max (key, salt) group
  is a fraction of the unsalted hot-key group, so no single reducer holds
  the hot plate.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests import traffic_sim
from trafficbigdatasearch_spark.engine import TrafficEngine, months_between
from trafficbigdatasearch_spark.operators import joins as J

BBOX = (116.0, 118.0, 36.0, 39.0)
HOT = 3  # 150 hot trips + ~1200 hot observations per month on plate PHOT0


@pytest.fixture(scope="module")
def hot_traffic_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("traffic_hot")
    traffic_sim.generate(base, hot_plate=HOT)
    return base


@pytest.fixture(scope="module")
def hot_engine(spark, hot_traffic_dir):
    return TrafficEngine(
        spark, str(hot_traffic_dir), layout="reference_csv", mode="parity"
    )


def _args(bbox):
    lon_lo, lon_hi, lat_lo, lat_hi = bbox
    return (lon_hi, lon_lo, lat_hi, lat_lo)


def test_overspeed_correct_under_skew(hot_engine, hot_traffic_dir):
    """The full reference pipeline on the hot fixture vs the Python oracle —
    the session has AQE skew-join enabled (session.py), and whatever the
    physical planner does with the hot plate, the answer must match."""
    got = {
        tuple(r)
        for r in hot_engine.overspeed_count_df(
            *_args(BBOX), "2016-06-15", "2016-08-02"
        ).collect()
    }
    want = traffic_sim.oracle_overspeed(
        hot_traffic_dir, BBOX, "2016-06-15", "2016-08-02"
    )
    assert got == want
    assert len(got) > 0


def _speed_and_fee(engine):
    months = months_between(dt.date(2016, 7, 1), dt.date(2016, 7, 31))
    speed = engine.speed_data(months).select(
        F.col("HPHM").alias("plate"),
        F.col("WZSJMillis").alias("t"),
        F.col("CLSD").alias("speed"),
    )
    fee = engine.fee_data(months).select(
        F.col("ENVEHPLATE").alias("plate"),
        F.col("ENTIMEMillis").alias("lo"),
        F.col("EXTIMEMillis").alias("hi"),
        F.col("EXVEHCLASS").alias("cls"),
    )
    return speed, fee


def test_salted_interval_join_equals_plain(spark, hot_engine):
    """Salted J2 (equi plate + band residual) == plain interval join, row
    for row, on the hot fixture."""
    speed, fee = _speed_and_fee(hot_engine)
    plain = J.interval_join(speed, fee.withColumnRenamed("plate", "p"),
                            None, "t", "lo", "hi").filter(
        F.col("plate") == F.col("p")
    ).drop("p")
    band = (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
    salted = J.salted_equi_join(speed, fee, ["plate"], n_salts=8, residual=band)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salting_bounds_hot_key_group(spark, hot_engine):
    """The skew bound itself: unsalted, the hot plate's observations land on
    ONE reducer of the plate-keyed exchange; salted, the max (plate, salt)
    group must be a small fraction of that — this is the per-task upper
    bound a straggler would see."""
    speed, _ = _speed_and_fee(hot_engine)
    n_salts = 8
    unsalted_max = (
        speed.groupBy("plate").count().agg(F.max("count")).collect()[0][0]
    )
    hot_n = speed.filter(F.col("plate") == "PHOT0").count()
    assert unsalted_max == hot_n, "fixture skew regressed: PHOT0 must be the hot key"

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in speed.columns]), F.lit(n_salts))
    salted_max = (
        speed.withColumn("_salt", salt.cast("int"))
        .groupBy("plate", "_salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    # hash salting is ~uniform: allow 2x headroom over the ideal 1/n_salts
    assert salted_max <= max(2 * hot_n // n_salts, 1), (
        f"salting did not spread the hot key: max group {salted_max} "
        f"vs hot key {hot_n} at {n_salts} salts"
    )


def test_salted_join_plan_stays_hash_based(spark, hot_engine):
    """The salted join must still plan as a hash-partitioned equi join (the
    band stays a residual) — salting that degraded to a nested loop would
    trade skew for quadratic work."""
    speed, fee = _speed_and_fee(hot_engine)
    band = (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        salted = J.salted_equi_join(speed, fee, ["plate"], n_salts=8, residual=band)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "_salt" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
