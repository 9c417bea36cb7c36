"""Bucketed-table pins beyond test_plans' shuffle-free join: the answer
must not move, aggregation rides the layout, and bucket pruning reaches the
scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.sources.parquet import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(
        li, "t_li_bk", ["l_orderkey"], N_BUCKETS,
        sort_cols=["l_orderkey"], path=str(d / "li"),
    )
    write_bucketed(
        o, "t_o_bk", ["l_orderkey"], N_BUCKETS,
        sort_cols=["l_orderkey"], path=str(d / "o"),
    )
    yield "t_li_bk", "t_o_bk"
    spark.sql("DROP TABLE IF EXISTS t_li_bk")
    spark.sql("DROP TABLE IF EXISTS t_o_bk")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_equals_plain(spark, bucketed_tables):
    """The co-located layout is a physical rewrite only — row-identical to
    the plain shuffled join."""
    left, right = bucketed_tables
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    want = sorted(map(tuple, li.join(o, ["l_orderkey"]).collect()))
    got = sorted(map(tuple, bucketed_join(spark, left, right, ["l_orderkey"]).collect()))
    assert got == want


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """A groupBy on the bucket key rides the same disk layout: partial and
    final aggregate fuse with no exchange between them."""
    left, _ = bucketed_tables
    agg = (
        spark.table(left)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in _executed_plan(agg)


def test_traffic_toll_join_bucketed_no_exchange(spark, traffic_dir, tmp_path_factory):
    """The reference's J2 at 100 TB: observations and toll trips are BOTH
    facts joined on plate every query — bucket both by plate at ingest and
    the interval join (equi plate + band residual) runs with zero exchanges,
    row-identical to the plain join."""
    import datetime as dt

    from trafficbigdatasearch_spark.engine import TrafficEngine, months_between
    from trafficbigdatasearch_spark.operators import joins as J

    eng = TrafficEngine(spark, str(traffic_dir), layout="reference_csv", mode="parity")
    months = months_between(dt.date(2016, 7, 1), dt.date(2016, 7, 31))
    speed = eng.speed_data(months).select(
        F.col("HPHM").alias("plate"),
        F.col("WZSJMillis").alias("t"),
        F.col("CLSD").alias("speed"),
    )
    fee = eng.fee_data(months).select(
        F.col("ENVEHPLATE").alias("plate"),
        F.col("ENTIMEMillis").alias("lo"),
        F.col("EXTIMEMillis").alias("hi"),
        F.col("EXVEHCLASS").alias("cls"),
    )
    d = tmp_path_factory.mktemp("traffic_bucketed")
    write_bucketed(
        speed, "t_obs_bk", ["plate"], 4, sort_cols=["plate"], path=str(d / "obs")
    )
    write_bucketed(
        fee, "t_fee_bk", ["plate"], 4, sort_cols=["plate"], path=str(d / "fee")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        band = (F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))
        j = bucketed_join(spark, "t_obs_bk", "t_fee_bk", ["plate"]).filter(band)
        assert "Exchange" not in _executed_plan(j), _executed_plan(j)
        want = J.interval_join(
            speed, fee.withColumnRenamed("plate", "p"), None, "t", "lo", "hi"
        ).filter(F.col("plate") == F.col("p")).drop("p")
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_obs_bk")
        spark.sql("DROP TABLE IF EXISTS t_fee_bk")


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """Point lookup on the bucket key scans ONE bucket, not N — the scan
    node advertises SelectedBucketsCount."""
    left, _ = bucketed_tables
    key = spark.table(left).select(F.min("l_orderkey")).collect()[0][0]
    # autoBucketedScan turns OFF the bucketed layout for plans that don't
    # need its distribution (a bare filter) — disable it so the scan keeps
    # the layout and the planner can prune to the one matching bucket
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        probe = spark.table(left).filter(F.col("l_orderkey") == key)
        plan = _executed_plan(probe)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )


def test_ohlc_append_torn_build_rebuilds(spark):
    """The two-write (history overwrite + increment append) build of
    ts_ohlc_bucketed_append is guarded by a marker recorded only AFTER
    the append: a table that exists WITHOUT the marker is a torn build
    (interrupted between the writes) and must be rebuilt, not served
    history-only (ADVICE r12).  Simulate the torn state exactly — table
    holding only the history half, no marker — and assert the next call
    returns full-range results."""
    import os
    import shutil

    from trafficbigdatasearch_spark.queries import standard
    from trafficbigdatasearch_spark.queries.std_textsim import _scratch

    q = standard.queries()["ts_ohlc_bucketed_append"]
    full = q(spark, SF)
    cutoff = "2024-01-21"
    n_full = full.count()
    n_post = full.filter(F.col("bucket") >= cutoff).count()
    assert n_post > 0, "fixture has no post-cutoff hours; cutoff pin broken"

    # Reconstruct the torn state the same way the builder names things.
    scratch = _scratch("ohlc_bkta", SF)
    table = "tbds_ohlc_bkta_" + os.path.basename(scratch)[-8:].replace("-", "_")
    marker = os.path.join(scratch, "_APPEND_COMPLETE")
    path = os.path.join(scratch, "tbl")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(path, ignore_errors=True)
    if os.path.exists(marker):
        os.remove(marker)
    ev = load_table(spark, SF, "events")
    write_bucketed(
        ev.filter(F.col("ts") < cutoff), table, ["user_id"], 32,
        path=path, sort_cols=["user_id", "ts"],
    )
    # crash here: table exists, marker absent, increment missing
    assert spark.catalog.tableExists(table) and not os.path.exists(marker)

    again = q(spark, SF)
    assert again.count() == n_full
    assert again.filter(F.col("bucket") >= cutoff).count() == n_post
    assert os.path.exists(marker)
