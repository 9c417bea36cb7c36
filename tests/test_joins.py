"""Operator-level join tests: salting must not change results, and the
salted plan must actually spread the key space."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import joins as J

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, (tuple(r) for r in df.collect())))


def test_salted_join_equals_plain_inner(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    plain = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"])
    salted = J.salted_equi_join(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"], n_salts=4
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_equals_plain_left(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber")
    # restrict right side so some left rows have no match
    o = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    plain = li.join(o, ["l_orderkey"], "left")
    salted = J.salted_equi_join(li, o, ["l_orderkey"], n_salts=4, how="left")
    assert _rows(salted) == _rows(plain)


def test_salted_join_shuffles_on_salt(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # disable auto-broadcast so the equi join actually shuffles on its keys
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        salted = J.salted_equi_join(li, o, ["l_orderkey"], n_salts=4)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_interval_join_equals_plain(spark):
    """Time-bucketed interval join must produce exactly the rows of the
    keyless containment join, while planning a hash join (scalable) instead
    of a nested loop."""
    ev = load_table(spark, SF, "events").select(
        "event_id", F.unix_millis("ts").alias("t")
    ).limit(500)
    # derive intervals from orders: [o_ms, o_ms + 6h]
    o = load_table(spark, SF, "orders").select(
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("lo"),
    ).withColumn("hi", F.col("lo") + 6 * 3600 * 1000).limit(200)
    plain = J.interval_join(ev, o, None, "t", "lo", "hi")
    bucketed = J.bucketed_interval_join(ev, o, "t", "lo", "hi", 3600 * 1000)
    cols = ["event_id", "o_orderkey"]
    assert _rows(bucketed.select(*cols)) == _rows(plain.select(*cols))
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
