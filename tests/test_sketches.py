"""Mergeable-sketch contracts (operators/sketches.py).

Pins the properties the registered sketch queries rely on: partition
independence of HLL merges (register-lattice), Theta set-algebra identities,
KLL merge-equals-whole quantile behavior, and the accuracy degradation past
the exact phase.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import sketches

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").withColumn("d", F.to_date("ts"))


def _merged(parts):
    return parts.agg(sketches.merged_distinct(parts).alias("d")).first()["d"]


def test_hll_merge_partition_independent(spark, events):
    """Register-wise-max lattice: the merged estimate is identical no matter
    how the data was partitioned — per-day, per-user-bucket, or one part."""
    exact = events.select(F.countDistinct("user_id")).first()[0]
    by_day = sketches.distinct_sketch_rollup(events, ["d"], "user_id")
    by_bucket = sketches.distinct_sketch_rollup(
        events.withColumn("b", F.col("event_id") % 7), ["b"], "user_id"
    )
    whole = sketches.distinct_sketch_rollup(
        events.withColumn("one", F.lit(1)), ["one"], "user_id"
    )
    ests = {_merged(by_day), _merged(by_bucket), _merged(whole)}
    assert len(ests) == 1, f"partitioning changed the estimate: {ests}"
    # exact sparse phase at this cardinality
    assert ests == {exact}


def test_hll_rsd_beyond_exact_phase(spark):
    """Past the sparse phase (n >> 2^lg_k at lg_k=4 -> 16 registers) the
    estimate must stay within the published ~1.04/sqrt(m) rsd * 5."""
    n = 5000
    df = spark.range(n).select((F.col("id")).alias("v"))
    est = (
        df.agg(F.hll_sketch_agg(F.col("v"), F.lit(12)).alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .first()["e"]
    )
    rsd = 1.04 / (2**12) ** 0.5
    assert abs(est - n) <= 5 * rsd * n


def test_theta_identities(spark, events):
    """|A∩B| + |A\\B| == |A| in the exact phase, and both match the
    DataFrame intersect/except answers."""
    a_pred = F.col("value") > 300
    b_pred = (F.col("event_type") == "error") & (F.col("value") > 200)
    row = sketches.segment_overlap(events, a_pred, b_pred, "user_id").first()
    assert row["n_intersect"] + row["n_a_only"] == row["n_a"]
    a = events.filter(a_pred).select("user_id").distinct()
    b = events.filter(b_pred).select("user_id").distinct()
    assert row["n_a"] == a.count()
    assert row["n_b"] == b.count()
    assert row["n_intersect"] == a.intersect(b).count()
    assert row["n_a_only"] == a.exceptAll(a.intersect(b)).count()


def test_kll_merge_matches_whole(spark, events):
    """Daily KLL partials merged must rank-agree with a single whole-data
    sketch: both within the k=200 rank error (~1.65%, take 3x margin) of the
    exact quantile."""
    vals = sorted(r["value"] for r in events.select("value").collect())
    n = len(vals)
    parts = sketches.quantile_sketch_rollup(events, ["d"], "value", k=200)
    out = sketches.merged_quantiles(parts, [0.5, 0.95]).first()
    assert out["n"] == n
    for p, col in ((0.5, "q50"), (0.95, "q95")):
        got = out[col]
        # rank of the returned value must be within 3 * 1.65% of p
        import bisect

        rank = bisect.bisect_right(vals, got) / n
        assert abs(rank - p) <= 3 * 0.0165, f"{col}: rank {rank} vs {p}"


def test_sketch_partials_persist_roundtrip(spark, events, tmp_path):
    """The cube layer is persistable: binary sketch columns survive a
    parquet round-trip and merge to the same estimate."""
    parts = sketches.distinct_sketch_rollup(events, ["d"], "user_id")
    path = str(tmp_path / "cube")
    parts.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert _merged(back) == _merged(parts)


def test_top_items_merge_partition_independent_and_exact_phase(spark, events):
    """Frequent-items states: merging per-day partials equals a single
    whole-data sketch in the exact phase (counts add, no eviction), and the
    result matches the exact GROUP BY counts."""
    from pyspark.sql import functions as F

    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    parts = sketches.top_items_rollup(events, ["d"], "event_type")
    got = {
        r["item"]: r["n"]
        for r in sketches.merged_top_items(parts, k=len(exact)).collect()
    }
    assert got == exact
    whole = sketches.top_items_rollup(events.withColumn("_c", F.lit(1)), ["_c"], "event_type")
    got_whole = {
        r["item"]: r["n"]
        for r in sketches.merged_top_items(whole, k=len(exact)).collect()
    }
    assert got_whole == exact


def test_top_items_degrades_beyond_tracking(spark):
    """Past maxItemsTracked the sketch still surfaces true heavy hitters:
    a skewed stream (one dominant item among many uniques) keeps the
    dominant item's count within the frequent-items overestimate bound."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 4 == 0, F.lit("heavy"))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("v"),
        F.lit(1).alias("_c"),
    )
    parts = sketches.top_items_rollup(df, ["_c"], "v", max_items_tracked=64)
    top = {r["item"]: r["n"] for r in sketches.merged_top_items(parts, k=1).collect()}
    assert "heavy" in top
    true_n = 5000
    # frequent-items guarantees count in [true, true + n/maxMapSize-ish];
    # allow the documented epsilon: overestimate only, bounded by ~n * 3.5/M
    assert true_n <= top["heavy"] <= true_n + int(20_000 * 3.5 / 64)
