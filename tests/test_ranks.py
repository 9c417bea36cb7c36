"""Global quantile bucketing (operators/ranks.py).

Exact-histogram mode is oracle-verified through the registry row
(w_quality_deciles_global); these tests pin the semantics on a hand-sized
frame plus the approx (broadcast-cutpoints) mode the oracle can't cover.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators.ranks import global_quantile_buckets


def _mk(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id INT, score DOUBLE"
    )


def test_exact_histogram_matches_ceil_cdf(spark):
    values = [1, 1, 2, 3, 3, 3, 4, 7, 7, 10]
    df = _mk(spark, values)
    out = global_quantile_buckets(df, "score", 4).collect()
    n = len(values)
    ranked = sorted(values)
    for row in out:
        cum = sum(1 for v in ranked if v <= row["score"])
        assert row["g_bucket"] == math.ceil(4 * cum / n)
        assert row["g_cdist"] == cum / n
    # ties share a bucket: all three 3.0s in one bucket
    b3 = {r["g_bucket"] for r in out if r["score"] == 3.0}
    assert len(b3) == 1


def test_exact_histogram_null_safe(spark):
    # a NULL data value must not be conflated with the cube() total row
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0), (4, 2.0)], "id INT, score DOUBLE"
    )
    out = global_quantile_buckets(df, "score", 2)
    rows = {r["id"]: r["g_bucket"] for r in out.collect()}
    # NULLs are excluded consistently: dropped from the histogram, the
    # total (n=3), and (via the inner join) the output
    assert 2 not in rows
    assert rows[1] == 1 and rows[3] == 2 and rows[4] == 2


def test_exact_histogram_no_corpus_shuffle_window(spark):
    # plan shape: no Window over the corpus — the only window input is the
    # aggregated histogram (Aggregate appears below the Window in the plan)
    df = _mk(spark, range(100))
    out = global_quantile_buckets(df, "score", 10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    w = plan.find("Window")
    agg = plan.find("Aggregate", w)
    assert w != -1 and agg != -1, plan


def test_exact_histogram_reuses_one_scan(spark):
    # the CDF window and the grand total both consume the histogram; AQE
    # exchange reuse must collapse them to ONE shuffle stage (and so one
    # corpus scan) at runtime
    df = _mk(spark, range(500))
    out = global_quantile_buckets(df, "score", 10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:3000]


def test_approx_buckets_monotone_and_balanced(spark):
    df = _mk(spark, range(1000))
    out = global_quantile_buckets(df, "score", 10, method="approx")
    rows = out.orderBy("score").collect()
    buckets = [r["g_bucket"] for r in rows]
    assert buckets == sorted(buckets)
    assert min(buckets) == 1 and max(buckets) == 10
    from collections import Counter

    sizes = Counter(buckets).values()
    # GK at eps=0.001 on uniform data: every decile within 2% of 100
    assert all(80 <= s <= 120 for s in sizes)


def test_bad_method_raises(spark):
    df = _mk(spark, [1, 2, 3])
    try:
        global_quantile_buckets(df, "score", 4, method="nope")
    except ValueError as e:
        assert "exact-histogram" in str(e)
    else:
        raise AssertionError("expected ValueError")
