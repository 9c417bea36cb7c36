"""Deterministic experiment assignment and two-proportion analysis.

The event-stream analytics family (funnels, retention, attribution in
queries/standard.py) stops one step short of the decision loop: assign
users to experiment arms, measure a conversion rate per arm, and test the
difference.  This module is that step, DataFrame-native and deterministic
end-to-end:

- Assignment is md5-range membership on the USER id (operators/sampling.py
  recipe) — row-local, stable across retries/engines, and sticky: a user's
  arm never changes as more of their events arrive, which is the property
  that makes per-user conversion well-defined on an append-only stream.
- Conversion counts are per-USER (did the user convert at least once),
  computed on the distinct converting-user set — so a single user firing
  1000 purchase events counts once, the standard guard against
  heavy-user bias (same collapse as recsys.user_item / a_basket_pairs).
- The two-proportion z statistic is a FIXED IEEE op chain over the four
  integer counts (the package determinism policy: integer sums, then a
  pinned sequence of casts/divisions/sqrt — reproducible bit-for-bit in
  the DuckDB oracle).

Scale: one distinct-collapse shuffle on user_id + one map-side-combined
per-arm count; the z row is a 2-row fold.  Nothing here is data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import sampling


def assign_arms(
    users: DataFrame,
    arms: dict[str, float],
    salt: str = "exp",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign every user to a named arm by md5 hash range (insertion-order
    bucket allocation, quantized to 1/10000 — sampling.hash_split's
    contract, keyed on the user so assignment is sticky per user).  Adds
    an ``arm`` column; no rows dropped, no shuffle."""
    return sampling.hash_split(users, user_col, arms, salt=salt).withColumnRenamed(
        "split", "arm"
    )


def conversion_by_arm(
    events: DataFrame,
    convert: Column,
    arms: dict[str, float],
    salt: str = "exp",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-arm conversion summary over an event stream: (arm, n_users,
    n_converted, rate) where a user converts if ANY of their events
    satisfies ``convert``.  rate = n_converted / n_users, one division.

    Plan: distinct users (one collapse shuffle), row-local arm label,
    per-user max(convert) + per-arm integer counts in one
    map-side-combined aggregate chain."""
    # coalesce BEFORE the max: a NULL predicate (e.g. a NULL value column)
    # must mean "this event does not convert" (the oracle's CASE ... ELSE 0
    # semantics), not propagate NULL into the user's conversion flag
    per_user = (
        events.groupBy(user_col)
        .agg(
            F.max(F.coalesce(convert.cast("int"), F.lit(0))).alias("_conv")
        )
    )
    labeled = assign_arms(per_user, arms, salt=salt, user_col=user_col)
    return (
        labeled.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("_conv").cast("bigint").alias("n_converted"),
        )
        .select(
            "arm",
            "n_users",
            "n_converted",
            F.try_divide(
                F.col("n_converted").cast("double"),
                F.col("n_users").cast("double"),
            ).alias("rate"),
        )
    )


def two_proportion_z(
    summary: DataFrame,
    arm_a: str,
    arm_b: str,
) -> DataFrame:
    """Fold a per-arm conversion summary into ONE row testing arm_a vs
    arm_b: (n_a, conv_a, n_b, conv_b, rate_a, rate_b, z) with the pooled
    two-proportion statistic

        z = (p_a − p_b) / sqrt(p·(1−p)·(1/n_a + 1/n_b)),
        p = (conv_a + conv_b) / (n_a + n_b).

    Every term is a fixed-order expression over the four integer counts —
    pivoted to columns with literal-arm filters (never a float aggregate
    over rows), so the statistic hash-compares across engines.  Degenerate
    designs (an empty arm, or p in {0, 1} making the variance zero) yield
    NULL z via try_divide, never a crash."""
    picked = summary.filter(F.col("arm").isin([arm_a, arm_b]))
    one = picked.agg(
        F.sum(F.when(F.col("arm") == arm_a, F.col("n_users"))).alias("n_a"),
        F.sum(F.when(F.col("arm") == arm_a, F.col("n_converted"))).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == arm_b, F.col("n_users"))).alias("n_b"),
        F.sum(F.when(F.col("arm") == arm_b, F.col("n_converted"))).alias(
            "conv_b"
        ),
    )
    pa = F.try_divide(F.col("conv_a").cast("double"), F.col("n_a").cast("double"))
    pb = F.try_divide(F.col("conv_b").cast("double"), F.col("n_b").cast("double"))
    pool = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")).cast("double"),
        (F.col("n_a") + F.col("n_b")).cast("double"),
    )
    se = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return one.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        F.try_divide(pa - pb, se).alias("z"),
    )
