"""Mergeable-sketch rollups: HLL distinct cubes, Theta set algebra, KLL
quantiles.

The reference's only aggregates are COUNT/AVG (src/OverSpeedCount.scala:133,
src/AverageSpeed.scala:112); its "rollup across months" is a driver-side
UNION re-aggregated from scratch.  At 100 TB the right shape is the sketch
cube: aggregate each partition (day, month, file) ONCE into a fixed-size
mergeable summary, then answer any coarser rollup — or a set question across
segments — by merging kilobyte sketches instead of rescanning the data.
Spark ships the Apache DataSketches family as built-in JVM aggregates
(``hll_sketch_agg``, ``theta_sketch_agg``, ``kll_sketch_agg_double``), so
everything here is whole-stage-codegen'd expression work: no UDFs, and the
partials are plain ``binary`` columns that persist to parquet.

Determinism note: all three sketches are EXACT below their retention
threshold (HLL's sparse/coupon phase, Theta's sub-``k`` hash retention, KLL
before its first compaction).  The registered queries exploit that — their
DuckDB oracles compare against exact answers, which holds for any cardinality
``n_distinct << 2^lg_k`` (resp. ``< k``); past the threshold the SAME plan
degrades gracefully to the published error bounds (pinned in
tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^14 registers ~= 16 KiB per sketch: exact to ~10k distincts, 0.8% rsd
#: beyond — the cube sweet spot (a day x dimension cell rarely needs more).
DEFAULT_LG_K = 14


def distinct_sketch_rollup(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-partition HLL distinct sketches: one ~2^lg_k-byte summary per
    ``part_cols`` cell.  One map-side-combined shuffle on the cell key; the
    result is the persistable cube layer (write it partitioned, merge
    slices forever after)."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sk"),
        F.count("*").alias("n_rows"),
    )


def merged_distinct(partials: DataFrame, sk_col: str = "sk") -> Column:
    """Aggregate expression: estimated distinct count of the UNION of all
    partial sketches.  HLL union is a register-wise max — associative,
    commutative, idempotent — so the estimate is independent of how the data
    was partitioned (pinned in tests/test_sketches.py) and of merge order.

    Usage: ``partials.agg(merged_distinct(parts).alias("d"))``."""
    del partials  # expression-only helper; kept in the signature for symmetry
    return F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sk_col), F.lit(False))
    ).cast("bigint")


def segment_overlap(
    df: DataFrame,
    seg_a: Column,
    seg_b: Column,
    value_col: str,
) -> DataFrame:
    """Distinct-set algebra between two row predicates via Theta sketches:
    |A|, |B|, |A ∩ B|, |A \\ B| of the ``value_col`` distinct sets, in ONE
    scan.  The exact formulation is two distinct-aggregates plus an
    intersect and an except — four shuffles of raw ids; here each segment
    folds into a fixed-size sketch (conditional aggregation, map-side
    combined) and the set algebra runs on two kilobyte summaries in the
    final reduce.  Returns a single row: n_a, n_b, n_intersect, n_a_only."""
    sk = df.agg(
        F.theta_sketch_agg(F.when(seg_a, F.col(value_col))).alias("sa"),
        F.theta_sketch_agg(F.when(seg_b, F.col(value_col))).alias("sb"),
    )
    est = lambda c: F.theta_sketch_estimate(c).cast("bigint")  # noqa: E731
    return sk.select(
        est(F.col("sa")).alias("n_a"),
        est(F.col("sb")).alias("n_b"),
        est(F.theta_intersection(F.col("sa"), F.col("sb"))).alias("n_intersect"),
        est(F.theta_difference(F.col("sa"), F.col("sb"))).alias("n_a_only"),
    )


def quantile_sketch_rollup(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-partition KLL(double) quantile sketches — the mergeable analog of
    ``approx_percentile`` partials, persistable like the HLL cube."""
    return df.groupBy(*part_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias("qsk"),
    )


def merged_quantiles(
    partials: DataFrame, probabilities: list[float], qsk_col: str = "qsk"
) -> DataFrame:
    """Merge partial KLL sketches and read quantiles at ``probabilities``.
    Rank error of the merged sketch matches a single whole-data sketch of
    the same ``k`` (~1.65% at k=200) — merging partials loses nothing, which
    is the point: daily sketches answer the yearly p99."""
    merged = partials.agg(F.kll_merge_agg_double(F.col(qsk_col)).alias("m"))
    return merged.select(
        *[
            F.kll_sketch_get_quantile_double(F.col("m"), F.lit(p)).alias(
                f"q{int(p * 100)}"
            )
            for p in probabilities
        ],
        F.kll_sketch_get_n_double(F.col("m")).alias("n"),
    )


def top_items_rollup(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Per-partition frequent-items sketch states (``approx_top_k_accumulate``
    — the DataSketches frequent-items aggregate): one mergeable summary per
    ``part_cols`` cell, the cube layer for "top domains / event types /
    tokens per slice" questions.  EXACT while a cell's distinct-item count
    stays within ``max_items_tracked`` (no eviction happens); beyond that it
    degrades to the published frequent-items error bounds."""
    return df.groupBy(*part_cols).agg(
        F.expr(
            f"approx_top_k_accumulate({value_col}, {max_items_tracked})"
        ).alias("tk"),
    )


def merged_top_items(partials: DataFrame, k: int = 5, tk_col: str = "tk") -> DataFrame:
    """Merge partial frequent-items states and read the global top-``k`` as
    (item, n) rows.  Merging partials loses nothing in the exact phase —
    counts add — so per-day states answer the all-time top-k without
    rescanning.  Rank-tie order at the k-cutoff is engine-dependent; callers
    wanting a deterministic result set keep ``k`` >= the distinct-item count
    (exact phase) or break ties downstream."""
    merged = partials.agg(F.expr(f"approx_top_k_combine({tk_col})").alias("m"))
    return merged.select(
        F.explode(F.expr(f"approx_top_k_estimate(m, {k})")).alias("s")
    ).select(
        F.col("s.item").alias("item"),
        F.col("s.count").cast("bigint").alias("n"),
    )
