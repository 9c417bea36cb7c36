"""Global (corpus-wide) rank bucketing without a global sort.

The partitioned rank windows (w_quality_deciles) are the per-group form;
this module is the promised SCALE variant for a corpus-WIDE decile /
percentile: a global ``ntile``/``cume_dist`` window funnels every row
through one task, which is a non-starter at 100 TB.  Instead:

- ``exact-histogram`` (default): one map-side-combined ``groupBy(col)``
  builds the value histogram (cardinality = distinct values, orders of
  magnitude below row count for discrete quality scores / lengths), a
  cumulative window over the HISTOGRAM (bounded, documented like the
  vocab.py top-V window) turns it into an exact CDF, and a broadcast
  join assigns each row its bucket map-side — zero corpus shuffle beyond
  the histogram partials, exact ties-share-a-bucket semantics, and every
  output is integer arithmetic (oracle-hashable).
- ``approx``: for genuinely continuous high-cardinality scores,
  ``approxQuantile`` (Greenwald-Khanna, driver-merged sketch partials)
  yields n_buckets-1 cutpoints that are broadcast and applied with one
  ``width_bucket``-style CASE — the classic broadcast-cutpoints plan.
  Not registered against an oracle (the sketch is Spark-specific); pinned
  by pytest instead.

Both return the input columns plus ``{out_prefix}bucket`` (1..n_buckets,
BIGINT) and — exact mode only — ``{out_prefix}cdist`` (exact cumulative
fraction, one IEEE divide of exact integers).

Beyond the reference (greatji/TrafficBigDataSearch has no rank windows at
all); the scale pattern is the mitigation cited by w_quality_deciles's
docstring and SCALING.md's window row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_quantile_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    *,
    method: str = "exact-histogram",
    relative_error: float = 0.001,
    out_prefix: str = "g_",
) -> DataFrame:
    if method == "exact-histogram":
        return _exact_histogram(df, col, n_buckets, out_prefix)
    if method == "approx":
        return _approx_cutpoints(df, col, n_buckets, relative_error, out_prefix)
    raise ValueError(
        f"method must be 'exact-histogram' or 'approx', got {method!r}"
    )


def _exact_histogram(
    df: DataFrame, col: str, n_buckets: int, out_prefix: str
) -> DataFrame:
    # ONE corpus scan: the value histogram.  The grand total is the SUM of
    # the histogram's own counts — a histogram-sized aggregate, so the
    # corpus is never read twice (a cube() over (col)/() compiles to two
    # full scan+aggregate branches — verified in PLANS.md and avoided).
    # The two consumers of `counts` (CDF window + total) share ONE shuffle
    # stage at runtime: AQE's exchange reuse dedupes the identical
    # subtrees, so the corpus scan executes once (ReusedExchange pinned in
    # tests/test_ranks.py).  NULL values are excluded consistently from
    # histogram, total, and (via the inner join) the output.
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    total = counts.agg(F.sum("_c").cast("bigint").alias("_n"))
    # Cumulative CDF over the histogram only — this unpartitioned window
    # runs over |distinct(col)| rows (bounded by construction, same
    # documented pattern as vocab.py's top-V rank), never the corpus.
    w = (
        Window.orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = counts.select(
        col, F.sum("_c").over(w).cast("bigint").alias("_cum")
    )
    # bucket = ceil(n_buckets * cum / N) in pure integer arithmetic
    # ((n*cum + N - 1) div N, Spark's integral `div`, never float `/`) —
    # ties share a bucket by construction, exact at any row count.
    buckets = cdf.crossJoin(F.broadcast(total)).select(
        col,
        F.expr(f"({n_buckets} * _cum + _n - 1) div _n")
        .cast("bigint")
        .alias(out_prefix + "bucket"),
        (F.col("_cum").cast("double") / F.col("_n")).alias(
            out_prefix + "cdist"
        ),
    )
    # Map-side assignment: the CDF is histogram-sized — broadcast it.
    return df.join(F.broadcast(buckets), col)


def _approx_cutpoints(
    df: DataFrame,
    col: str,
    n_buckets: int,
    relative_error: float,
    out_prefix: str,
) -> DataFrame:
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # approxQuantile merges per-partition GK sketches driver-side: the
    # collected state is sketch-sized (O(1/relative_error)), not data-sized.
    cuts = df.approxQuantile(col, probs, relative_error)
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + (F.col(col) > F.lit(c)).cast("int")
    return df.withColumn(out_prefix + "bucket", bucket.cast("bigint"))
