"""Time-series resampling and gap-filling over event streams.

The reference's temporal surface is month-partitioned scans + BETWEEN
predicates (src/OverSpeedCount.scala:18-139, AverageSpeed.scala:19-225); it
has no resample/fill operator.  These are the beyond-parity time-series
primitives every sensor/traffic warehouse needs: bucket an irregular event
stream into a regular grid (OHLC-style per-bucket summary) and make the grid
DENSE by generating the missing buckets and carrying the last observation
forward.

Scale posture (100 TB):

- ``resample_ohlc`` is ONE map-side-combined aggregate — open/close are
  ``min_by``/``max_by`` over a single bigint ordering key, so no per-bucket
  sort, no window, no second shuffle.  Skewed keys behave like any grouped
  aggregate under AQE.
- ``gapfill_ffill`` generates each key's bucket spine ROW-LOCALLY
  (``sequence`` + ``explode`` from the key's own [min, max] — never a
  driver-side calendar, never a global cross join), left-joins the observed
  buckets on the same (key, bucket) hash partitioning, and forward-fills
  with one ``last(ignorenulls)`` running window per key.  Total cost: two
  shuffles on the key (aggregate + window); spine size is bounded by each
  key's own observed span, so a key dark for a year does not inflate other
  keys' partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P

def _ord_key(ts_col, id_col):
    """Deterministic total order for min_by/max_by tie-breaks: a NATIVE
    struct key ``(unix_millis(ts), id)`` — lexicographic field-wise bigint
    comparison, no arithmetic, no injectivity bound, exact for EVERY
    bigint id (negative and past-1e10 included).

    History (r11 A/B, SCALING.md): the r8 DECIMAL(38,0) pack
    ``epoch_ms * 1e10 + id`` measured 1.46× the r4 bigint pack on
    ts_resample_ohlc at sf0.1 — per-row exact-decimal multiply-adds are
    the cost.  The struct key removes the arithmetic AND the collision
    bound, so the old amortized range guard is obsolete; only the NULL-id
    raise (:func:`_ord_ids_ok`, review r6) survives, because a NULL field
    inside a non-NULL struct would order silently instead of loudly.

    Oracle pairing: DuckDB's ``arg_min/arg_max(value,
    epoch_ms(ts)::HUGEINT * 10000000000 + id)`` pack is ORDER-ISOMORPHIC
    to this struct whenever ``0 <= id < 1e10`` — true at every testdata
    SF — so existing oracle SQL selects identical winners unchanged (the
    bound is oracle-side only; the engine key is unbounded).  NOT merely
    ``abs(id) < 1e10``: a negative id borrows from the pack's timestamp
    digits — (t=0, id=9e9) packs to 9e9 but (t=1, id=-9e9) packs to 1e9,
    inverting the struct's order (advice r11).  A negative-id dataset
    needs an oracle-side struct-equivalent key — DuckDB's ordered
    aggregate ``first/last(value ORDER BY epoch_ms(ts), id)``, which is
    exactly the struct's lexicographic comparison (arg_min rejects STRUCT
    keys) — before being driver-verified; the engine side needs no
    change.  The recipe is mechanically proven on the adversarial pair in
    tests/test_timeseries.py::test_negative_id_oracle_recipe_row_key."""
    return F.struct(
        F.unix_millis(ts_col).alias("t"), id_col.cast("bigint").alias("i")
    )


def _ord_ids_ok(id_col):
    """NULL-id check for :func:`_ord_key`, amortized to one map-side
    ``min`` boolean per group (review r6: a NULL id must RAISE — the
    struct key would compare it under NULL-ordering rules and silently
    pick a winner, and the pre-r8 per-row guard raised)."""
    return F.min(id_col.isNotNull())


def _ord_guard(ok_col, out_col):
    """Attach the NULL-id check to a real output column so Catalyst cannot
    prune it: when every id in the group was non-NULL the value passes
    through unchanged; otherwise ``raise_error`` fires.
    (``when(cond, x).otherwise(x)`` with an ``assert_true`` inside the
    condition does NOT work — Catalyst folds identical-branch CASEs and
    prunes the assert; ``raise_error`` in the else-branch is side-effecting
    and survives.)  NullType coercion leaves the output type untouched —
    pinned in tests/test_timeseries.py."""
    return F.when(ok_col, out_col).otherwise(
        F.raise_error(
            F.lit(
                "timeseries ordering id is NULL — ordering keys need "
                "non-NULL ids (see _ord_key docstring)"
            )
        )
    )


#: Bucket units accepted by the gap-fill spine generators: every unit here
#: is valid for BOTH ``date_trunc`` and a ``sequence`` INTERVAL step in
#: Spark and DuckDB, so the dense spine and the truncation stay aligned.
_SPINE_BUCKETS = ("minute", "hour", "day", "week", "month", "year")


def _bucket_interval(bucket: str):
    """INTERVAL step for the dense spine; raises ValueError (matching the
    build_vocab/kcore_membership convention) instead of a bare KeyError
    for unsupported units.  resample_ohlc intentionally accepts anything
    date_trunc does — it needs no spine."""
    if bucket not in _SPINE_BUCKETS:
        raise ValueError(
            f"bucket must be one of {_SPINE_BUCKETS} for gap-fill spines, "
            f"got {bucket!r}"
        )
    return F.expr(f"INTERVAL 1 {bucket.upper()}")


def resample_ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Irregular events -> regular per-(key, bucket) OHLC summary.

    open/close = value at the first/last (ts, id) in the bucket (exact
    tie-break via the composite ordering key — no nondeterministic
    ``first()``), high/low = max/min, volume = row count.  One aggregate,
    fully map-side combinable; values pass through untouched (no float
    arithmetic), so results hash-compare exactly against any engine —
    fuzz-pinned vs the DuckDB ordered-aggregate recipe under forced ties
    and negative ids (tests/test_oracle_fuzz.py).
    """
    ord_key = _ord_key(F.col(ts_col), F.col(id_col))
    return (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min_by(F.col(value_col), ord_key).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ord_key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            _ord_ids_ok(F.col(id_col)).alias("_ids_ok"),
        )
        .select(
            key_col,
            "bucket",
            # the guard wraps BOTH key-elected columns: a downstream
            # projection keeping either open or close keeps the check
            # (Catalyst prunes expressions with their columns); high/low/
            # volume are unaffected by key collisions, so a projection
            # keeping only those is safe without it.
            _ord_guard(F.col("_ids_ok"), F.col("open")).alias("open"),
            "high",
            "low",
            _ord_guard(F.col("_ids_ok"), F.col("close")).alias("close"),
            "volume",
        )
    )


def gapfill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key bucket grid with last-observation-carried-forward.

    1. Resample to per-(key, bucket) ``close`` (last value by the composite
       ordering key — one map-side-combined aggregate).
    2. Per key, generate the FULL bucket spine from that key's own
       [min(bucket), max(bucket)] via ``sequence`` + ``explode`` — row-local
       array construction, no driver loop, no cross join against a global
       calendar.
    3. Left-join the observed closes back (same key hashing) and
       forward-fill with ``last(ignorenulls)`` over an unbounded-preceding
       running frame — the only per-key sort in the plan.

    Output: (key, bucket, value, is_observed) where ``value`` is the carried
    close and ``is_observed`` marks real buckets.  Interior gaps are
    guaranteed filled (the spine starts at an observed bucket, so the
    running ``last`` never returns null).
    """
    # conditional spread on the window key before the per-key sort/
    # window stages: identity at scale, parallelizes a low-split
    # local source up to key cardinality (partitioning.py)
    df = P.ensure_compute_width(df, key_col)
    interval = _bucket_interval(bucket)

    closes = (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.max_by(F.col(value_col), _ord_key(F.col(ts_col), F.col(id_col))).alias(
                "_c0"
            ),
            _ord_ids_ok(F.col(id_col)).alias("_ids_ok"),
        )
        .select(
            key_col,
            "bucket",
            _ord_guard(F.col("_ids_ok"), F.col("_c0")).alias("_close"),
        )
    )
    spine = (
        closes.groupBy(key_col)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), interval)).alias(
                "bucket"
            ),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(closes, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.last("_close", ignorenulls=True).over(w).alias("value"),
        F.col("_close").isNotNull().cast("int").alias("is_observed"),
    )


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key bucket grid with LINEAR interpolation across gaps —
    the physically-motivated fill for continuous signals (speeds, sensor
    readings) where :func:`gapfill_ffill`'s step function is wrong.

    Same spine construction as gapfill_ffill (row-local ``sequence`` per
    key — no global calendar).  Each missing bucket finds its bracketing
    observations with two window passes over ONE (key, bucket) sort —
    ``last(ignorenulls)`` behind, ``first(ignorenulls)`` ahead (Catalyst
    reuses the sort+exchange for both frames) — and interpolates

        value = v0 + (v1 - v0) * (t - t0) / (t1 - t0)

    a fixed IEEE op sequence over epoch-millis bigints, reproducible
    bit-for-bit in any engine.  Trailing buckets with no next observation
    carry the last value (ffill semantics); the spine starts at an
    observed bucket so a missing previous cannot occur.

    Output: (key, bucket, value, is_observed).
    """
    # conditional spread on the window key before the per-key sort/
    # window stages: identity at scale, parallelizes a low-split
    # local source up to key cardinality (partitioning.py)
    df = P.ensure_compute_width(df, key_col)
    interval = _bucket_interval(bucket)
    closes = (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.max_by(F.col(value_col), _ord_key(F.col(ts_col), F.col(id_col))).alias(
                "_c0"
            ),
            _ord_ids_ok(F.col(id_col)).alias("_ids_ok"),
        )
        .select(
            key_col,
            "bucket",
            _ord_guard(F.col("_ids_ok"), F.col("_c0")).alias("_close"),
        )
    )
    spine = (
        closes.groupBy(key_col)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), interval)).alias(
                "bucket"
            ),
        )
    )
    joined = spine.join(closes, [key_col, "bucket"], "left")
    behind = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observation" as a RUNNING frame over the reversed ordering, not
    # a (currentRow, unboundedFollowing) frame: Spark evaluates growing
    # running frames in O(n) per partition with incremental state, but an
    # unbounded-FOLLOWING frame re-aggregates the remaining rows per row —
    # O(n²) on long spines (measured 35 s -> sub-second at sf0.1).  Same
    # hash partitioning, so the second sort rides the first exchange.
    ahead = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.unix_millis(F.col("bucket"))
    obs_t = F.when(F.col("_close").isNotNull(), t)
    v0 = F.last("_close", ignorenulls=True).over(behind)
    t0 = F.last(obs_t, ignorenulls=True).over(behind)
    v1 = F.last("_close", ignorenulls=True).over(ahead)
    t1 = F.last(obs_t, ignorenulls=True).over(ahead)
    interp = F.when(
        F.col("_close").isNotNull(), F.col("_close")
    ).when(
        t1.isNull(), v0
    ).otherwise(v0 + (v1 - v0) * ((t - t0) / (t1 - t0)))
    return joined.select(
        key_col,
        "bucket",
        interp.alias("value"),
        F.col("_close").isNotNull().cast("int").alias("is_observed"),
    )


def trend_per_key(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    epoch: str = "2024-01-01",
    cents: int = 100,
) -> DataFrame:
    """Per-key least-squares trend (slope + mean level) of an irregular
    value stream — the screening pass a 100 TB telemetry warehouse runs
    before anything fancier: which keys are drifting, and how fast.

    Exact-integer formulation so the result hash-compares across engines
    (the cent-sum policy of queries/_core.py, extended to second moments):
    x = whole SECONDS since ``epoch``, y = ``round(value * cents)``, and
    the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact DECIMAL
    integer sums — order-independent, so one map-side-combined shuffle on
    the key computes them at any parallelism.  The closing algebra
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` runs in DOUBLE (the
    integer numerator/denominator can exceed 38 digits at extreme row
    counts; two rounded casts + one division is a FIXED IEEE sequence).
    Slope unit: cent-units of ``value`` per second.

    Overflow headroom is a design parameter, documented not guessed:
    |x| ≤ span_seconds (a year ≈ 3.2e7), so Σx² ≤ n·1e15 — DECIMAL(38)
    holds it to n ≈ 1e23 rows per key.  Keys observed at a single instant
    (or a single row) have a zero denominator: slope is NULL via
    try_divide, never a crash.

    Returns (key_col, n, slope, mean_y) — mean_y in ORIGINAL value units
    (one division by n·cents).

    The five moments are ASSOCIATIVE + COMMUTATIVE integer sums, i.e. a
    mergeable partial in the operators/incremental.py sense — this
    function is just ``trend_finalize(trend_partial(events))``; slice
    history into :func:`trend_partial` states and merge with
    :func:`trend_merge` for O(new data) maintenance (the never-rescan
    posture), or keep the same aggregate live under Structured Streaming —
    bit-identical results in all three arrangements by construction."""
    return trend_finalize(
        trend_partial(events, key_col, ts_col, value_col, epoch, cents),
        key_col=key_col,
        cents=cents,
    )


def trend_partial(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    epoch: str = "2024-01-01",
    cents: int = 100,
) -> DataFrame:
    """Collapse one slice of the stream to its per-key trend state:
    (key_col, _n, _sx, _sy, _sxy, _sxx) — the five exact integer moments
    of :func:`trend_per_key`.  One map-side-combined shuffle; every later
    merge is order-independent because the state is integer sums."""
    import datetime as dt

    # epoch offset resolved DRIVER-SIDE as UTC: to_timestamp(lit) would
    # parse in the session time zone, silently shifting x (and the exact
    # integer sums) between deployments; unix_seconds(ts) itself is an
    # instant -> zone-independent
    off = int(
        dt.datetime.fromisoformat(epoch)
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    # decimal(18,0) terms -> decimal(37,0) products -> decimal(38,0) sums:
    # exactly inside Spark's decimal lattice, no precision cap, ANSI-safe
    x = (F.unix_seconds(F.col(ts_col)) - F.lit(off)).cast("decimal(18,0)")
    y = F.round(F.col(value_col) * cents).cast("decimal(18,0)")
    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )


def trend_merge(parts: list[DataFrame], key_col: str = "event_type") -> DataFrame:
    """Merge per-slice trend states by summing the five moments — exact,
    order-independent, and bit-identical to a single-pass
    :func:`trend_partial` over the concatenated slices.  Keys absent from
    a slice simply contribute nothing (union, not join)."""
    from functools import reduce

    if not parts:
        raise ValueError("parts must be non-empty")
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy(key_col).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sx").alias("_sx"),
        F.sum("_sy").alias("_sy"),
        F.sum("_sxy").alias("_sxy"),
        F.sum("_sxx").alias("_sxx"),
    )


def trend_finalize(
    partials: DataFrame, key_col: str = "event_type", cents: int = 100
) -> DataFrame:
    """Close a per-key trend state into (key_col, n, slope, mean_y) — the
    fixed double cast/multiply/divide sequence of :func:`trend_per_key`'s
    contract.  Runs on kilobyte state, never on data."""
    num = (
        F.col("_n").cast("double") * F.col("_sxy").cast("double")
        - F.col("_sx").cast("double") * F.col("_sy").cast("double")
    )
    den = (
        F.col("_n").cast("double") * F.col("_sxx").cast("double")
        - F.col("_sx").cast("double") * F.col("_sx").cast("double")
    )
    return partials.select(
        F.col(key_col),
        F.col("_n").cast("bigint").alias("n"),
        F.try_divide(num, den).alias("slope"),
        F.try_divide(
            F.col("_sy").cast("double"),
            F.col("_n").cast("double") * F.lit(float(cents)),
        ).alias("mean_y"),
    )


def cusum_per_key(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key CUSUM mean-shift screen (r9) — the SEQUENTIAL complement to
    the snapshot chi-square drift monitor (validate.histogram_drift):
    where the histogram compares two corpus snapshots bin-by-bin, the
    cumulative sum of deviations from the key's own mean localizes WHEN
    a level shift happened inside one stream (Page's CUSUM statistic,
    two-sided, reported un-thresholded so the consumer picks its own h).

    Exact-integer formulation (the module's determinism policy): with
    cents ``c_j = round(100·x_j)`` and the key's totals ``n = count``,
    ``s = Σ c_j``, the classic ``C_i = Σ_{j<=i} (x_j − mean)`` is scaled
    by ``100·n`` into

        cusum_num_i = n · prefix_i − i · s          (exact integer)

    — order-independent inputs, one subtraction per row, no float
    anywhere; ``C_i = cusum_num_i / (100·n)`` is one closing division
    the consumer applies if it wants engineering units.  All arithmetic
    runs in DECIMAL(38,0) so a 1e9-row key cannot overflow (int64 dies
    near n·Σ|c| ≈ 9e18); the registered query casts the output to BIGINT
    (loud ANSI overflow, generous at any tested SF).

    NULL values are EXCLUDED before indexing (the r9 histogram_drift
    policy): a NULL contributes neither to the mean nor to a position,
    so `idx` counts observed values only.  Ordering is (ts, id) — total
    and engine-portable.  Plan: ONE exchange on the key; the
    whole-partition totals and the ordered prefix ride two window specs
    over the same sort.  Returns (id, key, idx, cusum_num, n)."""
    c = F.round(F.col(value_col) * 100).cast("decimal(20,0)")
    e = events.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        c.alias("_c"),
    )
    whole = Window.partitionBy("key")
    ordered = (
        Window.partitionBy("key")
        .orderBy(F.col("_ts").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d38 = lambda col: col.cast("decimal(38,0)")
    t = e.select(
        "id",
        "key",
        F.count(F.lit(1)).over(whole).cast("decimal(20,0)").alias("_n"),
        F.sum("_c").over(whole).cast("decimal(38,0)").alias("_s"),
        F.sum("_c").over(ordered).cast("decimal(38,0)").alias("_pfx"),
        F.row_number()
        .over(Window.partitionBy("key").orderBy(F.col("_ts").asc(), F.col("id").asc()))
        .cast("decimal(20,0)")
        .alias("_idx"),
    )
    return t.select(
        "id",
        "key",
        F.col("_idx").cast("bigint").alias("idx"),
        (d38(F.col("_n")) * F.col("_pfx") - d38(F.col("_idx")) * F.col("_s")).alias(
            "cusum_num"
        ),
        F.col("_n").cast("bigint").alias("n"),
    )


def hopping_window_agg(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """HOPPING (sliding) window aggregate — the overlapping-window twin of
    ``time_bucket``'s tumbling grid: every event lands in window/slide
    overlapping windows (4 for 1h/15min), via Spark's NATIVE ``F.window``
    with a slideDuration — the exact construct Structured Streaming reuses,
    so this batch operator and a streaming deployment share one plan shape.

    Emits (key, win_start, win_end, n, sum_cents): counts are BIGINTs and
    the value folds on the exact cents lattice (round(value*100) BIGINT sum
    — no float SUM), so every row hash-compares.  Windows are epoch-aligned
    (Spark's documented 1970-01-01 alignment), start-inclusive /
    end-exclusive.

    Scale shape: the window expansion is a row-local generator (each input
    row fans out to its window/slide assignments BEFORE the exchange), then
    ONE map-side-combined aggregate on (key, window) — shuffle bytes are
    bounded by |keys| x |windows touched|, not by input rows.  The
    overlap factor is the one knob: a 1h/15min hop writes each row 4x into
    the partial-agg hash map, which is why the slide should divide the
    window and stay coarse at 100 TB (or move to the tumbling grid +
    consumer-side rolling sum when the overlap factor exceeds ~8).
    NULL values are excluded up front (the r9 drift policy: greatest/least
    and cents-rounding would silently fold NULL mass into zeros).
    """
    e = df.filter(F.col(value_col).isNotNull())
    w = F.window(F.col(ts_col), window, slide)
    return (
        e.groupBy(F.col(key_col).alias("key"), w.alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col(value_col) * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .select(
            "key",
            F.col("_w.start").alias("win_start"),
            F.col("_w.end").alias("win_end"),
            "n",
            "sum_cents",
        )
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """HOUR-OF-DAY seasonal profile per key — the diurnal-shape report
    behind capacity planning and seasonal-naive forecasting (and the
    generalization of the reference's avg-speed-by-time_period query to a
    first-class operator): for every (key, hour-of-day),

        n, sum_cents, mean_cents = sum/n,
        seasonal_ratio = mean(key, hod) / mean(key)
                       = (sum_hod * n_key) / (n_hod * sum_key)

    — the hour's load relative to the key's own all-day mean, >1 for peak
    hours.  Both ratio legs are exact integers on the cents lattice
    (cross-multiplied on DECIMAL(38,0) so a 10^9-row key cannot overflow),
    shipped as ``ratio_num``/``ratio_den`` BIGINTs beside ONE closing IEEE
    division each for ``mean_cents`` and ``seasonal_ratio`` (NULL when the
    key's total is zero — the guard both engines share).  NULL values are
    excluded up front (the r9 drift policy).

    Scale shape: ONE map-side-combined aggregate to (key, hod) — 24 rows
    per key — then the per-key totals are a reaggregation OF THOSE PARTIALS
    (never a second corpus scan) joined back small-on-small.  Shuffle bytes
    are 24x|keys| regardless of input size.
    """
    e = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.hour(F.col(ts_col)).cast("int").alias("hod"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("c"),
    )
    hod = e.groupBy("key", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sum_cents"),
    )
    # per-key totals re-aggregate the 24-row-per-key partials, not the data
    hod = hod.localCheckpoint(eager=False)
    tot = hod.groupBy("key").agg(
        F.sum("n").cast("bigint").alias("n_key"),
        F.sum("sum_cents").cast("bigint").alias("sum_key"),
    )
    dec = "decimal(38,0)"
    num = F.col("sum_cents").cast(dec) * F.col("n_key").cast(dec)
    den = F.col("n").cast(dec) * F.col("sum_key").cast(dec)
    return hod.join(tot, "key").select(
        "key",
        "hod",
        "n",
        "sum_cents",
        (F.col("sum_cents").cast("double") / F.col("n")).alias("mean_cents"),
        num.cast("bigint").alias("ratio_num"),
        den.cast("bigint").alias("ratio_den"),
        F.when(
            F.col("sum_key") != 0, num.cast("double") / den.cast("double")
        ).alias("seasonal_ratio"),
    )


def acf_per_key(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lag: int = 1,
) -> DataFrame:
    """Lag-``lag`` AUTOCORRELATION per key — the seasonality/persistence
    detector beside cusum_per_key (CUSUM localizes a level shift; the ACF
    says whether the series is self-correlated at a given lag at all, the
    pre-check for any forecasting or gap-interpolation choice).

    Each key's series is ordered by the deterministic (ts, id) key and
    paired with itself ``lag`` steps ahead via ONE ``lead`` window; the
    Pearson correlation over those (x_i, x_{i+lag}) pairs ships as exact
    integer sufficient statistics on the cents lattice (n, Σx, Σy, Σx²,
    Σy², Σxy — the a_corr_stats mergeable shape) and ONE closing IEEE
    chain from DECIMAL(38,0) cross-multiplies, NULL-guarded on zero
    variance of either margin (constant series).  NULL values are excluded
    before pairing (the r9 drift policy: a NULL would silently break the
    lag alignment).

    Scale shape: ONE exchange on the key (the window sort), then a
    map-side-combined per-key aggregate — the same single-exchange posture
    as cusum_per_key; a 10⁹-row key stays inside int64 for the sums and
    DECIMAL(38,0) for the cross terms.
    """
    from pyspark.sql import Window

    e = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("key").orderBy("_ts", "_id")
    paired = e.select(
        "key", "x", F.lead("x", lag).over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    s = paired.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_xx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_yy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
    )
    dec = "decimal(38,0)"
    num = (
        F.col("n_pairs").cast(dec) * F.col("sum_xy").cast(dec)
        - F.col("sum_x").cast(dec) * F.col("sum_y").cast(dec)
    )
    den_x = (
        F.col("n_pairs").cast(dec) * F.col("sum_xx").cast(dec)
        - F.col("sum_x").cast(dec) * F.col("sum_x").cast(dec)
    )
    den_y = (
        F.col("n_pairs").cast(dec) * F.col("sum_yy").cast(dec)
        - F.col("sum_y").cast(dec) * F.col("sum_y").cast(dec)
    )
    return s.select(
        "key",
        F.lit(lag).cast("int").alias("lag"),
        "n_pairs",
        "sum_x",
        "sum_y",
        "sum_xx",
        "sum_yy",
        "sum_xy",
        F.when(
            (den_x != 0) & (den_y != 0),
            num.cast("double")
            / F.sqrt(den_x.cast("double") * den_y.cast("double")),
        ).alias("acf"),
    )


def local_peaks(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """LOCAL PEAK detection per key — the rows strictly greater than BOTH
    ordered neighbors on the exact cents lattice (strict on both sides:
    plateaus are not peaks, and endpoints have no two neighbors — the
    deterministic contract; a smoothed/prominence variant composes this
    with resample_ohlc's buckets upstream).  The load-spike / congestion
    marker feeding ts_cusum's "when did the level shift" with "where are
    the spikes".

    ONE exchange on the key (lag and lead share the (ts, id) window sort),
    then a row-local three-way integer comparison — no aggregation, output
    ∝ peaks.  NULL values excluded up front (the r9 drift policy).
    """
    from pyspark.sql import Window

    e = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("id"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("key").orderBy("ts", "id")
    x = e.select(
        "key", "ts", "id", "cents",
        F.lag("cents").over(w).alias("_p"),
        F.lead("cents").over(w).alias("_n"),
    )
    return x.filter(
        F.col("_p").isNotNull()
        & F.col("_n").isNotNull()
        & (F.col("cents") > F.col("_p"))
        & (F.col("cents") > F.col("_n"))
    ).select("key", "id", "cents")
