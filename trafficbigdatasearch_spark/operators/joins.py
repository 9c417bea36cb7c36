"""Generalized join operators beyond plain equi joins (SURVEY.md §2.3).

The reference ships exactly two join shapes — broadcast-able equi (J1) and
equi+band interval (J2).  This module generalizes both and adds the as-of
join the reference lacks, all as DataFrame compositions (no custom Catalyst
rules; AQE + skew-join handle the physical concerns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
    closed: str = "both",
) -> DataFrame:
    """Generic interval-containment join: left rows matched to right rows
    whose [lo, hi] interval contains ``left_ts``, plus optional equi keys.

    This is the reference's J2 (src/OverSpeedCount.scala:123) generalized:
    with equi keys present Catalyst plans hash/SMJ on them and evaluates the
    band as a residual — the scalable shape.  WITHOUT equi keys this is a
    pure range join (BNLJ); callers at scale must provide keys or pre-bucket
    the time axis (see ``bucketed_interval_join``).
    """
    lo, hi = F.col(right_lo), F.col(right_hi)
    t = left[left_ts]
    if closed == "both":
        band = (t >= lo) & (t <= hi)
    elif closed == "left":
        band = (t >= lo) & (t < hi)
    elif closed == "right":
        band = (t > lo) & (t <= hi)
    else:
        band = (t > lo) & (t < hi)
    cond = band
    for k in on or []:
        cond = cond & (left[k] == right[k])
    return left.join(right, cond, how)


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Keyless-scalable interval join: explode each right interval into the
    fixed-width time buckets it overlaps, equi-join on the bucket, then apply
    the exact band as a residual.  Turns the O(n*m) range join into a
    hash-partitioned equi join — the standard time-bucketing trick for range
    joins at scale (same idea as Databricks' range-join bin hints).

    ``bucket_width`` is in the units of the timestamp columns; intervals are
    assumed closed.  Choose width ~ median interval length.  Fuzz-pinned
    row-identical to :func:`interval_join` for any width
    (tests/test_oracle_fuzz.py).
    """
    lw = left.withColumn("_bucket", (F.col(left_ts) / bucket_width).cast("bigint"))
    rw = right.withColumn(
        "_buckets",
        F.sequence(
            (F.col(right_lo) / bucket_width).cast("bigint"),
            (F.col(right_hi) / bucket_width).cast("bigint"),
        ),
    ).withColumn("_bucket", F.explode(F.col("_buckets"))).drop("_buckets")
    cond = (lw["_bucket"] == rw["_bucket"]) & (
        lw[left_ts] >= rw[right_lo]
    ) & (lw[left_ts] <= rw[right_hi])
    for k in on or []:
        cond = cond & (lw[k] == rw[k])
    return lw.join(rw, cond, "inner").drop(lw["_bucket"]).drop(rw["_bucket"])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_cols: list[str] | None = None,
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, attach the single right row with the
    latest ``right_ts`` <= ``left_ts`` (direction="backward"; "forward" =
    earliest >=; "nearest" = whichever of the two sits closer, equidistant
    ties to the backward row — the full pandas ``merge_asof`` direction
    contract) sharing the equi keys.

    ``tolerance`` (r9 — the pandas ``merge_asof``/kdb max-gap contract):
    when set, a match farther than ``tolerance`` from ``left_ts`` is
    nulled out — the NEAREST row is still the only candidate (a farther
    in-tolerance row is never "better", exactly merge_asof's rule), so
    this is a row-local post-filter on the matched gap, zero extra
    shuffles.  Pass a number for numeric time columns or an SQL interval
    string (e.g. ``"INTERVAL 15 minutes"``) for timestamps.

    DataFrame-native formulation (no custom operator): tag both sides, union
    by a common schema, and carry the most recent right ROW forward — one
    ``last(ignorenulls)`` of a (timestamp, values) struct per key ordered by
    time, so tolerance and emitted values decide off the SAME row even when
    that row has NULL value columns (merge_asof parity).  ONE shuffle
    (window partition by key) — strictly better than the join+row_number
    formulation which shuffles twice, and it never materializes the
    all-pairs-per-key blowup.

    Ordering within equal timestamps: right rows sort before left rows, so a
    right row at exactly ``left_ts`` IS matched (inclusive as-of).  Duplicate
    right rows at the same (on, right_ts) resolve deterministically to the
    one with the greatest (struct of right_cols) — enforced by a third
    window-ordering key, no extra shuffle.  Right value columns must not
    collide with left column names (raises; alias before joining).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    rcols = right_cols or [c for c in right.columns if c not in on + [right_ts]]
    clash = sorted(set(rcols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right columns {clash} collide with left columns — alias them "
            f"before the as-of join or pass right_cols explicitly"
        )

    from pyspark.sql.types import StructField, StructType

    tie_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in rcols]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left.columns],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_tie"),
    )
    both = l_tag.unionByName(r_tag)

    # _tie orders duplicate right rows at the same (_t) so ``last`` picks the
    # max struct deterministically; left rows carry a NULL tie (irrelevant —
    # each left row only reads the frame, never feeds _r_* values).
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").desc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    # The matched right row is carried as ONE struct (its timestamp + its
    # value columns together), so the tolerance decision and the emitted
    # values always come from the SAME right row.  (A per-column
    # ``last(ignorenulls)`` carry would, on a matched row with a NULL in
    # some column, back-fill that column from an OLDER right row — which
    # may itself be outside tolerance, diverging from merge_asof.)
    def _carry(w):
        return F.last(
            F.when(
                F.col("_side") == 0,
                F.struct(F.col("_t").alias("_mt"), F.col("_tie").alias("_v")),
            ),
            ignorenulls=True,
        ).over(w)

    if direction == "backward":
        match = _carry(wb)
    elif direction == "forward":
        match = _carry(wf)
    else:
        # nearest (r10): both carries share ONE hash exchange on the equi
        # keys (same partitioning, two sorts); the closer candidate wins,
        # equidistant ties to the BACKWARD row (merge_asof's rule,
        # property-pinned vs pandas).  An exact match is the same row in
        # both carries, so the choice is vacuous there.
        mb, mf = _carry(wb), _carry(wf)
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when((mf["_mt"] - F.col("_t")) < (F.col("_t") - mb["_mt"]), mf)
            .otherwise(mb)
        )
    carried = both.select(
        *[F.col(c) for c in left.columns],
        F.col("_t"),
        "_side",
        match.alias("_match"),
    )
    match_t = F.col("_match._mt")
    if tolerance is None:
        in_tol = F.lit(True)
    else:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        if direction == "backward":
            gap = F.col("_t") - match_t
        elif direction == "forward":
            gap = match_t - F.col("_t")
        else:
            gap = F.greatest(F.col("_t") - match_t, match_t - F.col("_t"))
        in_tol = match_t.isNotNull() & (gap <= tol)
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(in_tol, F.col("_match")["_v"][c]).alias(c)
            for c in rcols
        ],
    )


def salted_equi_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    residual: Column | None = None,
) -> DataFrame:
    """Skew-mitigated equi join for a hot-keyed large side against a
    non-broadcastable small side (the traffic case: hot plates in the toll
    join, SURVEY.md §7 "what's hard" (d)).

    The large side gets a deterministic salt in ``[0, n_salts)`` (xxhash64 of
    its row, so re-runs shuffle identically); the small side is replicated
    ``n_salts`` times, one copy per salt.  Joining on ``on + [_salt]`` splits
    each hot key's rows across ``n_salts`` reducers instead of one straggler.
    Result is row-identical to ``large.join(small, on, how)``.

    ``residual`` (inner only) is an extra non-equi condition evaluated after
    the salted equi match — e.g. the J2 interval band
    ``(F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi"))`` — built
    from post-join column NAMES, which must therefore be unambiguous (each
    referenced column exists on exactly one side).  This is the salted form
    of the reference's hot-plate toll join: equi on plate spreads the hot
    key, the band stays a cheap residual filter.

    AQE's skew-join handles most cases at runtime; explicit salting remains
    the tool when a single key exceeds what one task can hold even after AQE
    splitting, or when the join feeds a same-keyed aggregation that must not
    re-coalesce the hot key.  Supported ``how``: inner / left (shapes where
    per-row multiplicity survives salting unchanged).  Fuzz-pinned
    row-identical to the plain join for any salt count under forced skew
    (tests/test_oracle_fuzz.py).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if residual is not None and how != "inner":
        raise ValueError("residual requires how='inner' (a post-join filter "
                         "would drop unmatched left rows under 'left')")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    big = large.withColumn("_salt", salt.cast("int"))
    rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big.join(rep, on + ["_salt"], how)
    if residual is not None:
        out = out.filter(residual)
    return out.drop("_salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """INTERVAL × INTERVAL overlap join at scale: pairs where
    ``[left_lo, left_hi]`` and ``[right_lo, right_hi]`` overlap
    (``a.lo <= b.hi AND b.lo <= a.hi``, closed ends), optionally under equi
    keys.  The third member of the range-join family: ``interval_join`` is
    point-in-interval with keys, ``bucketed_interval_join`` is keyless
    point-in-interval — this one is range-against-range, the shape of
    session-vs-session, downtime-vs-shift, possession-vs-possession
    overlap questions.

    Both sides explode into the fixed-width buckets they cover, equi join
    on the bucket, exact overlap as residual.  An overlapping pair shares
    EVERY bucket covered by their intersection — so each pair CLAIMS
    exactly one bucket (the one containing ``greatest(a.lo, b.lo)``, i.e.
    the first bucket of the intersection) and candidates in other shared
    buckets are discarded by a one-expression filter: exactly-once output
    with no distinct/dedup exchange.  One shuffle on the bucket key;
    fan-out per row = interval_len / bucket_width (pick width ~ median
    interval length).  The exactly-once claim is fuzz-pinned against the
    literal overlap predicate for any width (tests/test_oracle_fuzz.py).
    """
    lw = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(left_lo) / bucket_width).cast("bigint"),
                (F.col(left_hi) / bucket_width).cast("bigint"),
            )
        ),
    )
    rw = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("bigint"),
                (F.col(right_hi) / bucket_width).cast("bigint"),
            )
        ),
    )
    overlap = (lw[left_lo] <= rw[right_hi]) & (rw[right_lo] <= lw[left_hi])
    claim = (
        F.greatest(lw[left_lo], rw[right_lo]) / bucket_width
    ).cast("bigint") == lw["_bucket"]
    cond = (lw["_bucket"] == rw["_bucket"]) & overlap & claim
    for k in on or []:
        cond = cond & (lw[k] == rw[k])
    return lw.join(rw, cond, "inner").drop(lw["_bucket"]).drop(rw["_bucket"])


def blocked_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_left,
    block_right,
    max_distance: int,
) -> DataFrame:
    """Fuzzy string equi-ish join: pairs whose edit distance is within
    ``max_distance``, found via BLOCKING — the entity-resolution pattern
    (same family as the dedup module's LSH banding, for short keys instead
    of documents).

    ``block_left`` / ``block_right`` are Column expressions over the
    respective sides (e.g. a token, a prefix, a phonetic code); only pairs
    sharing a block value are compared, turning the O(n·m) all-pairs
    Levenshtein into one hash join on the block key plus a residual edit
    distance on candidates.  Block recall is the caller's contract: a pair
    in no common block is never found (use multiple passes with different
    blocking keys and union for higher recall — each pass stays an equi
    join).

    Rows with NULL in the join or block column never match (SQL join
    semantics).  Output: both sides' columns plus ``edit_distance``.
    """
    lb = left.withColumn("_block", block_left)
    rb = right.withColumn("_block", block_right)
    d = F.levenshtein(lb[left_col], rb[right_col])
    return (
        lb.join(rb, "_block")
        .withColumn("edit_distance", d)
        .filter(F.col("edit_distance") <= max_distance)
        .drop("_block")
    )


#: Bitmap ceiling: 1<<27 bits = 16 MB of longs.  The bitmap ships as a
#: one-row broadcast (see _bloom_tagged); past this size the broadcast and
#: per-executor resident copies stop being "free" — use a plain join.
_BLOOM_MAX_BITS = 1 << 27


def bloom_bitmap(keys: DataFrame, key: str, n_bits: int = 1 << 20,
                 n_hashes: int = 3) -> list[int]:
    """Aggregate a key set into an ``n_bits``-wide Bloom bitmap, returned as
    ``n_bits/64`` int64 words.

    One distributed pass: each key explodes into its ``n_hashes`` bit
    positions (``pmod(xxhash64(key, seed), n_bits)``), positions group by
    64-bit word index, and ``bit_or`` folds the masks — so the collect is
    bounded by ``n_bits/64`` rows BY CONSTRUCTION (131 072 bytes at the
    default 2^20 bits), never by the key count.  Same collect-then-broadcast
    contract as the PQ codebooks (operators/similarity.py).

    Spark's own runtime bloom filtering
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects this
    pattern automatically into some shuffle joins; the explicit operator is
    for when the filter must be deterministic, reused across several
    consumers, or applied where the optimizer won't put it (ahead of an
    aggregate, a stream, or an ANTI join's bypass — see
    ``bloom_anti_join``).
    """
    if n_bits % 64 or not 64 <= n_bits <= _BLOOM_MAX_BITS:
        raise ValueError(
            f"n_bits must be a multiple of 64 in [64, {_BLOOM_MAX_BITS}], "
            f"got {n_bits}"
        )
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(n_bits))
            for s in range(n_hashes)
        ]
    )
    rows = (
        keys.select(F.explode(pos).alias("_pos"))
        .select(
            F.expr("CAST(_pos div 64 AS INT)").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_mask"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["_w"]] = r["_mask"]
    return words


def _bloom_probe(df: DataFrame, key: str, words: list[int], n_hashes: int):
    """Build the probe predicate Column for ``df[key]`` against the bitmap.

    The bitmap reaches the executors as a SCALAR SUBQUERY over a one-row
    temp view, not an array literal: ``F.lit([...])`` builds a CreateArray
    of n_bits/64 literal nodes and the analyzer re-walks that tree per rule
    — measured ~7 s of pure planning at the 2^20-bit default — while a
    cross-joined broadcast row licenses Catalyst to reorder the exact join
    BELOW the probe filter (the probe then runs after the shuffle it was
    meant to shrink).  The scalar subquery executes once as a millisecond
    local job, its value is inlined into the predicate at runtime, the
    expression tree stays constant-size, and the filter keeps sitting
    directly on the scan branch (plan-pinned).  The one-row view is
    session-scoped and uuid-named (O(128 KB) each; negligible)."""
    import uuid

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    n_bits = 64 * len(words)
    spark = df.sparkSession
    view = f"_bf_bitmap_{uuid.uuid4().hex[:12]}"
    spark.createDataFrame(
        [(words,)],
        StructType([StructField("w", ArrayType(LongType(), False), False)]),
    ).createOrReplaceTempView(view)
    arr = f"(SELECT w FROM {view})"

    def _test(s: int) -> str:
        # seed literal is a plain INT on both build (F.lit(s)) and probe
        # side, so xxhash64 sees identical argument types
        pos = f"pmod(xxhash64(`{key}`, {s}), {n_bits})"
        return (
            f"(element_at({arr}, CAST({pos} div 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
        )

    return F.expr(" AND ".join(_test(s) for s in range(n_hashes)))


def bloom_prefilter(df: DataFrame, key: str, words: list[int],
                    n_hashes: int = 3) -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the bitmap (same hash family
    as ``bloom_bitmap`` — no false negatives; false-positive rate ~
    ``(1 - e^(-kn/m))^k``).  All probing is JVM-side integer arithmetic
    against the subquery-inlined bitmap; the test evaluates on the scan
    side, before any shuffle exchange (plan-pinned)."""
    return df.filter(_bloom_probe(df, key, words, n_hashes))


def bloom_semi_join(
    large: DataFrame,
    keys: DataFrame,
    key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    words: list[int] | None = None,
) -> DataFrame:
    """EXACT semi join (``large`` rows whose ``key`` appears in ``keys``)
    with a Bloom-bitmap prefilter ahead of the shuffle.

    The bitmap build touches only the small side; the probe drops most
    non-matching large-side rows at the scan, so the exchange feeding the
    exact ``left_semi`` join moves ~selectivity × |large| rows instead of
    all of them — the point of runtime row-level filtering at 100 TB, where
    the semi join's shuffle dominates.  False positives survive the
    prefilter and are removed by the exact join; the result is
    row-identical to ``large.join(keys, key, "left_semi")``.

    ``words``: a prebuilt :func:`bloom_bitmap` — the repeated-query
    arrangement (build the bitmap once per key-set version, probe
    forever), which removes the two-job build constant from every call;
    the bitmap MUST have been built over this ``keys`` set or a superset
    (a stale subset loses the no-false-negative guarantee).  Exactness is
    fuzz-pinned for any bitmap geometry (tests/test_oracle_fuzz.py).
    """
    kdf = keys.select(key).distinct()
    if words is None:
        words = bloom_bitmap(kdf, key, n_bits, n_hashes)
    return bloom_prefilter(large, key, words, n_hashes).join(
        kdf, key, "left_semi"
    )


def bloom_anti_join(
    large: DataFrame,
    keys: DataFrame,
    key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    words: list[int] | None = None,
) -> DataFrame:
    """EXACT anti join (``large`` rows whose ``key`` does NOT appear in
    ``keys``) where bloom-definite non-members BYPASS the join entirely.

    A bloom miss proves non-membership, so those rows go straight to the
    output with zero shuffle; only the might-contain candidates (true
    members + false positives) flow through the exact ``left_anti`` join.
    With a selective key set almost the whole large side takes the bypass
    lane — the blocklist/decontamination shape (operators/decontam.py)
    where at 100 TB the anti join's exchange is the bottleneck.  NULL keys
    take the candidate lane (xxhash64 still hashes them) and survive the
    anti join, matching ``left_anti`` NULL semantics.  Result is
    row-identical to ``large.join(keys, key, "left_anti")``.  ``words``:
    prebuilt bitmap, same contract as :func:`bloom_semi_join` — and the
    same superset requirement: a bitmap MISSING a current key would route
    its rows around the anti join and wrongly keep them.  Exactness
    (including the NULL lane) is fuzz-pinned for any bitmap geometry
    (tests/test_oracle_fuzz.py).
    """
    kdf = keys.select(key).distinct()
    if words is None:
        words = bloom_bitmap(kdf, key, n_bits, n_hashes)
    maybe = _bloom_probe(large, key, words, n_hashes)
    definite_out = large.filter(~maybe)
    candidates = large.filter(maybe)
    return definite_out.unionByName(candidates.join(kdf, key, "left_anti"))


def union_of_joins_on_either_key(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_keys: tuple[str, str],
    residual: Column | None = None,
) -> DataFrame:
    """The "fixed" form of the reference's abandoned OR-key join (J3,
    src/OverSpeedCount.scala:122): ``l.k = r.a OR l.k = r.b`` planned as two
    hash joins + distinct union instead of the nested loop Spark would pick
    for a disjunctive condition.  The dedup removes rows matching both keys.
    Fuzz-pinned against the literal OR predicate, NULL first keys included
    (tests/test_oracle_fuzz.py).
    """
    k1, k2 = right_keys
    c1 = left[left_key] == right[k1]
    c2 = left[left_key] == right[k2]
    if residual is not None:
        c1, c2 = c1 & residual, c2 & residual
    j1 = left.join(right, c1, "inner")
    # ``& ~coalesce(c1, false)`` keeps OR semantics exact: rows matching both
    # keys appear once, and a NULL first key (c1 = NULL, where ~NULL = NULL
    # would silently drop the row) still lets a second-key match through.
    j2 = left.join(right, c2 & ~F.coalesce(c1, F.lit(False)), "inner")
    return j1.unionByName(j2)
