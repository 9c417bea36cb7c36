"""Declarative data-quality validation in ONE scan.

The reference's only quality control is row-level drop rules at parse time
(arity filters, lenient casts — src/OverSpeedCount.scala:29-31); a corpus
pipeline also needs TABLE-level expectations: null fractions, value ranges,
key uniqueness, set membership.  The scale rule here is that every check is
an AGGREGATE over the same single pass — one job, one shuffle-free scan
(plus one tiny exchange for the final one-row reduce) no matter how many
checks — never one job per check (the naive expectations-runner shape that
re-reads a 100 TB table N times).

Checks are (name, aggregate-expression) pairs; ``report`` pivots them into
one row per check with observed value and pass/fail, so the result is both
machine-gateable and human-readable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P


def not_null(col: str) -> Column:
    """Observed value: number of NULL rows (expect 0)."""
    return F.count_if(~row_not_null(col)).cast("bigint")


def in_range(col: str, lo, hi) -> Column:
    """Observed value: number of rows outside [lo, hi] (expect 0)."""
    return F.count_if(~row_in_range(col, lo, hi)).cast("bigint")


def unique_key(col: str) -> Column:
    """Observed value: row count minus distinct count (expect 0).

    The one check that is not algebraic per-row; count_distinct still
    map-side partials, so it shares the single pass."""
    return (F.count(col) - F.count_distinct(F.col(col))).cast("bigint")


def member_of(col: str, allowed: list) -> Column:
    """Observed value: rows with a non-NULL value outside ``allowed``."""
    return F.count_if(~row_member_of(col, allowed)).cast("bigint")


def row_not_null(col: str) -> Column:
    """Row-level predicate: value present (for :func:`enforce`)."""
    return F.col(col).isNotNull()


def row_in_range(col: str, lo, hi) -> Column:
    """Row-level predicate: NULL or within [lo, hi] (NULL presence is
    :func:`row_not_null`'s job — compose both to require a value in
    range)."""
    return F.col(col).isNull() | F.col(col).between(F.lit(lo), F.lit(hi))


def row_matches(col: str, pattern: str) -> Column:
    """Row-level predicate: NULL or the WHOLE value matches the regex —
    the pattern is anchored (``^(?:...)$``) because a constraint named
    "matches" must not pass values that merely CONTAIN a matching
    substring (bare ``rlike`` is a substring search)."""
    return F.col(col).isNull() | F.col(col).rlike(f"^(?:{pattern})$")


def row_member_of(col: str, allowed: list) -> Column:
    """Row-level predicate: NULL or a member of ``allowed``."""
    return F.col(col).isNull() | F.col(col).isin(allowed)


def enforce(df: DataFrame, row_checks: dict[str, Column]) -> DataFrame:
    """Inline row-level constraint ENFORCEMENT — the write-path guard:
    :func:`report`/:func:`observed` measure violations, ``enforce``
    guarantees that NO VIOLATING ROW CAN FLOW PAST IT into the output — a
    violating row that reaches the enforce point fails the job with the
    check's name.  (A violating row that some OTHER filter in the final
    plan discards may be dropped before the check evaluates, depending on
    predicate order after Catalyst merges and pushes filters — either way
    it cannot reach the published table, which is the guarantee that
    matters; do not use job success/failure as a "was the source clean"
    probe, that is :func:`report`'s job.)

    Each check rides as a FILTER whose predicate passes conforming rows
    and raises otherwise — filters determine row membership, so Catalyst
    can never prune the check away no matter what downstream projections
    keep (unlike a guard attached to one output column).  Cost: row-local
    predicate per check inside the scan's codegen stage; zero extra
    passes, zero shuffles.  Row-local constraints only (not-null / range
    / regex / membership via the ``row_*`` builders); table-level checks
    (uniqueness, referential) stay in :func:`report` /
    :func:`referential_report` where they aggregate."""
    if not row_checks:
        raise ValueError(
            "enforce() needs at least one check — an empty dict would be "
            "a silent no-op guard"
        )
    out = df
    for name, pred in row_checks.items():
        out = out.filter(
            F.when(pred, F.lit(True)).otherwise(
                F.raise_error(
                    F.lit(f"constraint {name!r} violated on a row")
                )
            )
        )
    return out


def report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run every check in one aggregate pass -> (check, violations, ok).

    All observed values count VIOLATIONS, so ``ok`` is uniformly
    ``violations == 0``; the stack of per-check rows comes from an inline
    table over the one aggregated row (no second scan)."""
    agg = df.agg(*[c.alias(n) for n, c in checks.items()])
    rows = F.array(
        *[
            F.struct(F.lit(n).alias("check"), F.col(n).alias("violations"))
            for n in checks
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select(
            F.col("r.check").alias("check"),
            F.col("r.violations").alias("violations"),
            (F.col("r.violations") == 0).alias("ok"),
        )
    )


def observed(df: DataFrame, checks: dict[str, Column], name: str = "quality"):
    """Attach the checks as an OBSERVATION on ``df``: metrics are computed
    by whatever action the caller runs anyway (a write, a count) — ZERO
    extra passes, where even :func:`report` costs one dedicated scan.

    This is the production arrangement: the corpus write IS the validation
    job, and the gate reads the observation afterwards.  Returns
    (observed_df, observation); call ``observation.get`` AFTER an action on
    the returned frame.

    Constraint inherited from Spark: observed metrics must be aggregate
    expressions without count_distinct — so ``unique_key`` checks stay in
    :func:`report`; everything row-conditional works here."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in checks.items()]), obs


def referential_report(
    child: DataFrame, parent: DataFrame, key: str, parent_key: str,
    check_name: str = "referential",
) -> DataFrame:
    """(check, violations, ok) for child keys missing from parent — one
    anti join + count, the FK check at table scale (child shuffles on the
    key once; a small parent side broadcasts under AQE)."""
    n = (
        child.join(
            parent.select(F.col(parent_key).alias(key)).distinct(),
            key,
            "left_anti",
        )
        .count()
    )
    import pyspark.sql as _sql

    spark = _sql.SparkSession.getActiveSession()
    return spark.createDataFrame(
        [(check_name, n, n == 0)], "check string, violations bigint, ok boolean"
    )


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-profile report: one row per profiled column with
    (column_name, n_rows, n_nulls, n_distinct) — the data-profiling pass a
    pipeline runs on an unfamiliar ingest before writing expectations
    against it.

    ONE aggregate over one scan computes every column's counts, then a
    ``stack`` unpivots the single wide row into the per-column report
    (kilobytes — no second pass, no per-column job).  Exact
    ``count_distinct`` keeps the result oracle-hashable; Spark plans one
    Expand branch per distinct column, so at 100 TB swap in
    ``approx_count_distinct`` (one pass, mergeable HLL partials — same
    sketch fabric as operators/sketches.py) once profile numbers feed
    dashboards instead of hash gates.

    The unpivot is built with the Column API (explode over an array of
    structs), never by interpolating raw column names into SQL text — names
    with dots, spaces, hyphens, or quotes profile fine.  Internal partial
    aliases are index-based for the same reason."""
    if not cols:
        raise ValueError("profile() needs at least one column to profile")
    def _quoted(name: str):
        # backtick-quote so '.' is not parsed as struct access and
        # embedded backticks are escaped by doubling
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(_quoted(c)).alias(f"_nn_{i}"))
        aggs.append(F.count_distinct(_quoted(c)).alias(f"_nd_{i}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                (F.col("_n") - F.col(f"_nn_{i}")).alias("n_nulls"),
                F.col(f"_nd_{i}").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        wide.select(F.col("_n").alias("n_rows"), F.explode(per_col).alias("p"))
        .select("p.column_name", "n_rows", "p.n_nulls", "p.n_distinct")
    )


def impute_group_median(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    cents: int = 100,
    filled_col: str | None = None,
) -> DataFrame:
    """Missing-value REPAIR: fill NULL ``value_col`` rows with their
    group's EXACT median of the observed values — the robust imputation a
    curation pipeline runs before features hit a trainer (mean imputation
    follows outliers; the median does not).

    Every row is returned (repair must not drop data) with two added
    columns: ``<filled_col>`` (default ``<value_col>_filled``) and
    ``was_null`` (0/1 bigint audit flag — downstream must be able to
    distinguish measured values from imputed ones).

    Determinism (the a_exact_percentiles contract): medians are computed
    on the integer-cent lattice (``round(value*cents)``), where both
    engines interpolate between exact integers with one IEEE op — a
    median over raw doubles would compare two engines' float arithmetic.
    The fill value is ``median_cents / cents`` (one division).

    Plan: one filtered grouped ``percentile`` (values co-locate per group
    — the exact-percentile spill posture; the KLL sketch is the
    bounded-memory alternative at extreme group sizes) broadcast back
    onto the full table: the table itself never shuffles.

    A group with NO observed values has no median to offer: its rows keep
    NULL in the filled column (was_null = 1) rather than silently
    borrowing another group's statistic — route such groups to a global
    fallback explicitly if the pipeline wants one."""
    if not group_cols:
        raise ValueError("impute_group_median needs at least one group col")
    out = filled_col or f"{value_col}_filled"
    c = F.round(F.col(value_col) * cents).cast("bigint")
    meds = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(F.percentile(c, F.lit(0.5)).alias("_med_c"))
    )
    return (
        df.join(F.broadcast(meds), group_cols, "left")
        .withColumn(
            out,
            F.coalesce(
                F.col(value_col),
                F.col("_med_c") / F.lit(float(cents)),
            ),
        )
        .withColumn(
            "was_null", F.col(value_col).isNull().cast("bigint")
        )
        .drop("_med_c")
    )


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_bins: int = 20,
    bin_width: float = 10.0,
    lo: float = 0.0,
    group_col: str | None = None,
) -> DataFrame:
    """Distribution DRIFT between two corpus snapshots — the ingestion
    monitor every continuously-fed pipeline needs: bin ``value_col`` with
    the fixed-width integer recipe (the a_histogram binning: clamped
    ``floor((value - lo) / bin_width)``), count per bin on both sides,
    and report the per-bin chi-square contribution of the NEW snapshot
    against the expectation the OLD distribution predicts:

        e_i    = n_new_total * n_old_i / n_old_total
        term_i = (n_new_i - e_i)^2 / e_i

    Chi-square, deliberately not PSI: PSI's per-bin ``ln(p/q)`` is
    platform math (the lm.logprob / NDCG policy line), while the
    chi-square term is exact integer counts entering a fixed IEEE
    multiply/divide sequence — oracle-hashable per bin.  Per the module's
    determinism policy the corpus-level statistic is NOT summed here:
    per-bin rows hash-compare exactly and the consumer folds them at its
    own precision (k-1 degrees of freedom, critical values from any
    table).

    A bin with ``n_old = 0`` but ``n_new > 0`` is NEW-ONLY mass: its
    expectation is 0 and the term is reported NULL via try_divide — the
    strongest categorical drift signal there is, surfaced rather than
    folded into a divide-by-zero.  Bins empty on BOTH sides are omitted
    (the full-outer join never sees them).

    ``group_col`` scopes the comparison per group (e.g. per event_type)
    — totals and expectations are per-group, and every group join is
    NULL-SAFE (``eqNullSafe``): rows with a NULL group form their own
    monitored group instead of splitting into phantom one-sided rows
    with NULL expectations (the temperature_sample NULL-group contract,
    review r8).  Shape: two histogram aggregates (map-side combined,
    <= groups x n_bins rows each, each lazily localCheckpointed so each
    corpus is scanned ONCE even though its histogram feeds both the bin
    join and the totals branch), one bin-keyed full-outer join,
    broadcast per-group totals — nothing data-sized shuffles twice."""
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    grouped = group_col is not None

    def hist(df, cname):
        # NULL values are excluded, not binned: Spark's greatest/least skip
        # NULLs, so floor(NULL) would silently collapse to the lower clamp
        # and mix NULL mass into bucket 0, skewing its chi-square term
        # (ADVICE r8).  A NULL-rate monitor is quality_profile's job; this
        # operator compares the distributions of PRESENT values.
        df = df.filter(F.col(value_col).isNotNull())
        bucket = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(bin_width)).cast(
                    "bigint"
                ),
            ),
        ).cast("bigint")
        gkeys = [group_col] if grouped else []
        # the histogram feeds TWO consumers (bin join + totals); the lazy
        # checkpoint pins it to ONE corpus scan (the recsys pattern)
        return (
            df.groupBy(*gkeys, bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("bigint").alias(cname))
            .localCheckpoint(eager=False)
        )

    ho = hist(old, "n_old").alias("o")
    hn = hist(new, "n_new").alias("n")
    if grouped:
        cond = F.col(f"o.{group_col}").eqNullSafe(
            F.col(f"n.{group_col}")
        ) & (F.col("o.bucket") == F.col("n.bucket"))
    else:
        cond = F.col("o.bucket") == F.col("n.bucket")
    sel = (
        [
            F.coalesce(
                F.col(f"o.{group_col}"), F.col(f"n.{group_col}")
            ).alias(group_col)
        ]
        if grouped
        else []
    )
    joined = ho.join(hn, cond, "full_outer").select(
        *sel,
        F.coalesce(F.col("o.bucket"), F.col("n.bucket")).alias("bucket"),
        F.coalesce(F.col("n_old"), F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
    )
    keys = ([group_col] if grouped else []) + ["bucket"]
    if grouped:
        tot_o = ho.groupBy(group_col).agg(F.sum("n_old").alias("_to"))
        tot_n = (
            hn.groupBy(group_col)
            .agg(F.sum("n_new").alias("_tn"))
            .withColumnRenamed(group_col, "_tn_group")
        )
        tot_o = tot_o.withColumnRenamed(group_col, "_to_group")
        joined = joined.join(
            F.broadcast(tot_o),
            F.col(group_col).eqNullSafe(F.col("_to_group")),
            "left",
        ).join(
            F.broadcast(tot_n),
            F.col(group_col).eqNullSafe(F.col("_tn_group")),
            "left",
        )
    else:
        tot_o = ho.agg(F.sum("n_old").alias("_to"))
        tot_n = hn.agg(F.sum("n_new").alias("_tn"))
        joined = joined.crossJoin(F.broadcast(tot_o)).crossJoin(
            F.broadcast(tot_n)
        )
    e = (
        F.coalesce(F.col("_tn"), F.lit(0)).cast("double")
        * F.col("n_old").cast("double")
        / F.col("_to").cast("double")
    )
    term = F.try_divide(
        (F.col("n_new").cast("double") - e) * (F.col("n_new").cast("double") - e),
        e,
    )
    return joined.select(
        *keys,
        "n_old",
        "n_new",
        e.alias("expected"),
        term.alias("chi2_term"),
    )


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, the published
    heuristic set most pretraining pipelines start from), evaluated as
    per-document BOOLEAN FLAGS plus the conjunction — report-style, so a
    curation run can measure each rule's kill rate before committing to
    the filter (the enforce-vs-gate split this module already draws).

    Every rule is INTEGER counts against a RATIONAL threshold,
    cross-multiplied so no float enters any comparison (the
    sample_temperature / token-cosine discipline):

    - ``ok_word_count``:   min_words <= n_words <= max_words
    - ``ok_mean_word_len``: 3 <= word_chars/n_words <= 10, as
      ``3·n_words <= word_chars AND word_chars <= 10·n_words``
    - ``ok_symbol_ratio``: (#hashes + #ellipses) / n_words <= 0.1, as
      ``10·(n_hash + n_ellipsis) <= n_words``
    - ``ok_alpha_words``:  words containing a letter >= 80%, as
      ``5·n_alpha >= 4·n_words``
    - ``ok_stopwords``:    >= 2 English stopword hits (the 'actually
      natural language' smell test)
    - ``passes`` = AND of the five.

    Row-local column expressions end to end (token split, two
    replace-based occurrence counts, two higher-order ``filter`` lambdas
    — all whole-stage-codegen'd, zero shuffles, zero Python), so the
    battery runs at scan speed on any corpus size.  Empty/whitespace
    docs: n_words = 0 fails the word-count floor; the mean-length rule
    is vacuously true at 0 words (flags are independent by design)."""
    from trafficbigdatasearch_spark.functions import text as T

    t = F.trim(F.col(text_col))
    toks = T.tokens(F.col(text_col))
    n_words = F.size(toks).cast("bigint")
    word_chars = F.length(F.regexp_replace(t, r"\s", "")).cast("bigint")
    n_hash = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ).cast("bigint")
    n_ellipsis = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    ).cast("bigint")
    stops = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(stops, F.lower(x)))
    ).cast("bigint")
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (F.lit(3) * n_words <= word_chars) & (
        word_chars <= F.lit(10) * n_words
    )
    ok_sym = F.lit(10) * (n_hash + n_ellipsis) <= n_words
    ok_alpha = F.lit(5) * n_alpha >= F.lit(4) * n_words
    ok_stop = n_stop >= 2
    # conditional spread: the rule battery is row-local regex/filter
    # CPU fused into the scan; a low-split local source runs it on one
    # core (identity at scale — partitioning.py)
    docs = P.ensure_compute_width(docs, id_col)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("passes"),
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Partition-key SKEW diagnostic — the one-row report you run on a
    candidate shuffle key BEFORE committing a 100 TB join/aggregate to it
    (the measurement behind this repo's salting / AQE-skew decisions):

      n_keys, n_rows, max_size, p{50,90,99}_size (exact group-size
      percentiles), and ``max_share_ppm`` — the heaviest key's share of all
      rows in parts-per-million (exact integer: ``1e6 * max_size // n_rows``,
      no float anywhere).

    Percentile definition (exact, engine-portable): the smallest group size
    s where the number of keys with size <= s reaches ceil(pct * n_keys /
    100) — integer threshold arithmetic ``(pct * n_keys + 99) div 100``, no
    interpolation, no float rank.

    Scale shape: ONE shuffle (the per-key count — map-side combined, so each
    executor ships one row per key it saw), then the size HISTOGRAM
    (groupBy size — at most |distinct sizes| rows, thousands even for a
    billion keys) folds through one tiny window + one-row reduce.  The
    profile never sorts rows, never collects keys, and is O(|keys|) shuffle
    bytes — safe to run on every candidate key of a 100 TB table.
    """
    from pyspark.sql import Window

    sizes = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    # sizes feeds BOTH the histogram and the totals — checkpoint the per-key
    # counts once so the corpus aggregate runs once, not per consumer
    sizes = sizes.localCheckpoint(eager=False)
    hist = sizes.groupBy("sz").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy("sz").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "sz", F.sum("n").over(w).cast("bigint").alias("cum")
    )
    tot = sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.max("sz").cast("bigint").alias("max_size"),
    )
    cur = cum.crossJoin(F.broadcast(tot))
    pct_aggs = [
        F.min(
            F.when(
                F.col("cum") * 100 >= (F.lit(p) * F.col("n_keys") + 99)
                - (F.lit(p) * F.col("n_keys") + 99) % 100,
                F.col("sz"),
            )
        )
        .cast("bigint")
        .alias(f"p{p}_size")
        for p in pcts
    ]
    return cur.groupBy("n_keys", "n_rows", "max_size").agg(*pct_aggs).select(
        "n_keys",
        "n_rows",
        "max_size",
        *[f"p{p}_size" for p in pcts],
        F.expr("1000000 * max_size div n_rows").cast("bigint").alias(
            "max_share_ppm"
        ),
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
) -> DataFrame:
    """PROFILE DRIFT between two snapshots — the schema-health monitor
    beside histogram_drift's value-distribution comparison: per column,
    both snapshots' null/distinct counts plus the NULL-RATE delta as
    cross-multiplied exact integers,

        delta_num = n_nulls_new * n_rows_old - n_nulls_old * n_rows_new
        delta_den = n_rows_new * n_rows_old

    with ONE closing IEEE division (positive = the feed got nullier — the
    classic silently-broken-upstream-join smell).  Distinct-count drift
    ships as the raw integers (a ratio of distincts is not meaningful
    across differently-sized snapshots; the consumer knows its
    cardinality contract).

    Scale shape: each snapshot is ONE aggregate over one scan (the
    profile() posture — never one job per column), the join is
    |cols| x |cols| rows.  DECIMAL(38,0) cross products survive 10^9-row
    snapshots; outputs cast to BIGINT.
    """
    po = profile(old, cols).select(
        "column_name",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("n_nulls_old"),
        F.col("n_distinct").alias("n_distinct_old"),
    )
    pn = profile(new, cols).select(
        "column_name",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("n_nulls_new"),
        F.col("n_distinct").alias("n_distinct_new"),
    )
    dec = "decimal(38,0)"
    num = (
        F.col("n_nulls_new").cast(dec) * F.col("n_rows_old").cast(dec)
        - F.col("n_nulls_old").cast(dec) * F.col("n_rows_new").cast(dec)
    )
    den = F.col("n_rows_new").cast(dec) * F.col("n_rows_old").cast(dec)
    return po.join(pn, "column_name").select(
        "column_name",
        "n_rows_old",
        "n_nulls_old",
        "n_distinct_old",
        "n_rows_new",
        "n_nulls_new",
        "n_distinct_new",
        num.cast("bigint").alias("null_delta_num"),
        den.cast("bigint").alias("null_delta_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "null_rate_delta"
        ),
    )


def dedup_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """EXACT-DEDUP impact report per source — the measurement you publish
    with every corpus delivery (which feeds are copy-paste heavy, how many
    tokens does dedup actually save) BEFORE running the expensive near-dup
    fabrics: per ``group_col``,

        n_docs, n_unique (distinct content fingerprints),
        surplus_docs = n_docs - n_unique,
        surplus_tokens = tokens carried by non-keeper duplicates
        (keeper = min id per fingerprint group, the dedup_exact survivor
        convention; its token count via one arg-min, so the report matches
        what the dedup job would actually delete).

    Scale shape: ONE fingerprint pass -> ONE map-side-combined aggregate
    on (group, fingerprint) -> a reaggregation of those partials to one
    row per group.  The corpus is scanned once; shuffle rows are bounded
    by distinct (group, fingerprint) pairs.
    """
    from trafficbigdatasearch_spark.functions import text as T

    base = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        T.fingerprint(F.col(text_col)).alias("_f"),
        T.token_count(F.col(text_col)).cast("bigint").alias("_t"),
    )
    per_fp = base.groupBy("grp", "_f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_t").cast("bigint").alias("sum_t"),
        F.min_by("_t", "_id").cast("bigint").alias("keeper_t"),
    )
    return per_fp.groupBy(F.col("grp").alias(group_col)).agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("surplus_docs"),
        F.sum(F.col("sum_t") - F.col("keeper_t")).cast("bigint").alias(
            "surplus_tokens"
        ),
    )


def gopher_rule_rates(flags: DataFrame) -> DataFrame:
    """Per-rule PASS RATES of a quality-flag battery — the aggregation the
    gopher_quality_flags docstring promises a curation run performs before
    committing to the filter, shipped as an operator: one row per boolean
    flag column with (rule, n_docs, n_pass, pass_ppm) — pass_ppm an exact
    integer, so the kill-rate report hash-compares.

    Works over ANY frame whose boolean columns are rule flags (every
    non-boolean column is ignored), so it composes with custom batteries,
    not just the Gopher set.  ONE aggregate pass with one conditional
    count per rule, unpivoted from the single wide row — the report()
    posture: never a job per rule.
    """
    rules = [c for c, t in flags.dtypes if t == "boolean"]
    if not rules:
        raise ValueError("gopher_rule_rates: no boolean flag columns found")
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[F.count_if(F.col(c)).cast("bigint").alias(f"_p_{c}") for c in rules],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("rule"), F.col(f"_p_{c}").alias("n_pass")
            )
            for c in rules
        ]
    )
    return agg.select(F.explode(rows).alias("r"), F.col("_n")).select(
        F.col("r.rule").alias("rule"),
        F.col("_n").alias("n_docs"),
        F.col("r.n_pass").alias("n_pass"),
        F.expr("1000000 * r.n_pass div _n").cast("bigint").alias("pass_ppm"),
    )
