"""Deterministic sampling operators for training-data pipelines.

The reference has no sampling surface; these are beyond-parity operators a
corpus pipeline needs constantly: reproducible train/validation/test splits,
per-stratum downsampling, and fixed-size per-group samples.

Every operator here derives its randomness from ``md5(salt || key)`` — a
pure expression, NO ``rand()``:

- **Reproducible across engines**: any SQL engine recomputes the identical
  split (the DuckDB oracles do exactly that), so a sample taken today can be
  re-derived from the raw corpus forever — lineage for free.
- **Reproducible across retries**: ``rand()`` draws a different value when a
  failed task is re-executed, silently changing the sample under fault
  recovery; a content hash cannot.
- **Stable under repartitioning**: membership depends only on the row's key,
  never on partition layout or row order.

At 100 TB: hash_split and stratified_sample are stateless row-local
expressions — scan speed, zero shuffles, fully pushdown-friendly.
group_sample shuffles once on the group key with a per-group top-k window;
its skew bound is the group cardinality (use it for per-source / per-lang
caps, not for a single giant group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P

#: Buckets for rate quantization: rates are exact multiples of 1/10000, so
#: oracle SQL reproduces membership with integer comparisons only.
BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from the md5 of ``salt || key``.

    First 7 md5 hex chars -> 28-bit int (same portable recipe as
    functions/text.py shingle_hash) -> mod BUCKETS.  md5 is uniform, so
    bucket occupancy is binomial with negligible deviation at any corpus
    size."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 7), 16, 10
    ).cast("bigint")
    return h % BUCKETS


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash range.

    ``fractions`` maps split name -> fraction (must sum to 1.0); ranges are
    allocated in insertion order, e.g. ``{"train": 0.9, "test": 0.1}`` gives
    train = buckets [0, 9000), test = [9000, 10000).  Adds a ``split``
    column; no rows are dropped, no shuffle happens."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    names = list(fractions)
    for name in names[:-1]:
        hi = lo + round(fractions[name] * BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def importance_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    salt: str = "importance",
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sampling: keep a row iff its
    md5-uniform draw falls under its per-row keep probability ``weight``
    (a Column in [0, 1] — e.g. a quality score mapped to a keep rate).
    The accept test is ``hash_bucket(key) < floor(weight * BUCKETS)`` —
    pure row-local expressions: no shuffle, no RNG state, and therefore
    stable under retries, repartitioning, AND re-runs with a widened
    corpus (a row's fate depends only on its key and its own weight) —
    the property quality-weighted data mixing needs when the corpus is
    rebuilt daily.  Weights outside [0, 1] are clamped."""
    w = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0))
    keep = hash_bucket(F.col(key_col), salt) < F.floor(w * BUCKETS).cast("bigint")
    return df.filter(keep)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    ``rates`` maps stratum value -> keep fraction (quantized to 1/BUCKETS);
    strata not listed keep ``default_rate``.  Row-local filter — the
    downsampling a corpus pipeline uses to rebalance sources/languages
    without a shuffle."""
    bucket = hash_bucket(F.col(key_col), salt)
    thresh = None
    for value, rate in rates.items():
        cond = F.col(strata_col) == value
        t = F.lit(round(rate * BUCKETS))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default = F.lit(round(default_rate * BUCKETS))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(bucket < thresh)


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministically downsample to the LARGEST corpus that achieves the
    target mixture ``weights`` (stratum value -> target proportion).

    The limiting stratum (the one whose availability/weight ratio is
    smallest) is kept whole; every other stratum is hash-downsampled to
    match, so the output proportions equal ``weights`` (up to 1/BUCKETS
    quantization) and no stratum is oversampled.  Strata not listed are
    dropped.

    Plan shape: one small count aggregate on the stratum key, a scalar min
    over it, and a broadcast join of the per-stratum thresholds back onto
    the corpus — the corpus itself never shuffles, and membership stays a
    pure function of ``(salt, key)`` (retry/repartition/engine stable).

    Determinism across engines: thresholds are ``floor(scale * w / cnt *
    BUCKETS)`` over IEEE doubles — the same correctly-rounded op sequence
    in any engine — then integer-compared against the md5 bucket.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    w_expr = None
    for value, wt in weights.items():
        cond = F.col(strata_col) == value
        w_expr = F.when(cond, wt) if w_expr is None else w_expr.when(cond, wt)
    counts = (
        df.filter(F.col(strata_col).isin(*weights))
        .groupBy(strata_col)
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_wt", w_expr)
    )
    scale = counts.agg(F.min(F.col("_cnt") / F.col("_wt")).alias("_scale"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        F.col(strata_col),
        F.floor(
            F.col("_scale") * F.col("_wt") / F.col("_cnt") * BUCKETS
        ).alias("_thresh"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(F.col(key_col), salt) < F.col("_thresh"))
        .drop("_thresh")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: tuple[int, int] = (1, 2),
    salt: str = "temp",
) -> DataFrame:
    """Temperature-balanced mixture downsampling — the domain/language
    REBALANCING pass of multilingual and multi-source pretraining
    pipelines (the XLM-R / mT5 exponent-smoothing recipe): with
    ``alpha = a/b`` in (0, 1], each group's kept size targets

        kept_g = n_min^(1-alpha) * n_g^alpha

    — the smallest group is kept WHOLE (rate 1, the anchor) and larger
    groups are hash-downsampled at rate (n_min/n_g)^(1-alpha), flattening
    the group-size distribution: alpha=1 keeps everything (identity),
    alpha→0 levels every group to ~n_min, alpha=1/2 is the conventional
    square-root temperature.  Unlike :func:`mixture_sample` this needs no
    target weights — the rebalance is a pure function of the observed
    sizes.

    EXACT membership, no platform ``pow``: alpha is a RATIONAL (a, b), so
    ``bucket < BUCKETS * (n_min/n_g)^((b-a)/b)`` cross-multiplies into the
    all-integer inequality

        bucket^b * n_g^(b-a)  <  BUCKETS^b * n_min^(b-a)

    evaluated in DECIMAL(38,0) (HUGEINT in the oracle) — reproducible
    bit-for-bit in any engine, where a float ``pow`` is not correctly
    rounded and a one-ULP wobble at a bucket boundary would flip
    membership.  ``b <= 3`` keeps the products inside 38 digits for group
    sizes up to ~1e9 (documented bound; widen the decimal before raising
    b).  Membership is md5-of-key (the module contract): retry-,
    repartition-, and engine-stable.

    Rows with a NULL group key form their own group (the
    embedding_near_dup NULL-block precedent): groupBy already counts
    NULL as a group, and the rates join is NULL-SAFE (``eqNullSafe``),
    so those rows get their own rate instead of setting the n_min anchor
    in the count aggregate and then silently VANISHING through a plain
    equi join — which would break both the smallest-group-kept-whole and
    the alpha=1-identity contracts (review r8).  No sentinel string is
    involved, so a group whose value happens to BE some sentinel literal
    can never merge with the NULL group, and no helper group column is
    added to the user's schema.

    Plan: one small count aggregate on the group key, a 1-row min, one
    broadcast join of (n_g, n_min) back onto the corpus, and a row-local
    integer comparison — the corpus never shuffles."""
    a, b = alpha
    if not (0 < a <= b):
        raise ValueError(f"alpha must be a rational in (0, 1], got {a}/{b}")
    if b > 3:
        raise ValueError(
            f"alpha denominator must be <= 3 (decimal-38 bound), got {b}"
        )

    def _ipow(col, p):
        if p == 0:
            return F.lit(1).cast("decimal(1,0)")
        out = col
        for _ in range(p - 1):
            out = out * col
        return out

    # the group-count table feeds TWO branches (the broadcast rates join
    # and the 1-row min); one lazy localCheckpoint pins it to a single
    # corpus scan instead of two (the recsys multi-consumer pattern) —
    # it is group-cardinality-sized, so materialization is ~free
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n_g"))
        .localCheckpoint(eager=False)
    )
    n_min = counts.agg(F.min("_n_g").alias("_n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).withColumnRenamed(
        group_col, "_rate_group"
    )
    bkt = hash_bucket(F.col(key_col), salt).cast("decimal(5,0)")
    lhs = _ipow(bkt, b) * _ipow(F.col("_n_g").cast("decimal(10,0)"), b - a)
    rhs = F.lit(BUCKETS**b).cast("decimal(13,0)") * _ipow(
        F.col("_n_min").cast("decimal(10,0)"), b - a
    )
    joined = df.join(
        F.broadcast(rates),
        F.col(group_col).eqNullSafe(F.col("_rate_group")),
    )
    return joined.filter(lhs < rhs).drop("_rate_group", "_n_g", "_n_min")


def group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    salt: str = "group",
) -> DataFrame:
    """Deterministic fixed-size sample: up to ``k`` rows per group, chosen
    by ascending ``(md5 bucket, key)`` — an order-free, engine-portable
    stand-in for reservoir sampling (same guarantee: every group capped at
    k, membership a pure function of the data).  One shuffle on the group
    key; rank ties are broken by the key itself so the selection is total.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def quota_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "quota",
) -> DataFrame:
    """EXACT-count stratified split (r10): within each group, assign every
    row to a named split so the per-group split sizes are the
    largest-remainder (Hamilton) apportionment of the group's size over
    ``fractions`` — "exactly 80/10/10 per language", not 80/10/10 in
    expectation (:func:`hash_split`'s contract, whose binomial noise is
    material for small strata and hard eval-budget guarantees).

    Mechanics: rows hash-order within their group (md5 bucket, key — the
    :func:`group_sample` total order, so membership is a pure function of
    the data); per-group quotas are ``floor(f_i · n)`` plus one bonus unit
    for the ``n - Σ floor`` splits with the largest fractional remainders
    (ties by insertion order); the first ``q_1`` ranks take split 1, the
    next ``q_2`` split 2, and so on.  Largest-remainder guarantees the
    quotas sum to n exactly, so every row is assigned.  Quota arithmetic
    is a fixed IEEE expression of the group size only, engine-reproducible.

    ONE shuffle (the per-group ranking window; the group-size count rides
    the same exchange).  Adds a ``split`` column; no rows dropped.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("quota_split needs at least 2 splits")
    wrank = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    wall = Window.partitionBy(group_col)
    n = F.count(F.lit(1)).over(wall).cast("bigint")
    floors = {nm: F.floor(F.lit(fractions[nm]) * n) for nm in names}
    rems = {nm: F.lit(fractions[nm]) * n - floors[nm] for nm in names}
    r = n - sum(floors.values())
    quotas = {}
    for i, nm in enumerate(names):
        rank_i = sum(
            (
                F.when(
                    (rems[other] > rems[nm])
                    | ((rems[other] == rems[nm]) & F.lit(j < i)),
                    1,
                ).otherwise(0)
            )
            for j, other in enumerate(names)
            if other != nm
        )
        quotas[nm] = floors[nm] + F.when(rank_i < r, 1).otherwise(0)
    rk = F.row_number().over(wrank).cast("bigint")
    expr = None
    cum = None
    for nm in names[:-1]:
        cum = quotas[nm] if cum is None else cum + quotas[nm]
        cond = rk <= cum
        expr = F.when(cond, nm) if expr is None else expr.when(cond, nm)
    expr = expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def priority_sample_grouped(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """WEIGHTED fixed-size sample PER GROUP (r10): up to ``k`` rows per
    group, drawn by the same Duffield–Lund–Thorup priorities as
    :func:`priority_sample` — the weighted completion of the sampling
    family's per-group corner ("k documents per language, preferring high
    quality scores"), generalizing :func:`group_sample` (uniform per
    group) and :func:`priority_sample` (weighted global).

    Same determinism and exclusion contract as the global draw
    (md5-uniform / weight priorities, (priority, key) total order;
    zero/NULL/NaN weights excluded up front); the plan swaps the global
    TakeOrderedAndProject for ONE window shuffle on the group key —
    per-group state is the k-row rank frame, so no group ever
    concentrates more than its own rows on a reducer.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("bigint")
    win = Window.partitionBy(group_col).orderBy(
        F.col("_priority").asc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (w > 0) & ~F.isnan(w))
        .select("*", (u.cast("double") / w).alias("_priority"))
        .withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    salt: str = "split",
) -> DataFrame:
    """Train/test split where near-duplicates NEVER straddle the boundary.

    A plain :func:`hash_split` on the document id leaks: a near-duplicate
    pair can land one side each, contaminating evaluation with effectively
    seen data.  Here the split key is the document's near-dup CLUSTER
    (connected components over any candidate-pair generator from
    operators/dedup.py), so every member of a cluster shares a hash bucket
    and therefore a split; documents in no pair form singleton clusters
    keyed by their own id.  Adds ``component`` and ``split`` columns; no
    rows are dropped.

    Cost = the CC fixpoint (operators/graph.py — materializes, a few
    driver-synced jobs) + one left join of the labels onto the corpus +
    the row-local hash expression.  At 100 TB the labels side is |paired
    docs| only — usually a small fraction of the corpus — and broadcasts.
    """
    from trafficbigdatasearch_spark.operators import graph

    cc = graph.connected_components(pairs, id_a, id_b).withColumnRenamed(
        "id", id_col
    )
    lab = df.join(cc, id_col, "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    return hash_split(lab, "component", fractions, salt=salt)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """WEIGHTED sampling without replacement by deterministic PRIORITY
    (Duffield–Lund–Thorup priority sampling, JACM '07): each row draws
    ``q_i = u_i / w_i`` with ``u_i`` the md5-uniform of its key and keeps
    the k smallest — inclusion probability ≈ proportional to weight, the
    principled scheme behind quality-weighted corpus subsampling
    ("sample 1M documents, preferring high quality scores") where a
    threshold filter would hard-cut and an independent Bernoulli
    per-row sample cannot hit an exact k.

    Determinism (the module contract): ``u_i`` is the 28-bit integer of
    the md5 of ``salt || key`` — retry-, repartition-, and
    engine-reproducible — and the priority is ONE IEEE division of that
    integer by the weight, bit-identical in any engine, ordered with a
    (priority, key) tie-break so the sample is a total function of the
    data.  Zero-weight / NULL-weight rows are EXCLUDED up front (their
    priority would be infinite/undefined; a weightless row has no
    business in a weighted sample) — documented, not silent: the row
    count of the exclusion is the caller's audit via a plain filter.

    Plan: row-local priority expression -> ``orderBy().limit(k)`` =
    TakeOrderedAndProject (per-partition heap + k-sized merge — no
    global sort, no single-partition exchange), the same at-scale shape
    as sort_topk.  Returns the sampled rows plus their ``_priority``
    (consumers deriving Horvitz–Thompson estimates need it: with
    threshold τ = the (k+1)-th priority, the weight estimator is
    max(w_i, τ·u_i) — computed downstream from the published columns)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 7
        ),
        16,
        10,
    ).cast("bigint")
    prio = (u.cast("double") / w).alias("_priority")
    # NaN weights must be excluded explicitly: Spark orders NaN GREATER
    # than any number, so ``w > 0`` ADMITS NaN — and a NaN weight yields a
    # NaN priority that silently enters the sample when fewer than k
    # finite-weight rows exist (ADVICE r9).  Same exclusion policy as
    # zero/NULL: a weightless row has no business in a weighted sample.
    return (
        df.filter(F.col(weight_col).isNotNull() & (w > 0) & ~F.isnan(w))
        .select("*", prio)
        .orderBy(F.col("_priority").asc(), F.col(key_col).asc())
        .limit(k)
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_phases: int = 10,
) -> DataFrame:
    """CURRICULUM ordering export — assign every document a deterministic
    global training position: short/easy documents first (corpus-wide
    length deciles as phases — the classic curriculum-learning schedule),
    uniformly shuffled WITHIN each phase (md5 of the id — the repo's
    deterministic-shuffle primitive, so reruns and engines agree), with a
    0-based ``position`` over the total order (phase, md5, id).

    The position is computed WITHOUT a global sort — the textbook
    running-total scale-killer (one task owns the corpus).  Same two-level
    construction as packing.pack_sequences, keyed on the curriculum order:

    1. phases come from ranks.global_quantile_buckets' exact histogram-CDF
       (zero corpus shuffle, broadcast bucket map);
    2. each doc lands in one of 256 md5-PREFIX buckets per phase — two hex
       chars, so cross-bucket lexicographic prefix order agrees with the
       full md5 order by construction;
    3. per-(phase, bucket) counts aggregate map-side; the exclusive cumsum
       runs over that n_phases x 256-row SUMMARY only;
    4. position = broadcast bucket offset + the within-bucket rank (a
       window partitioned by (phase, bucket) — ~1/256th of a phase each).

    Returns (id, n_chars, phase, position).  The single-partition work is
    the summary cumsum; every corpus-sized stage is partition-parallel —
    the export you hand a sequential trainer at 100 TB.
    """
    from trafficbigdatasearch_spark.operators import ranks

    d = docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )
    bucketed = ranks.global_quantile_buckets(
        d, "n_chars", n_buckets=n_phases, out_prefix="g_"
    )
    ranked = bucketed.select(
        "id",
        "n_chars",
        F.col("g_bucket").cast("bigint").alias("phase"),
        F.md5(F.col("id").cast("string")).alias("_mh"),
    ).withColumn("_hb", F.substring("_mh", 1, 2))
    counts = ranked.groupBy("phase", "_hb").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    # exclusive cumsum over the (n_phases x 256)-row summary ONLY
    ws = Window.orderBy("phase", "_hb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "phase", "_hb", F.coalesce(F.sum("_c").over(ws), F.lit(0)).alias("_off")
    )
    wr = Window.partitionBy("phase", "_hb").orderBy("_mh", "id")
    return (
        ranked.join(F.broadcast(offsets), ["phase", "_hb"])
        .select(
            F.col("id").alias(id_col),
            "n_chars",
            "phase",
            (F.col("_off") + F.row_number().over(wr) - 1)
            .cast("bigint")
            .alias("position"),
        )
    )


def contrastive_triplets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """CONTRASTIVE TRIPLET mining — (anchor, positive, negative) training
    examples for embedding/retrieval models, built from the corpus's own
    near-duplicate structure (the standard self-supervised curation step:
    positives are near-dups, negatives are random documents):

    - every document that has at least one exact-Jaccard >= ``threshold``
      partner becomes an ANCHOR; its POSITIVE is the highest-Jaccard
      partner (deterministic: score desc, partner id asc — both engines
      compute the identical IEEE ratio);
    - the NEGATIVE is a deterministic pseudo-random document (Knuth
      multiplicative hash of the anchor id modulo the corpus size — dense
      0..N-1 ids assumed, validated), stepping past collisions with the
      anchor/positive through a fixed 3-candidate CASE chain so reruns and
      engines agree;
    - random negatives can collide with true near-dups (the classic
      false-negative caveat of in-batch/random negative sampling);
      ``neg_is_known_dup`` flags triplets whose negative appears in the
      anchor's own pair set, so the trainer can drop or down-weight them
      instead of silently learning from a mislabeled pair.

    Returns (anchor_id, positive_id, negative_id, pos_shared, pos_union,
    neg_is_known_dup).

    Scale shape: the pair set is the inverted-index join (never
    all-pairs); positive selection is ONE window over the symmetrized
    pairs (2 rows per pair); the negative is a row-local expression plus
    one pair-restricted anti-join-shaped flag lookup.  No corpus-sized
    sort, nothing collected — the export runs beside the dedup job.
    """
    from trafficbigdatasearch_spark.operators import dedup as D

    n_docs = docs.select(id_col).distinct().count()
    if n_docs < 3:
        raise ValueError(f"need >= 3 documents for triplets, got {n_docs}")
    pairs = D.ngram_jaccard_pairs(
        docs, id_col, text_col, n=n, threshold=threshold,
        max_shingle_freq=max_shingle_freq,
    )
    pairs = pairs.localCheckpoint(eager=False)
    sym = pairs.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("cand_id"),
        "shared",
        (F.col("size_a") + F.col("size_b") - F.col("shared"))
        .cast("bigint")
        .alias("pos_union"),
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor_id"),
            F.col("id_a").alias("cand_id"),
            "shared",
            (F.col("size_a") + F.col("size_b") - F.col("shared"))
            .cast("bigint")
            .alias("pos_union"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        (F.col("shared").cast("double") / F.col("pos_union")).desc(),
        F.col("cand_id").asc(),
    )
    best = (
        sym.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("positive_id"),
            F.col("shared").cast("bigint").alias("pos_shared"),
            "pos_union",
        )
    )
    c0 = (F.col("anchor_id") * F.lit(2654435761)) % n_docs
    c1 = (c0 + 1) % n_docs
    c2 = (c0 + 2) % n_docs
    neg = (
        F.when(
            (c0 != F.col("anchor_id")) & (c0 != F.col("positive_id")), c0
        )
        .when((c1 != F.col("anchor_id")) & (c1 != F.col("positive_id")), c1)
        .otherwise(c2)
        .cast("bigint")
    )
    trip = best.withColumn("negative_id", neg)
    known = sym.select(
        "anchor_id", F.col("cand_id").alias("negative_id"),
        F.lit(True).alias("neg_is_known_dup"),
    ).distinct()
    return trip.join(known, ["anchor_id", "negative_id"], "left").select(
        "anchor_id",
        "positive_id",
        "negative_id",
        "pos_shared",
        "pos_union",
        F.coalesce("neg_is_known_dup", F.lit(False)).alias(
            "neg_is_known_dup"
        ),
    )


#: Poisson(1) CDF quantized to the BUCKETS=10000 lattice: a draw b in
#: [0, 10000) maps to the count of copies k with P(k) matching the Poisson
#: probabilities to < 1e-4 per bucket.  Integer thresholds make membership
#: exact and oracle-reproducible (the importance_sample rate-quantization
#: policy applied to a distribution).
_POISSON1_CDF_BUCKETS = (3679, 7358, 9197, 9810, 9963, 9994)


def poisson_bootstrap(
    df: DataFrame,
    key_col: str,
    value: Column,
    n_replicates: int = 10,
) -> DataFrame:
    """POISSON BOOTSTRAP — the distributed bootstrap (Chamandy et al.,
    Google 2012): instead of resampling n rows WITH replacement (which
    needs a global n and a global shuffle per replicate), every row
    independently contributes k ~ Poisson(1) copies to each replicate —
    row-local, no coordination, and the replicate totals converge to the
    classical bootstrap distribution.  THE way to put a confidence
    interval on a corpus statistic at 100 TB.

    Each replicate draws its copies from the md5-uniform lattice
    (``hash_bucket`` with a per-replicate salt — deterministic, so
    retries/reruns/engines agree) through the integer-quantized
    Poisson(1) CDF (< 1e-4 per-bucket distortion, the documented rate
    lattice).  Returns one row per replicate:
    (replicate, n_rows_resampled, value_resampled) — e.g. the bootstrap
    distribution of the corpus token count, from which the consumer reads
    the CI.

    Scale shape: the replicate fan-out is a row-local array explode
    (n_replicates structs per row — the hopping-window posture) into ONE
    map-side-combined aggregate with n_replicates output rows.  No global
    n, no per-replicate pass, no shuffle beyond the k-row reduce.
    """
    if n_replicates < 1:
        raise ValueError(f"n_replicates must be >= 1, got {n_replicates}")

    def copies(bucket: Column) -> Column:
        expr = F.lit(len(_POISSON1_CDF_BUCKETS))
        for k in range(len(_POISSON1_CDF_BUCKETS) - 1, -1, -1):
            expr = F.when(
                bucket < _POISSON1_CDF_BUCKETS[k], F.lit(k)
            ).otherwise(expr)
        return expr.cast("bigint")

    # conditional spread before the per-row md5 priority/CDF math:
    # identity at scale, parallelizes a low-split local source
    df = P.ensure_compute_width(df, key_col)
    arr = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("replicate"),
                copies(hash_bucket(F.col(key_col), f"boot{r}")).alias("k"),
            )
            for r in range(n_replicates)
        ]
    )
    e = df.select(
        F.col(key_col), value.cast("bigint").alias("_v"), F.explode(arr).alias("x")
    )
    return (
        e.groupBy(F.col("x.replicate").alias("replicate"))
        .agg(
            F.sum("x.k").cast("bigint").alias("n_rows_resampled"),
            F.sum(F.col("x.k") * F.col("_v")).cast("bigint").alias(
                "value_resampled"
            ),
        )
    )
