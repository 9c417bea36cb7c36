"""Offline evaluation of retrieval / recommendation rankings.

The engine grew a two-leg retrieval stack (operators/search.py,
operators/similarity.py, operators/fusion.py) and an item-based recommender
(operators/recsys.py); a production pipeline never ships those without a
measurement loop.  This module is that loop, DataFrame-native: compare a
predicted top-k list against a ground-truth set and emit per-query /
per-user quality rows — the recall ladder (exact vs IVF vs PQ) and the
leave-out holdout evaluation (train on one split, score hits on the other).

Determinism policy (the registry oracle requirement): every metric row is
INTEGER counts plus at most ONE closing IEEE division — never a float SUM.
Corpus-level means are deliberately NOT computed here: a float mean over an
unordered row set does not reproduce bit-for-bit across engines, while the
per-query rows hash-compare exactly and any consumer can aggregate them
with whatever precision policy it wants (the same split as BM25 raw vs
robertson and lm.py coverage vs logprob).

Shapes (the 100 TB posture):

- Both inputs to :func:`topk_overlap` are top-k results — k-sized per
  query by construction — so the overlap join touches O(n_queries * k)
  rows no matter the corpus size; the expensive work happened upstream
  inside the legs being evaluated.
- :func:`first_hit_rank` joins a per-user top-n list (n-sized per user)
  to the holdout set (a fraction of the interaction matrix): one equi
  shuffle on (user, item), one map-side-combined min aggregate.
- :func:`holdout_split` is a row-local md5-range predicate (the
  operators/sampling.py recipe) — reproducible under retries,
  repartitioning, and in the DuckDB oracle, unlike ``rand()``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import sampling


def topk_overlap(
    pred: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query overlap of a predicted top-``k`` list with a ground-truth
    top-``k`` list: (query_col, n_overlap, recall) with
    ``recall = n_overlap / k`` — recall@k when ``truth`` is the exact
    result (the ANN literature's standard accuracy metric).

    Queries present in ``truth`` but missed entirely by ``pred`` are kept
    with ``n_overlap = 0`` (the left join from truth's query set) — a
    recall report that silently drops its failures is not a report.  The
    join is k-sized per query on both sides, so cost is O(n_queries * k)
    regardless of corpus size.

    Both id selections are deduplicated before the join: this is a
    public evaluation surface, and a duplicated (query, id) row in
    either input must not inflate ``n_overlap`` past ``k`` (recall > 1
    is never a valid report)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hits = (
        pred.select(query_col, id_col)
        .distinct()
        .join(
            truth.select(query_col, id_col).distinct(), [query_col, id_col]
        )
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        truth.select(query_col)
        .distinct()
        .join(hits, query_col, "left")
        .select(
            F.col(query_col),
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (
                F.coalesce(F.col("_n"), F.lit(0)).cast("double") / F.lit(float(k))
            ).alias("recall"),
        )
    )


def first_hit_rank(
    recs: DataFrame,
    relevant: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-user rank of the first relevant recommendation: (user_col,
    n_relevant, hit_rank, rr) where ``hit_rank`` is the MIN rank among
    recommended items that appear in ``relevant`` (NULL when none do) and
    ``rr = 1 / hit_rank`` (0.0 on a miss) — the per-user term of MRR,
    left un-averaged per the module's determinism policy.

    Every user with >= 1 relevant item is reported, including users the
    recommender produced nothing for (cold users absent from the training
    split) — evaluation must count those as misses, not drop them.

    ``relevant`` is deduplicated on (user, item) before both the
    ``n_relevant`` count and the hit join — a duplicated ground-truth
    row must not inflate the relevant-set size (the hit side is already
    immune: MIN over rank absorbs duplicates)."""
    rel = relevant.select(user_col, item_col).distinct()
    rel_users = rel.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    hits = (
        recs.select(user_col, item_col, rank_col)
        .join(rel, [user_col, item_col])
        .groupBy(user_col)
        .agg(F.min(rank_col).cast("bigint").alias("hit_rank"))
    )
    return rel_users.join(hits, user_col, "left").select(
        F.col(user_col),
        F.col("n_relevant"),
        F.col("hit_rank"),
        F.coalesce(
            F.lit(1.0) / F.col("hit_rank").cast("double"), F.lit(0.0)
        ).alias("rr"),
    )


def holdout_split(
    ui: DataFrame,
    test_frac: float = 0.2,
    salt: str = "eval",
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) split of an interaction matrix by md5
    range of the ``user:item`` PAIR — per-interaction leave-out, the
    standard recommender holdout (a per-user split would starve sparse
    users; a per-item split would hide cold items from training
    entirely).  Row-local, zero shuffles, reproducible in any engine
    (operators/sampling.py's bucket recipe; the registry oracle recomputes
    membership with the same md5 arithmetic).

    ``test_frac`` is quantized to 1/10000 exactly like sampling.hash_split,
    and the test range is the TOP of the bucket space: train =
    [0, 10000*(1-test_frac)), test = the rest."""
    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    cut = sampling.BUCKETS - round(test_frac * sampling.BUCKETS)
    if cut in (0, sampling.BUCKETS):
        raise ValueError(
            f"test_frac={test_frac} quantizes to an empty split at "
            f"{sampling.BUCKETS} buckets"
        )
    key = F.concat_ws(
        ":", F.col(user_col).cast("string"), F.col(item_col).cast("string")
    )
    bkt = sampling.hash_bucket(key, salt)
    return ui.filter(bkt < cut), ui.filter(bkt >= cut)


def ndcg_at_k(
    recs: DataFrame,
    relevant: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-user NDCG@k with binary relevance: (user_col, n_relevant, dcg,
    idcg, ndcg) where ``dcg = Σ 1/log2(1 + rank)`` over relevant items in
    the top-``k`` and ``idcg`` is the same sum over the ideal ranks
    ``1..min(k, n_relevant)`` — the position-sensitive complement to
    first_hit_rank's MRR term (MRR sees only the first hit; NDCG credits
    every hit, discounted by depth).

    PYTEST-PINNED, deliberately NOT oracle-hashed: log2 is platform math
    and the per-user sum is a float fold — the same policy split as
    BM25's robertson idf and lm.logprob_scores.  The per-user hit sum is
    bounded by k terms folded in a FIXED rank order (sorted array
    aggregate, not a row-order-dependent SUM), so within one engine the
    result is deterministic under any partitioning.

    Plan: one equi join on (user, item) + one per-user sorted-array fold
    + a row-local ideal-rank expression — the same O(users * k) cost
    envelope as the other evaluation rows.

    Inputs are deduplicated: ``relevant`` collapses to distinct
    (user, item) before the ``n_relevant`` count and the hit join, and a
    relevant item recommended at several ranks contributes ONE dcg term
    at its best (minimum) rank — duplicates must not double-count the
    discounted gain."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    rel = relevant.select(user_col, item_col).distinct()
    hits = (
        recs.filter(F.col(rank_col) <= k)
        .select(user_col, item_col, rank_col)
        .join(rel, [user_col, item_col])
        .groupBy(user_col, item_col)
        .agg(F.min(rank_col).alias(rank_col))
    )
    # fixed-order fold: collect ranks, sort, then aggregate — never a
    # float SUM over unordered rows
    dcg = (
        hits.groupBy(user_col)
        .agg(F.sort_array(F.collect_list(rank_col)).alias("_ranks"))
        .select(
            user_col,
            F.aggregate(
                "_ranks",
                F.lit(0.0),
                lambda acc, r: acc + F.lit(1.0) / F.log2(r.cast("double") + 1),
            ).alias("dcg"),
        )
    )
    rel_users = rel.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    ideal_n = F.least(F.col("n_relevant"), F.lit(k)).cast("int")
    idcg = F.aggregate(
        F.sequence(F.lit(1), ideal_n),
        F.lit(0.0),
        lambda acc, r: acc + F.lit(1.0) / F.log2(r.cast("double") + 1),
    )
    return (
        rel_users.join(dcg, user_col, "left")
        .select(
            F.col(user_col),
            "n_relevant",
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            idcg.alias("idcg"),
        )
        .withColumn("ndcg", F.try_divide(F.col("dcg"), F.col("idcg")))
    )


def hdcg_at_k(
    recs: DataFrame,
    relevant: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-user HARMONIC-discount cumulative gain at ``k`` — the
    position-sensitive evaluation row :func:`ndcg_at_k` cannot make
    oracle-hashable, made hashable by swapping the discount:

        hdcg = Σ 1/(1 + rank)   over relevant items in the top-k

    1/(1+r) is RATIONAL, so with D = lcm(2..k+1) every term D/(1+r) is an
    exact integer and the per-user gain is an order-independent INTEGER
    sum — no float fold, no platform log2 (the collocations lift-vs-PMI
    move applied to ranked evaluation; same discount family as MRR, one
    rung gentler than log2's).  Returns (user_col, n_relevant, dcg_num,
    idcg_num, hdcg) where dcg_num/idcg_num are the integer numerators
    over the implicit denominator D and ``hdcg = dcg_num / idcg_num`` is
    the normalized [0, 1] score — ONE closing IEEE division of two exact
    integers, bit-identical in any engine (the module's determinism
    policy).  idcg_num is the gain of the ideal ranking 1..min(k,
    n_relevant), so hdcg = 1 exactly when every relevant item (up to k)
    sits at the top of the list.

    Same input contract as the siblings: both inputs deduplicated, a
    relevant item recommended at several ranks credits ONE term at its
    best rank.  Plan: one (user, item) equi join + two map-side-combined
    integer aggregates + a row-local ideal-gain expression — O(users * k).

    Bound: ``k <= 41``.  D = lcm(2..k+1) must fit int64 for the integer
    numerators to ride BIGINT columns; lcm(2..43) > 2**63-1, so k=42+
    raises ValueError up front (use :func:`ndcg_at_k` for larger cutoffs).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    denom = math.lcm(*range(2, k + 2))
    if denom > 2**63 - 1:
        # lcm(2..k+1) crosses int64 between k=41 and k=42; past that the
        # integer-numerator trick cannot ride BIGINT columns and F.lit/
        # F.expr fail with an opaque conversion error.  Fail loudly with
        # the actual bound instead.
        raise ValueError(
            f"k={k} exceeds the exact-integer bound for harmonic DCG: "
            f"lcm(2..k+1)={denom} overflows int64 (max supported k is 41). "
            "Use ndcg_at_k for larger cutoffs."
        )
    rel = relevant.select(user_col, item_col).distinct()
    hits = (
        recs.filter(F.col(rank_col) <= k)
        .select(user_col, item_col, rank_col)
        .join(rel, [user_col, item_col])
        .groupBy(user_col, item_col)
        .agg(F.min(rank_col).alias(rank_col))
    )
    dcg = hits.groupBy(user_col).agg(
        F.sum(F.expr(f"{denom} div (1 + {rank_col})"))
        .cast("bigint")
        .alias("dcg_num")
    )
    rel_users = rel.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    ideal_n = F.least(F.col("n_relevant"), F.lit(k)).cast("int")
    # ideal gains precomputed exactly driver-side (k tiny): prefix[j-1] =
    # Σ_{r=1..j} D//(1+r) — a literal lookup, zero in-plan arithmetic
    prefix, tot = [], 0
    for r in range(1, k + 1):
        tot += denom // (1 + r)
        prefix.append(tot)
    idcg_num = F.element_at(
        F.array(*[F.lit(v).cast("bigint") for v in prefix]), ideal_n
    )
    return (
        rel_users.join(dcg, user_col, "left")
        .select(
            F.col(user_col),
            "n_relevant",
            F.coalesce(F.col("dcg_num"), F.lit(0)).cast("bigint").alias(
                "dcg_num"
            ),
            idcg_num.cast("bigint").alias("idcg_num"),
        )
        .withColumn(
            "hdcg",
            F.col("dcg_num").cast("double") / F.col("idcg_num").cast("double"),
        )
    )


def cluster_purity(
    assignments: DataFrame,
    labels: DataFrame,
    cluster_col: str = "cell_id",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster PURITY of a clustering against ground-truth labels (r10)
    — the measurement loop for the engine's blocking/clustering fabrics
    (IVF cells, CC dedup components, k-means cells): how label-homogeneous
    is each cluster the pipeline is about to treat as "one group"?

    Returns one row per cluster: (cluster_col, n_members, majority_label,
    n_majority, purity) with ``purity = n_majority / n_members``.  Module
    determinism contract holds: counts are integers, purity is ONE closing
    IEEE division, majority ties break to the SMALLEST label — the row set
    hash-compares across engines.  Corpus-level purity is deliberately
    left to the consumer (sum(n_majority)/sum(n_members) — exact integer
    arithmetic — rather than a float mean of per-cluster rows).

    Rows with NULL labels are excluded up front (an unlabeled member can
    neither vote nor be scored), documented not silent — the exclusion
    count is the caller's audit via a plain filter.

    Plan: one equi join (id), then (cluster, label) counts and a
    per-cluster max_by fold — two map-side-combined exchanges, output
    one row per cluster regardless of corpus size.
    """
    lab = labels.select(F.col(id_col), F.col(label_col)).filter(
        F.col(label_col).isNotNull()
    )
    by_label = (
        assignments.select(id_col, cluster_col)
        .join(lab, id_col)
        .groupBy(cluster_col, label_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        by_label.groupBy(cluster_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_members"),
            F.max_by(
                F.col(label_col),
                F.struct(F.col("cnt"), (-F.col(label_col)).alias("_neg")),
            ).alias("majority_label"),
            F.max("cnt").cast("bigint").alias("n_majority"),
        )
        .select(
            cluster_col,
            "n_members",
            "majority_label",
            "n_majority",
            (
                F.col("n_majority").cast("double")
                / F.col("n_members").cast("double")
            ).alias("purity"),
        )
    )


def score_calibration(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability curve of a quality SCORE against a binary OUTCOME (r10):
    bucket the corpus into exact global score quantiles (the
    ranks.global_quantile_buckets histogram-CDF machinery — zero corpus
    shuffle beyond one map-side-combined histogram, no global sort), then
    report the observed outcome rate per bucket — the standard calibration
    artifact behind "does this quality signal actually predict the gate?"
    decisions before a curation run commits to a threshold.

    Returns one row per bucket: (bucket, n_docs, n_pos, score_lo,
    score_hi, pos_rate).  Module determinism contract: integer counts and
    exact min/max bounds, pos_rate the single closing IEEE division.
    NULL outcomes count as negative (a doc that can't pass doesn't);
    NULL scores are excluded by the bucketing (consistent with
    global_quantile_buckets).
    """
    from trafficbigdatasearch_spark.operators import ranks

    b = ranks.global_quantile_buckets(df, score_col, n_buckets)
    pos = F.when(F.col(outcome_col), F.lit(1)).otherwise(F.lit(0))
    return (
        b.groupBy(F.col("g_bucket").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(pos).cast("bigint").alias("n_pos"),
            F.min(score_col).alias("score_lo"),
            F.max(score_col).alias("score_hi"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_pos",
            "score_lo",
            "score_hi",
            (
                F.col("n_pos").cast("double") / F.col("n_docs").cast("double")
            ).alias("pos_rate"),
        )
    )


def pair_set_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Precision/recall of a candidate PAIR set against a ground-truth
    pair set (r10) — the measurement loop for the candidate-generation
    fabrics (LSH bands, SimHash buckets, IVF cells, prefix filters):
    "what fraction of true near-dup pairs does this blocking scheme
    surface, at what candidate overhead?"

    One row: (n_truth, n_cand, n_tp, pair_precision, pair_recall).
    Module contract: three integer counts, two closing IEEE divisions.
    Both inputs dedupe on the id pair first, so multiplicity up-stream
    (e.g. a pair colliding in several bands) cannot inflate any count.

    Plan: one full-outer hash join of the two (already pair-sized,
    corpus-independent) sets + a single-row aggregate.
    """
    ids = [id_a, id_b]
    c = candidates.select(*ids).distinct().withColumn("_c", F.lit(1))
    t = truth.select(*ids).distinct().withColumn("_t", F.lit(1))
    j = c.join(t, ids, "full_outer")
    return j.agg(
        F.sum("_t").cast("bigint").alias("n_truth"),
        F.sum("_c").cast("bigint").alias("n_cand"),
        F.sum(F.col("_c") * F.col("_t")).cast("bigint").alias("n_tp"),
    ).select(
        "n_truth",
        "n_cand",
        "n_tp",
        (
            F.col("n_tp").cast("double") / F.col("n_cand").cast("double")
        ).alias("pair_precision"),
        (
            F.col("n_tp").cast("double") / F.col("n_truth").cast("double")
        ).alias("pair_recall"),
    )


def recommendation_coverage(
    recs: DataFrame,
    catalog: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Catalog COVERAGE + exposure concentration of a recommendation run —
    the aggregate health metrics beside the per-user quality rows
    (hdcg/ndcg say whether each list is good; this says whether the system
    recommends the CATALOG or just its head, the popularity-bias smell
    test every item-based recommender needs).

    One row: n_users (users served), n_slots (total list positions),
    n_rec_items (distinct items recommended), n_catalog (distinct items in
    the catalog), ``coverage`` = n_rec_items / n_catalog as ONE closing
    IEEE division, and ``max_item_share_ppm`` — the single most-exposed
    item's share of all slots in parts-per-million (exact integer div).

    Scale shape: one map-side-combined count per item (shuffle rows =
    |recommended items|), folded to a one-row reduce; the catalog side is
    its own tiny distinct-count; nothing joins on users, nothing sorts,
    nothing collects.  Runs after every recommend_topn batch for free.
    """
    per_item = recs.groupBy(F.col(item_col).alias("_it")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_slots")
    )
    stats = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rec_items"),
        F.sum("n_slots").cast("bigint").alias("n_slots"),
        F.max("n_slots").cast("bigint").alias("max_item_slots"),
    )
    users = recs.agg(
        F.count_distinct(F.col(user_col)).cast("bigint").alias("n_users")
    )
    cat = catalog.select(F.col(item_col)).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_catalog")
    )
    return (
        users.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_users",
            "n_slots",
            "n_rec_items",
            "n_catalog",
            (F.col("n_rec_items").cast("double") / F.col("n_catalog"))
            .alias("coverage"),
            F.expr("1000000 * max_item_slots div n_slots")
            .cast("bigint")
            .alias("max_item_share_ppm"),
        )
    )


def minhash_estimate_error(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """MinHash ESTIMATION ERROR per pair — the accuracy half of the MinHash
    eval story (eval_lsh_recall measures whether the BAND fabric surfaces
    the right candidate pairs; this measures how well the SIGNATURES
    estimate Jaccard itself, the number that sizes k): for every exact
    Jaccard >= threshold pair,

        est_jaccard   = n_match / k        (matching signature components)
        exact_jaccard = shared / union     (true shingle-set Jaccard)
        abs_err       = |est - exact|

    All legs ship as exact integers (n_match, k, shared, union_size) beside
    the two closing IEEE divisions and their fixed-order difference —
    hash-exact across engines.  E[est] = exact and Var = J(1-J)/k, so the
    observed error distribution against 1/sqrt(k) is the direct check that
    k is big enough for the LSH threshold in use.

    Scale shape: the pair set is the inverted-index join's output (never
    all-pairs), the signature table is k rows per doc, and the match count
    is a pair-restricted join (pairs x k rows) folded map-side.  Runs
    beside the dedup job it audits at any corpus size.
    """
    from trafficbigdatasearch_spark.operators import dedup as D

    pairs = D.ngram_jaccard_pairs(
        docs, id_col, text_col, n=n, threshold=threshold,
        max_shingle_freq=max_shingle_freq,
    )
    sigs = D.minhash_signatures(docs, id_col, text_col, k=k, n=n)
    sa = sigs.select(
        F.col("id").alias("id_a"), "h_idx", F.col("minhash").alias("_ma")
    )
    sb = sigs.select(
        F.col("id").alias("id_b"), "h_idx", F.col("minhash").alias("_mb")
    )
    m = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "h_idx"])
        .groupBy("id_a", "id_b", "shared", "size_a", "size_b")
        .agg(
            F.count_if(F.col("_ma") == F.col("_mb"))
            .cast("bigint")
            .alias("n_match")
        )
    )
    union_size = (
        F.col("size_a") + F.col("size_b") - F.col("shared")
    ).cast("bigint")
    est = F.col("n_match").cast("double") / F.lit(k)
    exact = F.col("shared").cast("double") / union_size
    return m.select(
        "id_a",
        "id_b",
        F.lit(k).cast("bigint").alias("k"),
        "n_match",
        F.col("shared").cast("bigint").alias("shared"),
        union_size.alias("union_size"),
        est.alias("est_jaccard"),
        exact.alias("exact_jaccard"),
        F.abs(est - exact).alias("abs_err"),
    )


def jaccard_pair_histogram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """SIMILARITY HISTOGRAM of the near-dup pair set — pair counts per
    exact-Jaccard decile above ``threshold``: the threshold-tuning report
    (where does the corpus's similarity mass sit? is 0.8 cutting through
    a cluster or through noise?) that turns the dedup threshold from a
    guess into a measured choice.

    Buckets are EXACT integers — ``bucket = (10 * shared) div union`` (a
    pair at Jaccard 0.73 lands in bucket 7; bucket 10 = exact duplicates)
    — so no float ever enters the binning and rows hash-compare.

    Scale shape: rides the inverted-index pair generator at the LOWER
    exploratory threshold (candidate volume is the documented cost knob —
    at 100 TB run it on a hash-sampled doc slice, the histogram shape is
    what matters); the fold is one map-side-combined count, 11 rows out.
    """
    from trafficbigdatasearch_spark.operators import dedup as D

    pairs = D.ngram_jaccard_pairs(
        docs, id_col, text_col, n=n, threshold=threshold,
        max_shingle_freq=max_shingle_freq,
    )
    bucket = F.expr(
        "(10 * shared) div (size_a + size_b - shared)"
    ).cast("int")
    return (
        pairs.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def split_leakage(
    pairs: DataFrame,
    splits_by_method: dict[str, DataFrame],
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """SPLIT LEAKAGE audit — for each split strategy, how many near-dup
    pairs STRADDLE the train/test boundary: the measurement that justifies
    leakage-free (cluster-keyed) splitting, and the regression alarm that
    catches a split-key change silently re-introducing contamination.
    One row per method: (method, n_pairs, n_straddling, leak_ppm) with
    leak_ppm an exact integer — the leakage-free strategy's row reading 0
    is its guarantee MEASURED, not asserted.

    Scale shape: per method, the pair set joins the (id, split) membership
    twice on the pair ids and folds map-side to one row.  The membership
    projection is thin but CORPUS-SIZED (one row per doc), so at scale
    these are hash/sort-merge joins shuffling on the ids — bounded by
    pair volume plus the two-column projection, never by corpus width;
    the 1KB broadcast audit confirms the plan degrades to exactly that
    shape (AQE broadcasting at toy scale is the rescue, not the design).
    The pair set itself is whatever generator produced it (never
    all-pairs here).
    """
    if not splits_by_method:
        raise ValueError("split_leakage: need at least one split method")
    outs = []
    for method, splits in splits_by_method.items():
        s = splits.select(
            F.col(id_col).alias("_id"), F.col(split_col).alias("_s")
        )
        j = (
            pairs.join(
                s.select(F.col("_id").alias(id_a), F.col("_s").alias("_sa")),
                id_a,
            )
            .join(
                s.select(F.col("_id").alias(id_b), F.col("_s").alias("_sb")),
                id_b,
            )
        )
        outs.append(
            j.agg(
                F.lit(method).alias("method"),
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.count_if(F.col("_sa") != F.col("_sb"))
                .cast("bigint")
                .alias("n_straddling"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "method",
        "n_pairs",
        "n_straddling",
        F.expr("1000000 * n_straddling div n_pairs").cast("bigint").alias(
            "leak_ppm"
        ),
    )
