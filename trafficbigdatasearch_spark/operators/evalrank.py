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
    regardless of corpus size."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hits = (
        pred.select(query_col, id_col)
        .join(truth.select(query_col, id_col), [query_col, id_col])
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
    split) — evaluation must count those as misses, not drop them."""
    rel_users = relevant.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    hits = (
        recs.select(user_col, item_col, rank_col)
        .join(relevant.select(user_col, item_col), [user_col, item_col])
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
    envelope as the other evaluation rows."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hits = (
        recs.filter(F.col(rank_col) <= k)
        .select(user_col, item_col, rank_col)
        .join(relevant.select(user_col, item_col), [user_col, item_col])
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
    rel_users = relevant.groupBy(user_col).agg(
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
