"""Ranking-evaluation operators (operators/evalrank.py).

The registry rows (eval_ivf_recall, rec_eval_holdout) oracle-verify the
full composed paths; these tests pin the metric arithmetic and the honest-
evaluation contracts (zero-overlap queries kept, cold users kept as
misses, split determinism) on hand-sized inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import evalrank


def _pairs(spark, rows, q="query_id", i="neighbor_id"):
    return spark.createDataFrame(rows, f"{q} BIGINT, {i} BIGINT")


# ---------------------------------------------------------------------------
# topk_overlap
# ---------------------------------------------------------------------------


def test_topk_overlap_identical_and_disjoint(spark):
    truth = _pairs(spark, [(1, 10), (1, 11), (2, 20), (2, 21)])
    # query 1 predicted perfectly; query 2 predicted completely wrong
    pred = _pairs(spark, [(1, 10), (1, 11), (2, 98), (2, 99)])
    out = {
        r["query_id"]: r
        for r in evalrank.topk_overlap(pred, truth, k=2).collect()
    }
    assert out[1]["n_overlap"] == 2 and out[1]["recall"] == 1.0
    # the failed query is REPORTED, not dropped
    assert out[2]["n_overlap"] == 0 and out[2]["recall"] == 0.0


def test_topk_overlap_partial_and_missing_query(spark):
    truth = _pairs(spark, [(1, 10), (1, 11), (1, 12), (1, 13), (3, 30)])
    pred = _pairs(spark, [(1, 11), (1, 13), (1, 99), (1, 98)])  # no query 3
    out = {
        r["query_id"]: r
        for r in evalrank.topk_overlap(pred, truth, k=4).collect()
    }
    assert out[1]["n_overlap"] == 2 and out[1]["recall"] == 0.5
    assert out[3]["n_overlap"] == 0 and out[3]["recall"] == 0.0


def test_topk_overlap_rejects_bad_k(spark):
    df = _pairs(spark, [(1, 1)])
    with pytest.raises(ValueError, match="k must be positive"):
        evalrank.topk_overlap(df, df, k=0)


# ---------------------------------------------------------------------------
# first_hit_rank
# ---------------------------------------------------------------------------


def test_first_hit_rank_hand_case(spark):
    recs = spark.createDataFrame(
        [
            (1, 100, 1), (1, 101, 2), (1, 102, 3),   # hit at rank 2
            (2, 200, 1), (2, 201, 2),                 # no hits
        ],
        "user_id BIGINT, item_id BIGINT, rank BIGINT",
    )
    rel = spark.createDataFrame(
        [
            (1, 101), (1, 102),   # user 1: first hit rank 2 (min of 2, 3)
            (2, 999),             # user 2: relevant item never recommended
            (3, 300),             # user 3: cold — no recs at all
        ],
        "user_id BIGINT, item_id BIGINT",
    )
    out = {
        r["user_id"]: r for r in evalrank.first_hit_rank(recs, rel).collect()
    }
    assert out[1]["hit_rank"] == 2 and out[1]["rr"] == 0.5
    assert out[1]["n_relevant"] == 2
    # miss and cold user both reported as misses, never dropped
    assert out[2]["hit_rank"] is None and out[2]["rr"] == 0.0
    assert out[3]["hit_rank"] is None and out[3]["rr"] == 0.0
    assert set(out) == {1, 2, 3}


# ---------------------------------------------------------------------------
# holdout_split
# ---------------------------------------------------------------------------


def _ui(spark, n_users=40, n_items=25):
    return (
        spark.range(n_users)
        .withColumnRenamed("id", "user_id")
        .crossJoin(
            spark.range(n_items).withColumnRenamed("id", "item_id")
        )
        .filter((F.col("user_id") + F.col("item_id")) % 3 != 0)
    )


def test_holdout_split_partitions_exactly(spark):
    ui = _ui(spark)
    train, test = evalrank.holdout_split(ui, test_frac=0.2)
    n, ntr, nte = ui.count(), train.count(), test.count()
    assert ntr + nte == n
    assert train.intersect(test).count() == 0
    # md5 is uniform: 20% +- a loose binomial bound on ~667 rows
    assert 0.10 < nte / n < 0.30


def test_holdout_split_deterministic_under_repartition(spark):
    ui = _ui(spark)
    _, t1 = evalrank.holdout_split(ui, test_frac=0.2)
    _, t2 = evalrank.holdout_split(ui.repartition(7), test_frac=0.2)
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_holdout_split_salt_changes_membership(spark):
    ui = _ui(spark)
    _, a = evalrank.holdout_split(ui, test_frac=0.2, salt="eval")
    _, b = evalrank.holdout_split(ui, test_frac=0.2, salt="other")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, b.collect()))


def test_holdout_split_rejects_bad_frac(spark):
    ui = _ui(spark, 2, 2)
    for frac in (0.0, 1.0, -0.1, 1e-9):
        with pytest.raises(ValueError):
            evalrank.holdout_split(ui, test_frac=frac)


# ---------------------------------------------------------------------------
# composed: the registered rec_eval_holdout path on a hand-checkable matrix
# ---------------------------------------------------------------------------


def test_holdout_eval_end_to_end_shape(spark):
    from trafficbigdatasearch_spark.operators import recsys

    ui = _ui(spark, n_users=60, n_items=30)
    train, test = evalrank.holdout_split(ui, test_frac=0.2)
    recs = recsys.recommend_topn(train, n=10, min_co=2)
    out = evalrank.first_hit_rank(recs, test)
    rows = out.collect()
    # one row per user with >= 1 holdout interaction
    assert len(rows) == test.select("user_id").distinct().count()
    for r in rows:
        if r["hit_rank"] is not None:
            assert 1 <= r["hit_rank"] <= 10
            assert r["rr"] == pytest.approx(1.0 / r["hit_rank"])
        else:
            assert r["rr"] == 0.0


def test_ivfadc_candidates_come_from_probed_cells(spark):
    """IVFADC's structural contract: every returned neighbor lies in one
    of its query's nprobe probed coarse cells, and per-query result sets
    agree with whole-corpus ADC RESTRICTED to those candidates (the coarse
    stage only selects candidates; it never perturbs the fine ranking).

    Measured side note, kept as a loose pin: at the registered config the
    coarse restriction IMPROVED recall@5 vs whole-corpus ADC (0.12 vs
    0.08 here) — pruning removes far-away points that quantization error
    would otherwise promote; the naive "pruning can only lose recall"
    ladder is false for ADC and deliberately NOT asserted."""
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    ivfadc = similarity.ivf_adc_topk(emb, qs, k=5, nprobe=2, m=8).collect()
    assert len(ivfadc) > 0

    # reconstruct the probe sets via the sibling IVF operator's plumbing:
    # exact-rerank IVF with a huge k returns exactly the candidate pairs
    cand = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            emb, qs, k=10**9, nprobe=2, centroid_stride=97
        ).collect()
    }
    for r in ivfadc:
        assert (r["query_id"], r["neighbor_id"]) in cand

    # fine ranking = whole-corpus ADC restricted to the candidates
    adc = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in similarity.pq_adc_topk(emb, qs, k=10**9, m=8).collect()
    }
    for r in ivfadc:
        assert adc[(r["query_id"], r["neighbor_id"])] == r["adc_dist"]

    # and it stays a non-trivial retriever at the registered config
    exact = similarity.brute_force_topk(emb, qs, k=5)
    pred = spark.createDataFrame(
        [(r["query_id"], r["neighbor_id"]) for r in ivfadc],
        "query_id BIGINT, neighbor_id BIGINT",
    )
    rows = evalrank.topk_overlap(pred, exact, k=5).collect()
    assert sum(r["n_overlap"] for r in rows) > 0


def test_ndcg_hand_case(spark):
    """NDCG@3: perfect ranking -> 1.0; one hit at rank 3 of an
    ideal-1 user -> 1/log2(4); miss/cold users -> 0.0 with NULL-free
    dcg."""
    import math

    recs = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),   # both relevant at 1,2
            (2, 20, 1), (2, 21, 2), (2, 22, 3),   # relevant only at 3
            (3, 30, 1),                             # no relevant items hit
        ],
        "user_id BIGINT, item_id BIGINT, rank BIGINT",
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 22), (3, 99), (4, 40)],
        "user_id BIGINT, item_id BIGINT",
    )
    out = {
        r["user_id"]: r
        for r in evalrank.ndcg_at_k(recs, rel, k=3).collect()
    }
    assert out[1]["ndcg"] == pytest.approx(1.0)     # ideal order achieved
    assert out[2]["dcg"] == pytest.approx(1.0 / math.log2(4))
    assert out[2]["ndcg"] == pytest.approx(1.0 / math.log2(4) / 1.0)
    assert out[3]["ndcg"] == 0.0 and out[3]["dcg"] == 0.0
    assert out[4]["ndcg"] == 0.0                    # cold user reported
    assert set(out) == {1, 2, 3, 4}


def test_ndcg_partition_invariant(spark):
    from trafficbigdatasearch_spark.operators import recsys

    ui = _ui(spark, n_users=40, n_items=25)
    train, test = evalrank.holdout_split(ui, test_frac=0.2)
    recs = recsys.recommend_topn(train, n=10, min_co=2)
    a = sorted(map(tuple, evalrank.ndcg_at_k(recs, test, k=10).collect()))
    b = sorted(
        map(
            tuple,
            evalrank.ndcg_at_k(
                recs.repartition(7), test.repartition(3), k=10
            ).collect(),
        )
    )
    assert a == b   # fixed-order fold: exact equality, not approx


def test_eval_operators_deduplicate_inputs(spark):
    """Review (advice r7): duplicated (query,id)/(user,item) rows in either
    input must not inflate overlap (recall stays <= 1), n_relevant, or
    double-count dcg terms — the public-surface dedup contract."""
    pred = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "query_id BIGINT, neighbor_id BIGINT"
    )
    truth = spark.createDataFrame(
        [(1, 10), (1, 10)], "query_id BIGINT, neighbor_id BIGINT"
    )
    (row,) = evalrank.topk_overlap(pred, truth, k=1).collect()
    assert row["n_overlap"] == 1 and row["recall"] == 1.0

    recs = spark.createDataFrame(
        [(1, 10, 2), (1, 10, 3), (1, 30, 1)],
        "user_id BIGINT, item_id BIGINT, rank BIGINT",
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 99)], "user_id BIGINT, item_id BIGINT"
    )
    (fh,) = evalrank.first_hit_rank(recs, rel).collect()
    assert fh["n_relevant"] == 2  # not 3: dup ground-truth row collapsed
    assert fh["hit_rank"] == 2

    (nd,) = evalrank.ndcg_at_k(recs, rel, k=5).collect()
    # one dcg term at the BEST rank (2) for the duplicated hit:
    # dcg = 1/log2(3), idcg over min(k, n_relevant)=2 ideal ranks
    import math as _math

    assert nd["n_relevant"] == 2
    assert nd["dcg"] == pytest.approx(1 / _math.log2(3))
    assert nd["idcg"] == pytest.approx(1 / _math.log2(2) + 1 / _math.log2(3))


def test_hdcg_hand_case(spark):
    """hdcg_at_k (the oracle-hashable DCG twin): D = lcm(2..k+1); hits at
    ranks 1 and 3 of k=3 -> dcg_num = D/2 + D/4; ideal for n_relevant=2 ->
    idcg_num = D/2 + D/3; all integers, one closing division."""
    recs = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 99, 4)],
        "user_id BIGINT, item_id BIGINT, rank BIGINT",
    )
    rel = spark.createDataFrame(
        [(1, 10), (1, 30), (2, 50)], "user_id BIGINT, item_id BIGINT"
    )
    out = {r["user_id"]: r for r in evalrank.hdcg_at_k(recs, rel, k=3).collect()}
    import math as _math

    d = _math.lcm(2, 3, 4)  # 12
    u1 = out[1]
    assert u1["n_relevant"] == 2
    assert u1["dcg_num"] == d // 2 + d // 4      # ranks 1 and 3
    assert u1["idcg_num"] == d // 2 + d // 3     # ideal ranks 1 and 2
    assert u1["hdcg"] == (d // 2 + d // 4) / (d // 2 + d // 3)
    # user 2: relevant but never recommended -> dcg 0, hdcg 0, still a row
    u2 = out[2]
    assert (u2["dcg_num"], u2["hdcg"]) == (0, 0.0)
    assert u2["idcg_num"] == d // 2
    # rank-4 hit is outside k=3; duplicates credit once at the best rank
    dup = recs.unionByName(
        spark.createDataFrame([(1, 10, 2)], "user_id BIGINT, item_id BIGINT, rank BIGINT")
    )
    (r1,) = [r for r in evalrank.hdcg_at_k(dup, rel, k=3).collect() if r["user_id"] == 1]
    assert r1["dcg_num"] == u1["dcg_num"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        evalrank.hdcg_at_k(recs, rel, k=0)
    # advice r8: lcm(2..k+1) crosses int64 between k=41 and k=42 — past
    # that the integer numerators can't ride BIGINT columns, so the bound
    # is validated up front with a clear message instead of an opaque
    # F.lit conversion failure.  k=41 still constructs a plan.
    with _pytest.raises(ValueError, match="max supported k is 41"):
        evalrank.hdcg_at_k(recs, rel, k=42)
    import math as _math

    assert _math.lcm(*range(2, 43)) <= 2**63 - 1  # k=41 fits
    assert _math.lcm(*range(2, 44)) > 2**63 - 1   # k=42 does not
    evalrank.hdcg_at_k(recs, rel, k=41).schema  # plan builds at the bound


def test_semantic_incremental_dedup_hand_case(spark):
    """semantic_incremental_dedup: a new vector near-duplicating a corpus
    vector (same direction) drops; an orthogonal one survives; a
    re-ingested identical vector drops (identity pairs ARE the duplicate
    case here, unlike decontam's opt-in exclusion)."""
    from trafficbigdatasearch_spark.operators import similarity

    def vec(*xs):
        return [float(x) for x in xs] + [0.0] * (8 - len(xs))

    corpus = spark.createDataFrame(
        [
            (0, vec(1, 0)),        # also the stride-97 centroid (id 0)
            (3, vec(0.9, 0.1)),
            (7, vec(0, 1)),
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    new = spark.createDataFrame(
        [
            (100, vec(0.95, 0.05)),  # near-dup of 0/3 -> dropped
            (101, vec(-1, 1)),       # nothing similar at 0.9 -> kept
            (3, vec(0.9, 0.1)),      # re-ingest of corpus 3 -> dropped
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    kept = similarity.semantic_incremental_dedup(
        corpus, new, threshold=0.9, centroid_stride=97
    )
    assert [r["vec_id"] for r in kept.collect()] == [101]
    # empty new batch flows through
    assert (
        similarity.semantic_incremental_dedup(
            corpus, new.limit(0), threshold=0.9
        ).count()
        == 0
    )


def test_semantic_incremental_dedup_nprobe_widens_monotonically(spark):
    """nprobe is the recall dial: the flagged set grows (kept set shrinks)
    monotonically with nprobe, and at nprobe = n_cells it equals the
    exhaustive cross-comparison."""
    from trafficbigdatasearch_spark.operators import similarity
    import pytest as _pytest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    n_cells = corpus.filter(F.col("vec_id") % 97 == 0).count()
    kept = {
        p: similarity.semantic_incremental_dedup(
            corpus, new, threshold=0.4, nprobe=p
        ).count()
        for p in (1, 2, n_cells)
    }
    assert kept[1] >= kept[2] >= kept[n_cells]
    # exhaustive baseline: every (new, corpus) pair scored directly
    from trafficbigdatasearch_spark.functions import vectors as V

    cq = similarity._with_quantized(corpus, "embedding", "qa", "na").select(
        F.col("vec_id").alias("_cid"), "qa", "na"
    )
    nq = similarity._with_quantized(new, "embedding", "qb", "nb").select(
        F.col("vec_id").alias("_nid"), "qb", "nb"
    )
    s = V.cosine_from_parts(
        V.dot(F.col("qb"), F.col("qa")), F.col("nb"), F.col("na")
    )
    n_flagged = (
        nq.crossJoin(cq).filter(s >= 0.4).select("_nid").distinct().count()
    )
    assert kept[n_cells] == new.count() - n_flagged
    with _pytest.raises(ValueError, match="nprobe"):
        similarity.semantic_incremental_dedup(corpus, new, nprobe=0)


def test_embedding_dim_stats_hand_case(spark):
    """embedding_dim_stats: exact lattice moments on a hand vector set —
    dim 0 has values [1.0, 3.0] -> mean 2.0, variance 1.0; dim 1 is dead
    (all zeros) -> variance 0."""
    from trafficbigdatasearch_spark.operators import similarity

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0])],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    out = {r["dim"]: r for r in similarity.embedding_dim_stats(emb).collect()}
    assert out[0]["n"] == 2 and out[0]["sum_q"] == 40_000
    assert out[0]["sumsq_q"] == 10_000**2 + 30_000**2
    assert out[0]["mean"] == 2.0 and out[0]["variance"] == 1.0
    assert out[1]["mean"] == 0.0 and out[1]["variance"] == 0.0


def test_cluster_purity_ties_and_null_labels(spark):
    """cluster_purity (r10): majority ties break to the SMALLEST label,
    NULL-label rows are excluded from both votes and membership, purity is
    n_majority / n_members."""
    from trafficbigdatasearch_spark.operators import evalrank

    assignments = spark.createDataFrame(
        [(i, 100 if i < 6 else 200) for i in range(10)],
        "vec_id bigint, cell_id bigint",
    )
    labels = spark.createDataFrame(
        [
            # cell 100: labels 3,3,7,7 -> tie, majority must be 3; +2 NULLs
            (0, 3), (1, 3), (2, 7), (3, 7), (4, None), (5, None),
            # cell 200: 5,5,5,9 -> purity 0.75
            (6, 5), (7, 5), (8, 5), (9, 9),
        ],
        "vec_id bigint, label int",
    )
    out = {r["cell_id"]: r for r in
           evalrank.cluster_purity(assignments, labels).collect()}
    assert out[100]["n_members"] == 4 and out[100]["majority_label"] == 3
    assert out[100]["n_majority"] == 2 and out[100]["purity"] == 0.5
    assert out[200]["majority_label"] == 5 and out[200]["purity"] == 0.75


def test_score_calibration_buckets_and_rates(spark):
    """score_calibration (r10): exact-quantile buckets over the score,
    integer counts, NULL outcomes count negative, pos_rate = n_pos/n_docs."""
    from trafficbigdatasearch_spark.operators import evalrank

    # scores 1..100; outcome true iff score > 50 -> a perfect step curve
    rows = [(i, i, i > 50 if i % 7 else None) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id bigint, score bigint, y boolean")
    out = {r["bucket"]: r for r in
           evalrank.score_calibration(df, "score", "y", n_buckets=4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(r["n_docs"] == 25 for r in out.values())
    assert (out[1]["score_lo"], out[4]["score_hi"]) == (1, 100)
    assert out[1]["n_pos"] == 0 and out[2]["n_pos"] == 0
    # top half positive except the NULL outcomes (multiples of 7 -> None)
    assert out[3]["n_pos"] == 25 - len([i for i in range(51, 76) if i % 7 == 0])
    assert out[4]["pos_rate"] == out[4]["n_pos"] / 25


def test_pair_set_metrics_counts(spark):
    """pair_set_metrics (r10): TP/FP/FN bookkeeping on designed pair sets,
    duplicate candidate pairs (multi-band collisions) don't inflate
    counts, precision/recall are the closing divisions."""
    from trafficbigdatasearch_spark.operators import evalrank

    cand = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4), (5, 6)], "id_a bigint, id_b bigint"
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], "id_a bigint, id_b bigint"
    )
    row = evalrank.pair_set_metrics(cand, truth).collect()[0]
    assert (row["n_truth"], row["n_cand"], row["n_tp"]) == (3, 3, 2)
    assert row["pair_precision"] == 2 / 3 and row["pair_recall"] == 2 / 3


def test_recommendation_coverage_hand_case(spark):
    from trafficbigdatasearch_spark.operators import evalrank

    # catalog of 4 items; recs cover 2 of them; item 1 takes 3 of 4 slots
    recs = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 1)], "user_id: bigint, item_id: bigint"
    )
    catalog = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "item_id: bigint"
    )
    r = evalrank.recommendation_coverage(recs, catalog).collect()[0].asDict()
    assert r["n_users"] == 3 and r["n_slots"] == 4
    assert r["n_rec_items"] == 2 and r["n_catalog"] == 4
    assert r["coverage"] == 0.5
    assert r["max_item_share_ppm"] == 750000


def test_minhash_estimate_error_bruteforce_parity(spark):
    """est/exact legs match a pure-python recomputation on a tiny corpus
    with known near-dups; error is bounded by 1 and zero for identical
    texts (signatures must agree component-wise)."""
    from trafficbigdatasearch_spark.operators import dedup as D
    from trafficbigdatasearch_spark.operators import evalrank

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "the quick brown fox leaps over the lazy dog tonight"),
            (4, "completely unrelated text about spark query planning"),
        ],
        "doc_id: bigint, text: string",
    )
    out = {
        (r["id_a"], r["id_b"]): r.asDict()
        for r in evalrank.minhash_estimate_error(
            docs, k=8, n=3, threshold=0.2
        ).collect()
    }
    # identical docs: exact = 1, every signature component matches
    assert out[(1, 2)]["exact_jaccard"] == 1.0
    assert out[(1, 2)]["n_match"] == 8 and out[(1, 2)]["abs_err"] == 0.0
    # near-dup pair present; unrelated doc 4 pairs with nothing
    assert (1, 3) in out and not any(4 in p for p in out)
    # exact legs agree with python shingle sets
    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 1))}

    s1, s3 = shingles("the quick brown fox jumps over the lazy dog tonight"), \
        shingles("the quick brown fox leaps over the lazy dog tonight")
    assert out[(1, 3)]["shared"] == len(s1 & s3)
    assert out[(1, 3)]["union_size"] == len(s1 | s3)
    for r in out.values():
        assert 0 <= r["est_jaccard"] <= 1 and 0 <= r["abs_err"] <= 1
        assert r["abs_err"] == abs(r["est_jaccard"] - r["exact_jaccard"])


def test_split_leakage_hand_case(spark):
    from trafficbigdatasearch_spark.operators import evalrank

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_a: bigint, id_b: bigint"
    )
    # method A: 1,3,5 train / 2,4,6 test -> every pair straddles
    a = spark.createDataFrame(
        [(i, "train" if i % 2 else "test") for i in range(1, 7)],
        "doc_id: bigint, split: string",
    )
    # method B: pairs co-assigned -> zero leakage
    b = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "test"),
         (5, "train"), (6, "train")],
        "doc_id: bigint, split: string",
    )
    rows = {
        r["method"]: r.asDict()
        for r in evalrank.split_leakage(pairs, {"A": a, "B": b}).collect()
    }
    assert rows["A"]["n_straddling"] == 3 and rows["A"]["leak_ppm"] == 1000000
    assert rows["B"]["n_straddling"] == 0 and rows["B"]["leak_ppm"] == 0
    assert all(r["n_pairs"] == 3 for r in rows.values())
