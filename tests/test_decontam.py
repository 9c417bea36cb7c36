"""Test-set decontamination (operators/decontam.py): planted-overlap
semantics and the broadcast-probe plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import decontam


@pytest.fixture(scope="module")
def corpus(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                                   # the benchmark doc
        (1, "prefix words then " + bench_text + " tail"),  # full containment
        (2, "alpha beta gamma delta epsilon nothing else here at all"),
        (3, "totally unrelated text with many distinct words in it"),
        (4, "beta gamma delta epsilon zeta closing words here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_scores_planted(corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontam.contamination_scores(corpus, bench, n=5).collect()
    }
    # benchmark doc: 8 tokens -> 4 distinct 5-grams, all self-hits
    assert got[0] == 4
    # doc 1 contains the full benchmark text -> all 4 of its 5-grams
    assert got[1] == 4
    # doc 2 shares exactly one 5-gram window
    assert got[2] == 1
    # doc 4 shares one interior 5-gram
    assert got[4] == 1
    # doc 3 never appears
    assert 3 not in got


def test_decontaminate_drops_flagged(corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    kept = decontam.decontaminate(corpus, bench, n=5, min_hits=1)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]
    # higher threshold keeps the single-hit docs
    kept2 = decontam.decontaminate(corpus, bench, n=5, min_hits=2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3, 4]


def test_decontam_probe_is_broadcast(corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    plan = (
        decontam.contamination_scores(corpus, bench, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fuzzy_pairs_and_drop(spark):
    """Jaccard-normalized contamination: a paraphrase sharing most of a
    short bench doc's shingles flags; a long doc sharing the same absolute
    shingle count does not; decontaminate_fuzzy drops exactly the flagged
    train docs and never touches the benchmark table."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import decontam

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id BIGINT, text STRING",
    )
    filler = " ".join(f"w{i}" for i in range(200))
    corpus = spark.createDataFrame(
        [
            # near-copy: almost the bench doc -> high jaccard
            (1, "the quick brown fox jumps over the lazy cat"),
            # same shared shingles buried in a long doc -> low jaccard
            (2, "the quick brown fox jumps over the lazy dog " + filler),
            # unrelated
            (3, "completely different words here entirely unrelated text"),
        ],
        "doc_id BIGINT, text STRING",
    )
    pairs = decontam.fuzzy_contamination_pairs(
        corpus, bench, threshold=0.5, n=5
    ).collect()
    assert {r["doc_id"] for r in pairs} == {1}
    (p,) = pairs
    assert p["bench_id"] == 100 and p["jaccard"] >= 0.5

    kept = decontam.decontaminate_fuzzy(corpus, bench, threshold=0.5, n=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_semantic_contamination_pairs_and_anti_join(spark):
    """semantic_contamination_pairs (r10): identity and near-parallel
    vectors flag, orthogonal ones don't; same-id pairs are KEPT (benchmark
    rows physically in the corpus are literal contamination);
    decontaminate_semantic anti-joins the flagged ids out; the benchmark
    side is broadcast (no corpus exchange in the plan)."""
    from trafficbigdatasearch_spark.operators import decontam

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),          # == bench 100
            (2, [0.95, 0.05, 0.0]),        # near bench 100
            (3, [0.0, 1.0, 0.0]),          # orthogonal
            (100, [1.0, 0.0, 0.0]),        # the bench row itself, in-corpus
        ],
        "vec_id bigint, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "bench_id bigint, embedding array<float>"
    )
    pairs = decontam.semantic_contamination_pairs(corpus, bench, threshold=0.9)
    got = {(r["vec_id"], r["bench_id"]) for r in pairs.collect()}
    assert got == {(1, 100), (2, 100), (100, 100)}
    kept = decontam.decontaminate_semantic(corpus, bench, threshold=0.9)
    assert sorted(r["vec_id"] for r in kept.collect()) == [3]
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "Exchange hashpartitioning" not in plan, plan[:1500]
