"""Bigram LM quality scoring (operators/lm.py).

Coverage scoring is oracle-verified through the registry row
(text_lm_coverage); these tests pin the bigram extraction edge cases, the
hand-checked Laplace arithmetic of the ln-based variant the oracle can't
cover, and the train/score contracts.
"""

from __future__ import annotations

import math

import pytest

from trafficbigdatasearch_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_bigram_extraction_edges(spark):
    df = _docs(
        spark,
        [
            (1, "a b c"),        # two bigrams
            (2, "solo"),         # no bigram
            (3, ""),             # empty
            (4, "  x   y  "),    # whitespace runs collapse
            (5, "A a"),          # lowercased -> (a, a)
        ],
    )
    got = {
        (r["doc_id"], r["w1"], r["w2"]) for r in lm.doc_bigrams(df).collect()
    }
    assert got == {
        (1, "a", "b"), (1, "b", "c"), (4, "x", "y"), (5, "a", "a"),
    }


def test_coverage_hand_checked(spark):
    corpus = _docs(
        spark,
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
    )
    # min_count=2 keeps only ("the","cat") — the one repeated bigram
    model = lm.bigram_lm(corpus, min_count=2)
    assert {(r["w1"], r["w2"]) for r in model.collect()} == {("the", "cat")}
    score = _docs(spark, [(10, "the cat sat"), (11, "x"), (12, "dog ran")])
    got = {r["doc_id"]: r for r in lm.coverage_scores(score, model).collect()}
    assert (got[10]["n_bigrams"], got[10]["n_known"]) == (2, 1)
    assert got[10]["coverage"] == 0.5
    # a no-bigram doc is KEPT with zeros and NULL coverage
    assert (got[11]["n_bigrams"], got[11]["n_known"]) == (0, 0)
    assert got[11]["coverage"] is None
    assert got[12]["coverage"] == 0.0


def test_logprob_laplace_hand_checked(spark):
    corpus = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    model = lm.bigram_lm(corpus)  # (a,b):2  (a,c):1
    # vocab_size default: distinct w2 {b, c} + 1 OOV slot = 3
    out = {
        r["doc_id"]: r
        for r in lm.logprob_scores(
            _docs(spark, [(9, "a b"), (8, "q z")]), model
        ).collect()
    }
    # seen: p(b|a) = (2+1)/(3+3) = 0.5
    assert out[9]["avg_nll"] == pytest.approx(-math.log(0.5))
    # unseen context: p = 1/V = 1/3
    assert out[8]["avg_nll"] == pytest.approx(-math.log(1 / 3))


def test_logprob_ranks_consistent_with_coverage(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = lm.bigram_lm(docs.filter("doc_id % 4 = 0"), min_count=3)
    cov = {
        r["doc_id"]: r["coverage"]
        for r in lm.coverage_scores(docs, model).collect()
        if r["coverage"] is not None
    }
    nll = {
        r["doc_id"]: r["avg_nll"]
        for r in lm.logprob_scores(docs, model).collect()
    }
    import statistics

    ids = sorted(set(cov) & set(nll))
    med = statistics.median(cov[i] for i in ids)
    hi = [nll[i] for i in ids if cov[i] > med]
    lo = [nll[i] for i in ids if cov[i] <= med]
    if hi and lo:
        # higher coverage -> lower (better) NLL on average: the two scoring
        # surfaces agree on what "fluent under the model" means
        assert statistics.mean(hi) < statistics.mean(lo)


def test_hint_validated(spark):
    df = _docs(spark, [(1, "a b")])
    model = lm.bigram_lm(df)
    with pytest.raises(ValueError, match="hint"):
        lm.coverage_scores(df, model, hint="shuffle")
    with pytest.raises(ValueError, match="hint"):
        lm.logprob_scores(df, model, hint="shuffle")


def test_collocations_hand_case(spark):
    """Lift ranks the exclusive pair above the promiscuous one, ties break
    lexically, min_count floors hapax pairs."""
    from trafficbigdatasearch_spark.operators import lm

    # "new york" always together; "the cat"/"the dog" share a context word
    docs = spark.createDataFrame(
        [(i, "new york the cat") for i in range(3)]
        + [(10 + i, "new york the dog") for i in range(3)],
        "doc_id BIGINT, text STRING",
    )
    out = lm.collocations(docs, k=10, min_count=2).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    # bigram stream: (new,york) x6, (york,the) x6, (the,cat) x3, (the,dog) x3
    assert by_pair[("new", "york")]["n_pair"] == 6
    # lift(new york) = 18*6/(6*6) = 3.0 ; lift(the cat) = 18*3/(6*3) = 3.0
    # lift(york the) = 18*6/(6*6)... york appears as w1 6x, the as w2 6x -> 3.0
    for r in out:
        assert r["lift"] == 3.0
    # lexical tie-break makes the list deterministic
    assert [(r["w1"], r["w2"]) for r in out] == sorted(
        (r["w1"], r["w2"]) for r in out
    )


def test_collocations_min_count_floors_hapax(spark):
    from trafficbigdatasearch_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "rare pair"), (2, "common common common common")],
        "doc_id BIGINT, text STRING",
    )
    out = lm.collocations(docs, k=10, min_count=2).collect()
    assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in out}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        lm.collocations(docs, k=0)


def test_collocations_hint_auto_same_rows(spark):
    """The unigram-context joins get the module's standard hint escape
    hatch (advice r7): the explicit broadcast pin must produce identical
    rows to the 'auto' default (flipped r9 per VERDICT r8 #5 — the
    vocabulary-sized tables make AQE sizing the at-scale-correct
    default), and a bad hint raises."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "new york new york city"), (2, "new york is big")],
        "doc_id BIGINT, text STRING",
    )
    base = sorted(
        map(tuple, lm.collocations(docs, k=10, min_count=2).collect())
    )
    auto = sorted(
        map(
            tuple,
            lm.collocations(
                docs, k=10, min_count=2, hint="broadcast"
            ).collect(),
        )
    )
    assert base == auto and len(base) > 0
    with _pytest.raises(ValueError, match="hint"):
        lm.collocations(docs, k=10, hint="nope")
