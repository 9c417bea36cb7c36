"""Keyword search + TF-IDF ranking (operators/search.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple banana cherry apple"),
        (1, "apple apple apple"),
        (2, "banana cherry"),
        (3, "durian elderberry fig"),
        (4, "Apple BANANA"),  # case-folded matching
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_keyword_search_all_and_any(docs):
    got_all = {
        r["doc_id"]: r["n_terms_hit"]
        for r in search.keyword_search(docs, ["apple", "banana"], mode="all").collect()
    }
    assert got_all == {0: 2, 4: 2}
    got_any = {
        r["doc_id"]: r["n_terms_hit"]
        for r in search.keyword_search(docs, ["apple", "banana"], mode="any").collect()
    }
    assert got_any == {0: 2, 1: 1, 2: 1, 4: 2}
    with pytest.raises(ValueError):
        search.keyword_search(docs, [])
    with pytest.raises(ValueError):
        search.keyword_search(docs, ["x"], mode="exactly")


def test_keyword_search_plan_has_no_exchange(docs):
    plan = (
        search.keyword_search(docs, ["apple"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_tfidf_ranking(docs):
    out = search.tfidf_topk(docs, ["apple", "banana"], k=2)
    rows = {(r["term"], r["rank"]): r for r in out.collect()}
    # apple: df=3 (docs 0,1,4), N=6. doc1 tf=3 ranks first, doc0 tf=2 second
    assert rows[("apple", 1)]["doc_id"] == 1
    assert rows[("apple", 1)]["tf"] == 3 and rows[("apple", 1)]["df"] == 3
    assert rows[("apple", 1)]["score"] == pytest.approx(3 * 6 / 3)
    assert rows[("apple", 2)]["doc_id"] == 0
    # banana: tf=1 everywhere -> tie broken by ascending doc_id
    assert rows[("banana", 1)]["doc_id"] == 0
    assert rows[("banana", 2)]["doc_id"] == 2
    # k caps the per-term result
    assert len(rows) == 4


def test_tfidf_prefilters_before_explode(docs):
    # the explode input must be the filtered lambda, not the raw token array
    plan = (
        search.tfidf_topk(docs, ["apple"], k=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "filter(" in plan  # the array-level prefilter survived optimization


class TestTopNgramFold:
    """functions/text.py::top_ngram — the sorted-run-length fold must agree
    with a brute-force mode (max count, lexicographically smallest tie) on
    arbitrary token streams."""

    def test_fold_equals_bruteforce(self, spark):
        import random
        from collections import Counter

        from pyspark.sql import functions as F

        from trafficbigdatasearch_spark.functions import text as T

        rng = random.Random(7)
        vocab = ["a", "b", "c", "aa", "b c"]
        rows = []
        for i in range(200):
            n = rng.randint(0, 12)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
        df = spark.createDataFrame(rows, ["i", "txt"])
        toks = T.tokens(F.col("txt"))
        got = {
            r["i"]: (r["g"]["gram"], r["g"]["n"])
            for r in df.select(
                "i", T.top_ngram(T.word_ngrams(toks, 2)).alias("g")
            ).collect()
        }
        for i, txt in rows:
            w = txt.split()
            grams = [" ".join(w[j : j + 2]) for j in range(len(w) - 1)]
            if not grams:
                assert got[i] == ("", 0)
                continue
            c = Counter(grams)
            best_n = max(c.values())
            best_g = min(g for g, k in c.items() if k == best_n)
            assert got[i] == (best_g, best_n), f"row {i}: {txt!r}"

    def test_short_docs_empty(self, spark):
        from pyspark.sql import functions as F

        from trafficbigdatasearch_spark.functions import text as T

        df = spark.createDataFrame(
            [(0, ""), (1, "one"), (2, "two words")], ["i", "txt"]
        )
        out = {
            r["i"]: (r["g"]["gram"], r["g"]["n"], r["nb"])
            for r in df.select(
                "i",
                T.top_ngram(T.word_ngrams(T.tokens(F.col("txt")), 2)).alias("g"),
                F.size(T.word_ngrams(T.tokens(F.col("txt")), 2)).alias("nb"),
            ).collect()
        }
        assert out[0] == ("", 0, 0)
        assert out[1] == ("", 0, 0)
        assert out[2] == ("two words", 1, 1)


def test_phrase_absent_terms_empty(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import search

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = search.phrase_search(docs, ["zzzneverzz", "inanycorpus"])
    assert out.count() == 0


def test_bm25_indexed_equals_direct(spark, tmp_path):
    """bm25_indexed over the persisted index must reproduce bm25_topk
    bit-for-bit (scores included), and its posting scan must be pruned to
    the query terms' bucket partitions."""
    from trafficbigdatasearch_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "postings")
    search.build_text_index(docs, path)
    direct = sorted(
        map(tuple, search.bm25_topk(docs, ["join", "query"], k=5).collect())
    )
    indexed = sorted(
        map(tuple, search.bm25_indexed(spark, path, ["join", "query"], k=5).collect())
    )
    assert direct == indexed
    plan = search.bm25_indexed(
        spark, path, ["join", "query"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]


def test_text_index_append_equals_rebuild(spark, tmp_path):
    """text_index_append (r10, the ivf_index_append twin): build on the
    standing corpus, append a held-out batch — the merged index must answer
    BOTH bm25_indexed and phrase_search_indexed identically to a full
    rebuild over corpus ∪ batch, and the standing posting/stats files must
    be bit-untouched by the append (additive maintenance, never a
    rewrite)."""
    import os

    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    standing, batch = (
        docs.filter(F.col("doc_id") % 10 != 7),
        docs.filter(F.col("doc_id") % 10 == 7),
    )

    def files(root):
        return {
            (p, f)
            for p, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        }

    inc = str(tmp_path / "inc")
    search.build_text_index(standing, inc)
    before = files(inc) | files(inc + "_stats")
    search.text_index_append(batch, inc)
    assert before < files(inc) | files(inc + "_stats")

    full = str(tmp_path / "full")
    search.build_text_index(docs, full)
    for fn in (
        lambda p: search.bm25_indexed(spark, p, ["join", "merge", "query"], k=10),
        lambda p: search.phrase_search_indexed(spark, p, ["the", "data"]),
    ):
        got = sorted(map(tuple, fn(inc).collect()))
        want = sorted(map(tuple, fn(full).collect()))
        assert got == want and len(got) > 0


def test_bm25_robertson_idf_rank_equivalent(spark):
    """idf='robertson' (textbook ln((N-df+.5)/(df+.5)+1)) must produce the
    SAME per-term ranking as the oracle-hashable raw-ratio default (idf is
    constant within a term, so only score magnitudes differ), with
    standard-magnitude scores (smaller than N/df for df << N)."""
    import math

    from trafficbigdatasearch_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["join", "query"]
    raw = search.bm25_topk(docs, terms, k=10).collect()
    rob = search.bm25_topk(docs, terms, k=10, idf="robertson").collect()
    key = lambda r: (r["term"], r["rank"])  # noqa: E731
    assert sorted((r["term"], r["rank"], r["doc_id"]) for r in raw) == sorted(
        (r["term"], r["rank"], r["doc_id"]) for r in rob
    )
    n = docs.count()
    by_key = {key(r): r for r in raw}
    for r in rob:
        mate = by_key[key(r)]
        expected = (
            mate["score"]
            / (n / mate["df"])
            * math.log((n - mate["df"] + 0.5) / (mate["df"] + 0.5) + 1.0)
        )
        assert abs(r["score"] - expected) < 1e-9


def test_bm25_bad_idf_raises(spark):
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with _pytest.raises(ValueError, match="robertson"):
        search.bm25_topk(docs, ["join"], idf="idf2").collect()


def test_doc_keywords_hand_case(spark):
    from trafficbigdatasearch_spark.operators import search

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple common common"),
            (2, "banana banana common common common"),
            (3, "common cherry"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        (r["doc_id"], r["rank"]): r
        for r in search.doc_keywords(docs, k=2).collect()
    }
    # doc 1: apple tf=3 df=1 -> 9.0; common tf=2 df=3 -> 2.0
    assert out[(1, 1)]["term"] == "apple" and out[(1, 1)]["score"] == 9.0
    assert out[(1, 2)]["term"] == "common"
    assert out[(2, 1)]["term"] == "banana"
    # doc 3: cherry (3/1=3) beats common (3/3=1)
    assert out[(3, 1)]["term"] == "cherry"
    # every doc labeled, <= k rows each
    assert {d for d, _ in out} == {1, 2, 3}


def test_doc_keywords_guards(spark):
    import pytest as _pytest

    from trafficbigdatasearch_spark.operators import search

    docs = spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING")
    with _pytest.raises(ValueError, match="positive"):
        search.doc_keywords(docs, k=0)
    with _pytest.raises(ValueError, match="hint"):
        search.doc_keywords(docs, hint="nope")
