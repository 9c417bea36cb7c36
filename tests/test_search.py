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
