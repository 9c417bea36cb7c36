"""Hybrid retrieval / RRF fusion (operators/fusion.py).

The end-to-end hybrid row is oracle-verified through the registry
(text_hybrid_rrf); these tests pin the fusion arithmetic on hand-sized
inputs, the leg contracts, and the scale-shape of the leg cut.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import fusion, search


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, rank BIGINT")


def test_rrf_hand_checked(spark):
    # leg A ranks docs 1,2,3; leg B ranks 2,3,4.  k0 = 60.
    a = _leg(spark, [(1, 1), (2, 2), (3, 3)])
    b = _leg(spark, [(2, 1), (3, 2), (4, 3)])
    out = {
        r["doc_id"]: r
        for r in fusion.rrf_fuse([("a", a), ("b", b)], k0=60).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 2: 1/(60+2) + 1/(60+1)
    assert out[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=0)
    # doc 1: only leg A -> 1/(60+1); missing leg contributes exactly 0
    assert out[1]["rrf_score"] == 0.0 + 1 / 61 + 0.0
    assert out[1]["rank_b"] is None
    # fused order: doc 2 (both legs, high) first
    assert out[2]["rank"] == 1


def test_rrf_tie_breaks_on_id(spark):
    # docs 5 and 9 get identical contributions -> id ascending wins
    a = _leg(spark, [(9, 1), (5, 1)])
    out = sorted(
        fusion.rrf_fuse([("a", a)]).collect(), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in out] == [5, 9]


def test_rrf_rejects_bad_legs(spark):
    with pytest.raises(ValueError, match="non-empty"):
        fusion.rrf_fuse([])
    leg = _leg(spark, [(1, 1)])
    with pytest.raises(ValueError, match="duplicate"):
        fusion.rrf_fuse([("x", leg), ("x", leg)])


def test_bag_scores_sum_per_term_scores(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["join", "query"]
    per_term = search.bm25_scores(docs, terms)
    expect = {}
    for row in per_term.collect():
        expect.setdefault(row["doc_id"], {})[row["term"]] = row["score"]
    got = {
        r["doc_id"]: r["score"]
        for r in fusion.bm25_bag_scores(docs, terms).collect()
    }
    assert set(got) == set(expect)
    for doc, by_term in expect.items():
        # fixed addition order: 0.0 + join + query
        want = 0.0 + by_term.get("join", 0.0) + by_term.get("query", 0.0)
        assert got[doc] == want


def test_ranked_leg_is_take_ordered(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = fusion.bm25_bag_scores(docs, ["join"])
    leg = fusion.ranked_leg(scores, 10, "doc_id")
    # the corpus-sized cut must plan as TakeOrderedAndProject, not a
    # global single-partition sort or an unpartitioned corpus-wide window
    plan = leg._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = leg.collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))


def test_hybrid_topk_leg_provenance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = fusion.hybrid_topk(
        docs, emb, ["join", "merge"], query_vec_id=0, k=15, leg_k=20
    ).collect()
    assert 0 < len(out) <= 15
    # every fused row names at least one source leg
    assert all(
        r["rank_lex"] is not None or r["rank_vec"] is not None for r in out
    )
    # ranks are dense from 1
    assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))


def test_bag_scores_validates_terms(spark, sf_dir):
    """Review (advice r7): duplicate terms double-count their pivot column
    and must raise (the rrf_fuse duplicate-name contract); empty term
    lists raise; and a term equal to id_col scores fine — the _t_ pivot
    prefix prevents the ambiguous-column collision."""
    import pytest as _pytest

    from trafficbigdatasearch_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError, match="duplicate terms"):
        fusion.bm25_bag_scores(docs, ["join", "join"])
    with _pytest.raises(ValueError, match="non-empty"):
        fusion.bm25_bag_scores(docs, [])
    clash = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("doc_id prefix "), F.col("text")).alias("text"),
    )
    out = fusion.bm25_bag_scores(clash, ["doc_id", "prefix"]).collect()
    assert len(out) > 0 and all(r["score"] > 0 for r in out)
    # a backtick inside a term would break out of the backtick-quoted
    # pivot column reference with an opaque analysis error (advice r8) —
    # rejected up front alongside the empty/duplicate checks
    with _pytest.raises(ValueError, match="backtick"):
        fusion.bm25_bag_scores(docs, ["join", "a`b"])
