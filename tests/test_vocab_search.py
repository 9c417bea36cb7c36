"""Unit semantics for operators/vocab.py (build/encode), search.bm25_topk,
and spatial.point_in_convex_polygon_join — cross-engine registry parity
(text_vocab_encode, text_bm25_topk, j_point_in_polygon) is covered by
test_entry_correctness; these pin hand-checkable behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import search, spatial, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: bigint, text: string"
    )


def test_vocab_rank_order_and_ties(spark):
    # freq desc, then token asc on ties
    docs = _docs(spark, ["b b b a a c", "a c"])
    v = {r["token"]: (r["token_id"], r["freq"])
         for r in vocab.build_vocab(docs, vocab_size=10).collect()}
    assert v == {"a": (0, 3), "b": (1, 3), "c": (2, 2)}


def test_vocab_size_and_min_freq(spark):
    docs = _docs(spark, ["a a b b c"])
    v = vocab.build_vocab(docs, vocab_size=1, min_freq=2)
    rows = v.collect()
    assert len(rows) == 1 and rows[0]["token"] == "a"


def test_encode_positions_and_oov(spark):
    docs = _docs(spark, ["a b zz a"])
    v = vocab.build_vocab(docs, vocab_size=10, min_freq=2)  # only 'a' qualifies
    enc = sorted(
        (r["pos"], r["token_id"])
        for r in vocab.encode_docs(docs, v).collect()
    )
    assert enc == [(0, 0), (1, -1), (2, -1), (3, 0)]


def test_vocab_rejects_bad_size(spark):
    with pytest.raises(ValueError, match="vocab_size"):
        vocab.build_vocab(_docs(spark, ["a"]), vocab_size=0)


def test_bm25_length_normalization(spark):
    # same tf for 'x' in a short and a long doc: the short doc must score
    # higher under b=0.75 (tfidf would tie them)
    docs = _docs(spark, ["x y", "x " + "filler " * 50])
    out = {r["doc_id"]: r["score"]
           for r in search.bm25_topk(docs, ["x"], k=10).collect()}
    assert out[0] > out[1]


def test_bm25_saturation(spark):
    # 10x the tf must yield far less than 10x the score (k1 saturation)
    docs = _docs(spark, ["x a a a", "x x x x x x x x x x a a a a a a"])
    out = {r["doc_id"]: r["score"]
           for r in search.bm25_topk(docs, ["x"], k=10).collect()}
    assert out[1] < 4 * out[0]


def test_bm25_rank_and_k(spark):
    docs = _docs(spark, ["q q q", "q q pad pad", "q pad pad pad", "pad"])
    rows = search.bm25_topk(docs, ["q"], k=2).collect()
    assert len(rows) == 2
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [0, 1]


def _pts(spark, pts):
    return spark.createDataFrame(pts, "id: bigint, x: bigint, y: bigint")


_SQUARE = [(10, [(0, 0), (10, 0), (10, 10), (0, 10)])]


def test_pip_inside_outside_boundary(spark):
    pts = _pts(spark, [(1, 5, 5), (2, 15, 5), (3, 10, 5), (4, 0, 0)])
    got = {(r["id"], r["polygon_id"])
           for r in spatial.point_in_convex_polygon_join(pts, _SQUARE).collect()}
    # interior, boundary edge, and vertex are inside; exterior is not
    assert got == {(1, 10), (3, 10), (4, 10)}


def test_pip_overlapping_zones(spark):
    zones = _SQUARE + [(20, [(5, 0), (15, 0), (15, 10), (5, 10)])]
    pts = _pts(spark, [(1, 7, 5)])
    got = sorted(
        r["polygon_id"]
        for r in spatial.point_in_convex_polygon_join(pts, zones).collect()
    )
    assert got == [10, 20]


def test_pip_rejects_degenerate(spark):
    pts = _pts(spark, [(1, 0, 0)])
    with pytest.raises(ValueError, match="vertices"):
        spatial.point_in_convex_polygon_join(pts, [(1, [(0, 0), (1, 1)])])
    with pytest.raises(ValueError, match="non-empty"):
        spatial.point_in_convex_polygon_join(pts, [])


def test_oov_rates_per_group(spark):
    """oov_rates (r10): per-group token totals and OOV counts against an
    explicit vocabulary; a vocabulary built on the same corpus at
    min_freq=1 and full size reports zero OOV everywhere."""
    from trafficbigdatasearch_spark.operators import vocab as VB

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta alpha"),
            (2, "en", "alpha gamma"),
            (3, "de", "delta delta epsilon"),
        ],
        "doc_id bigint, lang string, text string",
    )
    v = spark.createDataFrame(
        [("alpha", 0), ("beta", 1), ("delta", 2)], "token string, token_id int"
    )
    out = {r["lang"]: r for r in VB.oov_rates(docs, v).collect()}
    assert (out["en"]["n_tokens"], out["en"]["n_oov"]) == (5, 1)   # gamma
    assert out["en"]["oov_rate"] == 0.2
    assert (out["de"]["n_tokens"], out["de"]["n_oov"]) == (3, 1)   # epsilon
    full = VB.build_vocab(docs, vocab_size=100, min_freq=1)
    zero = VB.oov_rates(docs, full).collect()
    assert all(r["n_oov"] == 0 and r["oov_rate"] == 0.0 for r in zero)


def test_vocab_coverage_curve_hand_case(spark):
    from trafficbigdatasearch_spark.operators import vocab

    # tokens: a x6, b x3, c x1 -> total 10; top-1 covers 0.6, top-2 0.9
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b b c")], "doc_id: bigint, text: string"
    )
    rows = {
        r["v"]: r.asDict()
        for r in vocab.coverage_curve(docs, checkpoints=(1, 2, 3, 100)).collect()
    }
    assert rows[1]["covered_tokens"] == 6 and rows[1]["coverage"] == 0.6
    assert rows[2]["covered_tokens"] == 9 and rows[2]["coverage"] == 0.9
    assert rows[3]["covered_tokens"] == 10 and rows[3]["coverage"] == 1.0
    # checkpoint beyond vocab size saturates at 1.0
    assert rows[100]["coverage"] == 1.0
    assert all(r["total_tokens"] == 10 for r in rows.values())


def test_vocab_coverage_curve_monotone(spark, sf_dir):
    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import vocab

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        vocab.coverage_curve(docs).collect(), key=lambda r: r["v"]
    )
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)  # monotone non-decreasing in v
    assert all(0 < c <= 1 for c in covs)
