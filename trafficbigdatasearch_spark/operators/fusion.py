"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result lists.

The reference's retrieval surface is single-modality (predicate search over
traffic records, `/root/reference/src/AccidentStatistics.scala:53-108`); a
curation pipeline at 100 TB needs the modern two-leg shape — a LEXICAL leg
(BM25 over an inverted index, operators/search.py) and a VECTOR leg (ANN
over an embedding column, operators/similarity.py) — fused into one ranking.
RRF (Cormack, Clarke & Buettcher, SIGIR'09) is the standard score-free
fusion: each leg contributes ``1 / (k0 + rank)`` for every doc it returns,
docs missing from a leg contribute nothing, and the fused order is the sum.
Score-free matters operationally: BM25 scores and cosine similarities live
on incomparable scales, so rank fusion needs no per-leg calibration.

Shapes (the 100 TB posture):

- Each leg is already a top-k result (k « corpus), so everything here is
  k-sized: the fusion join touches at most ``len(legs) * k`` rows no matter
  how big the corpus is.  The expensive work happened inside the legs, each
  of which has its own at-scale story (partition-pruned postings for BM25,
  IVF cell pruning for ANN).
- The fused score is a FIXED-ORDER chain of ``coalesce(1/(k0+rank), 0)``
  additions — one term per leg in declared leg order, never a float SUM
  aggregate — so the result is a deterministic IEEE op sequence that
  hash-compares across engines (the registry oracle requirement; same
  policy as vectors.py's quantized cosine).
- The per-doc lexical score in :func:`bm25_bag_scores` follows the same
  rule: per-term BM25 scores are PIVOTED to columns and added in the fixed
  term-list order, not SUM-aggregated, because float addition does not
  commute bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import search, similarity


def bm25_bag_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf: str = "raw",
) -> DataFrame:
    """Per-DOC bag-of-terms BM25: the sum of the query's per-term BM25
    scores for each doc that matches at least one term — the standard
    multi-term document score (per-term scoring is search.bm25_topk's
    surface).  Returns (id_col, score).

    Implementation: one :func:`search.bm25_scores` pass (tokenize once,
    one (term, doc) shuffle), then a PIVOT on the literal term list and a
    fixed-order coalesce-add — a groupBy on id_col whose output is one row
    per matching doc.  The pivot width is len(terms) (a user query, not
    data-sized), so the plan stays a single map-side-combinable aggregate;
    the fixed addition order is what makes the float sum reproducible
    bit-for-bit in any engine (see module docstring).

    ``terms`` is validated up front (the rrf_fuse duplicate-name
    contract): a duplicated term would silently double-count its pivot
    column in the sum, and the pivot columns are prefixed so a term that
    happens to equal ``id_col`` cannot collide into an ambiguous column
    reference."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate terms: {terms}")
    bad = [t for t in terms if "`" in t]
    if bad:
        # the _t_ prefix fixes id_col collisions, but a backtick inside a
        # term would break out of the backtick-quoted pivot-column
        # reference below with an opaque analysis error (ADVICE r8)
        raise ValueError(f"terms must not contain backticks: {bad}")
    scored = search.bm25_scores(docs, terms, k1, b, id_col, text_col, idf)
    pivoted = (
        scored.withColumn("term", F.concat(F.lit("_t_"), F.col("term")))
        .groupBy(id_col)
        .pivot("term", [f"_t_{t}" for t in terms])
        .agg(F.max("score"))
    )
    total = F.lit(0.0)
    for t in terms:
        total = total + F.coalesce(F.col(f"`_t_{t}`"), F.lit(0.0))
    return pivoted.select(F.col(id_col), total.alias("score"))


def ranked_leg(scores: DataFrame, k: int, id_col: str) -> DataFrame:
    """(id, score) -> the top-``k`` (id, rank) list RRF consumes.  Rank is
    dense in retrieval order: score DESC, id ASC tie-break (the package-wide
    tie contract, similarity._topk_per_query's).

    The cut is ``orderBy().limit(k)`` FIRST — Spark plans that as
    TakeOrderedAndProject (per-partition heap + k-sized merge, no global
    sort, no corpus-wide single-partition exchange) — and only then a
    row_number window over the k survivors to materialize ranks.  A bare
    unpartitioned window here would drag every matching doc through one
    partition; this shape keeps the leg scalable even for stop-word-ish
    terms that match much of the corpus."""
    top = scores.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(id_col, "rank")
    )


def rrf_fuse(
    legs: list[tuple[str, DataFrame]],
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse named ranked legs by reciprocal-rank fusion.

    ``legs`` is an ORDERED list of (name, df) where each df has (id_col,
    rank_col); order fixes the float-addition sequence, so callers get
    bit-identical scores for the same leg order.  Returns one row per doc
    appearing in >= 1 leg: (id_col, rank_<name>... , rrf_score, rank) with
    rank = row_number over (rrf_score DESC, id ASC).

    The legs are chained with full-outer joins on id — correct for rank
    fusion (a doc keeps its contribution from every leg it appears in) and
    cheap by construction: every leg is k-sized, so even the outer-join
    chain is k-sized and never a scale concern.  ``k0=60`` is the
    literature default; larger k0 flattens the head weight."""
    if not legs:
        raise ValueError("legs must be non-empty")
    names = [n for n, _ in legs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate leg names: {names}")
    fused = None
    for name, leg in legs:
        sel = leg.select(
            F.col(id_col), F.col(rank_col).alias(f"rank_{name}")
        )
        fused = sel if fused is None else fused.join(sel, id_col, "full_outer")
    score = F.lit(0.0)
    for name in names:
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(k0).cast("double") + F.col(f"rank_{name}")),
            F.lit(0.0),
        )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def hybrid_topk(
    docs: DataFrame,
    vectors: DataFrame,
    terms: list[str],
    query_vec_id: int,
    k: int = 20,
    leg_k: int = 50,
    k0: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end hybrid retrieval: BM25 bag-of-terms leg over ``docs`` +
    exact-cosine vector leg over ``vectors`` (query = the stored vector
    with ``query_vec_id``, linking doc ids to vec ids by equality), fused
    with RRF and cut to the top ``k``.

    Output: (id_col, rank_lex, rank_vec, rrf_score, rank) — per-doc leg
    ranks kept for explainability (which leg surfaced this doc?).  The
    brute-force vector leg is the small-SF baseline; at scale swap in
    similarity.ivf_topk_indexed — any (id, rank) leg slots into
    :func:`rrf_fuse` unchanged, which is the point of rank fusion."""
    lex = ranked_leg(bm25_bag_scores(docs, terms, id_col=id_col,
                                     text_col=text_col), leg_k, id_col)
    vec = (
        similarity.brute_force_topk(
            vectors,
            vectors.filter(F.col(vec_id_col) == query_vec_id),
            k=leg_k,
            id_col=vec_id_col,
            vec_col=vec_col,
        )
        .select(F.col("neighbor_id").alias(id_col), "rank")
    )
    fused = rrf_fuse([("lex", lex), ("vec", vec)], k0=k0, id_col=id_col)
    return fused.filter(F.col("rank") <= k)
