"""Test-set decontamination for training-data pipelines.

Beyond-reference surface: flag (and drop) training documents that share
word n-grams with a benchmark/eval set — the standard pre-training hygiene
step that keeps evaluation data out of the training corpus.

Shape (the 100 TB posture): the benchmark side is always tiny relative to
the corpus (eval suites are MBs; the corpus is TBs), so its DISTINCT
shingle set is **broadcast** — the corpus is scanned once, each document's
distinct shingles probe the broadcast hash set, and the per-document hit
count folds map-side.  The only exchange in the plan is the benchmark-side
distinct (small) plus the final per-document aggregate on ``id_col`` —
the corpus text itself never shuffles.

Matching is by full shingle string. Overlap counts DISTINCT shingles (a
benchmark 8-gram repeated 5x in one doc counts once), which makes the
score a set-overlap measure, robust to repetition spam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P
from trafficbigdatasearch_spark.functions import text as T


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """DISTINCT word n-gram shingles of the benchmark set -> one column
    ``s``.  Small by construction; callers broadcast it."""
    return (
        benchmark.select(
            F.explode(
                F.array_distinct(T.word_shingles(F.col(text_col), n))
            ).alias("s")
        )
        .filter(F.col("s") != "")
        .distinct()
    )


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document contamination: (id_col, n_hits) where ``n_hits`` is the
    number of DISTINCT benchmark ``n``-gram shingles occurring in the
    document.  Documents with zero hits are absent (inner probe join) —
    at corpus scale the result is a small exception list, not a full-corpus
    annotation."""
    bench = F.broadcast(benchmark_shingles(benchmark, text_col, n))
    # conditional spread before the shingle explode: identity at scale
    # (the corpus is never reshuffled — the scan supplies the width), but
    # a low-split local source otherwise tokenizes on one core
    corp = P.ensure_compute_width(corpus.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(T.word_shingles(F.col(text_col), n))).alias("s"),
    )
    return (
        corp.join(bench, "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus documents with >= ``min_hits`` distinct benchmark
    shingles: a broadcast left-anti join against the flagged-id list, so
    the corpus passes through with no shuffle."""
    flagged = contamination_scores(corpus, benchmark, id_col, text_col, n).filter(
        F.col("n_hits") >= min_hits
    )
    return corpus.join(
        F.broadcast(flagged.select(id_col)), id_col, "left_anti"
    )


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    n: int = 5,
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    text_col: str = "text",
    exclude_same_id: bool = False,
) -> DataFrame:
    """NEAR-duplicate train/test contamination: (id_col, bench_id, shared,
    size_a, size_b, jaccard) for every (corpus doc, benchmark doc) pair
    whose DISTINCT ``n``-gram shingle sets overlap at Jaccard >=
    ``threshold`` — the paraphrase/partial-copy leakage that
    :func:`contamination_scores`' absolute hit counter underweights for
    long documents (100 shared shingles is decisive for a 120-shingle doc
    and noise for a 12 000-shingle one; Jaccard normalizes).

    Same posture as the exact scorer: everything benchmark-sized ships
    BROADCAST (postings for candidate generation, whole shingle sets for
    the verify), candidates exist only for docs sharing >= 1 shingle, and
    the verify is one row-local ``array_intersect`` per candidate — the
    corpus text never shuffles.

    Corpus and benchmark ids are INDEPENDENT namespaces by default: a
    coincidental id collision across the two tables is a genuine
    contamination pair and is reported.  Pass ``exclude_same_id=True``
    only when the benchmark is literally carved from the corpus (shared
    id space, as in the registry fixture) so a document is not flagged
    as contaminating itself."""
    def _sets(df, idc):
        # tokenize+shingle at the session's compute width: the projection
        # is narrow (id, text) but hash-CPU-heavy, and a low-split local
        # source otherwise serializes it (and every stage downstream of
        # the csets checkpoint, which inherits the partitioning) onto one
        # core.  Conditional spread: identity when the scan is already
        # wide, so at scale the corpus text is NOT reshuffled (measured
        # 4.69 -> 2.77 s min-of-3 interleaved at sf0.1; partitioning.py).
        return P.ensure_compute_width(df.select(idc, text_col), idc).select(
            F.col(idc).alias("_id"),
            F.array_distinct(
                F.filter(
                    T.word_shingles(F.col(text_col), n),
                    lambda s: s != F.lit(""),
                )
            ).alias("_sh"),
        )

    bsets = _sets(benchmark, bench_id_col).withColumnRenamed(
        "_id", "_bid"
    ).withColumnRenamed("_sh", "_bsh")
    bpost = bsets.select("_bid", F.explode("_bsh").alias("_s"))
    # TWO consumers read the corpus shingle sets (candidate generation's
    # explode and the verify join), and no ReusedExchange bridges them,
    # so the corpus tokenize+shingle+distinct re-evaluated per consumer.
    # One lazy localCheckpoint pins it to a single computation — measured
    # 5.68 -> 3.30 s (1.72x) min-of-3 warm at sf0.1 (SCALING.md r12
    # multi-consumer audit).  The benchmark-side twin (bsets) stays
    # uncheckpointed: it is eval-suite-sized and broadcast, so its second
    # tokenization is noise.
    csets = _sets(corpus, id_col).localCheckpoint(eager=False)
    cand = csets.select("_id", F.explode("_sh").alias("_s")).join(
        F.broadcast(bpost), "_s"
    )
    if exclude_same_id:
        cand = cand.filter(F.col("_id") != F.col("_bid"))
    cand = cand.select("_id", "_bid").distinct()
    # the verify join back to the corpus shingle sets: cand is
    # contamination-bounded (the operator's documented candidate bound),
    # so it is the BROADCAST side — explicitly, because without the hint
    # this inner join degrades to a sort-merge shuffle of the corpus
    # shingle arrays past broadcast size (r9 broadcast-direction audit;
    # BuildLeft is valid for inner joins), violating the corpus-never-
    # shuffles contract the docstring states
    scored = (
        F.broadcast(cand).join(csets, "_id")
        .join(F.broadcast(bsets), "_bid")
        .select(
            F.col("_id").alias(id_col),
            F.col("_bid").alias("bench_id"),
            F.size(F.array_intersect("_sh", "_bsh"))
            .cast("bigint")
            .alias("shared"),
            F.size("_sh").cast("bigint").alias("size_a"),
            F.size("_bsh").cast("bigint").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold)


def decontaminate_fuzzy(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    n: int = 5,
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    text_col: str = "text",
    exclude_same_id: bool = False,
) -> DataFrame:
    """Drop corpus documents near-duplicating ANY benchmark document at
    shingle-Jaccard >= ``threshold`` — one anti join on the flagged ids
    after :func:`fuzzy_contamination_pairs` (see there for the
    ``exclude_same_id`` namespace contract)."""
    flagged = fuzzy_contamination_pairs(
        corpus,
        benchmark,
        threshold,
        n,
        id_col,
        bench_id_col,
        text_col,
        exclude_same_id,
    ).select(id_col).distinct()
    return corpus.join(flagged, id_col, "left_anti")


def semantic_contamination_pairs(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC decontamination (r10) — the embedding-space member of the
    family: flag corpus items whose embedding is near ANY benchmark item's
    at cosine >= ``threshold``, catching the paraphrased/reworded leakage
    the n-gram members (:func:`contamination_scores` exact,
    :func:`fuzzy_contamination_pairs` shingle-Jaccard) structurally miss —
    the standard third rail of pre-training hygiene.

    Same 100 TB shape as the rest of the module: the benchmark side is
    tiny (eval suites), so its quantized vectors BROADCAST; the corpus is
    scanned once and each row scores against the broadcast set map-side —
    the corpus never shuffles and the result is a small exception list.
    Per-pair cost is one integer dot + one closing IEEE chain (the
    similarity module's determinism contract), so rows hash-compare across
    engines.  Compute is O(|corpus|·|bench|) dots with zero exchanges —
    the right trade while |bench| is thousands; past that, prefilter the
    corpus side with IVF cells against bench-derived centroids (the
    ``blocks`` pattern of ``margin_bitext_pairs``) before exact scoring.

    Returns (id_col, bench_id_col, cosine).  Same-id pairs are NOT
    excluded: benchmark rows physically present in the corpus are the
    most literal contamination there is.
    """
    from trafficbigdatasearch_spark.operators.similarity import _with_quantized
    from trafficbigdatasearch_spark.functions import vectors as V

    c = _with_quantized(corpus_emb, vec_col, "cv", "cn").select(
        F.col(id_col), "cv", "cn"
    )
    b = _with_quantized(bench_emb, vec_col, "bv", "bn").select(
        F.col(bench_id_col), "bv", "bn"
    )
    return (
        c.crossJoin(F.broadcast(b))
        .select(
            id_col,
            bench_id_col,
            V.cosine_from_parts(
                V.dot(F.col("cv"), F.col("bv")), F.col("cn"), F.col("bn")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def decontaminate_semantic(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drop corpus rows semantically near ANY benchmark row — one anti
    join on the ids flagged by :func:`semantic_contamination_pairs`."""
    flagged = semantic_contamination_pairs(
        corpus_emb, bench_emb, threshold, id_col, bench_id_col, vec_col
    ).select(id_col).distinct()
    return corpus_emb.join(flagged, id_col, "left_anti")
