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
    corp = corpus.select(
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
