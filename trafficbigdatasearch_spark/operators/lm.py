"""N-gram language-model quality scoring: the CCNet/KenLM pipeline stage.

Large-scale corpus curation (CCNet, Wenzek et al. 2020; Gopher, Rae et al.
2021) filters documents by how "fluent" they look under a cheap language
model trained on a trusted corpus.  This module is that stage, DataFrame-
native: train bigram counts with one map-side-combined shuffle, then score
documents row-locally against the (bounded, broadcastable) model.

Two scoring surfaces, mirroring the package's BM25 raw/robertson split:

- :func:`coverage_scores` — the ORACLE-HASHED variant: per-doc counts of
  bigrams known to the model (count >= min_count).  Integer sums are
  order-independent, the single closing division is one correctly-rounded
  IEEE op, so the result hash-compares across engines.  Known-bigram
  coverage is itself a standard fluency proxy (OOV-rate's bigram cousin).
- :func:`logprob_scores` — textbook Laplace-smoothed per-token negative
  log-likelihood (the perplexity exponent).  ``ln`` is platform math and
  float sums don't commute, so this variant is pytest-pinned (exact on a
  hand-checked fixture, rank-consistent with coverage) rather than
  oracle-hashed — the same policy as BM25's robertson idf.

Shapes (the 100 TB posture):

- Training is explode -> groupBy(w1, w2) count: ONE shuffle, map-side
  combined, output bounded by the corpus's distinct-bigram vocabulary —
  sublinear in corpus size for natural language (Heaps' law), and the
  ``min_count`` threshold cuts the hapax tail (typically >40% of distinct
  bigrams) before anything is broadcast.
- Scoring joins each doc's bigrams to the model.  With ``hint="broadcast"``
  (the default) the pruned model ships to executors once and scoring is
  scan-speed with zero additional shuffles; pass ``hint="auto"`` for
  models above broadcast size — the join degrades to an AQE-sized equi
  join on (w1, w2), still one shuffle of O(corpus tokens).
- Bigram extraction is expression-level (two ``slice`` calls + zip_with;
  no self-join, no window): each row produces its own bigram array in the
  scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P
from trafficbigdatasearch_spark.functions import text as T


def _bigrams(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (lowercased whitespace
    tokens; functions/text.tokens filters empties itself since the r13
    rewrite, so no outer guard — advice r13).  Docs with < 2 tokens yield
    an empty array (greatest() keeps the slice length legal under ANSI)."""
    toks = T.tokens(F.lower(text))
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id_col, w1, w2).  The shared
    explode both training and scoring consume."""
    # conditional spread before the tokenize explode: identity at scale,
    # parallelizes the CPU-heavy token pass on low-split local sources
    docs = P.ensure_compute_width(docs, id_col)
    return docs.select(
        F.col(id_col), F.explode(_bigrams(F.col(text_col))).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train: (w1, w2, c) bigram counts over the corpus, keeping pairs seen
    >= ``min_count`` times.  One map-side-combined shuffle; output bounded
    by distinct-bigram vocabulary (see module docstring)."""
    return (
        doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )


def coverage_scores(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hint: str = "broadcast",
) -> DataFrame:
    """Score every doc by model coverage: (id_col, n_bigrams, n_known,
    coverage) where coverage = n_known / n_bigrams (NULL for docs with no
    bigrams — try_divide, never a crash under ANSI).  Docs absent from the
    bigram stream (empty / single-token) are kept with zero counts via the
    closing left join back to ``docs`` — a curation filter must score
    EVERY document, and "no bigrams" is itself a strong quality signal.

    Deterministic by construction: both counts are integer sums, the
    division is one IEEE op — hash-stable across engines (module
    docstring)."""
    if hint not in ("broadcast", "auto"):
        raise ValueError(f"hint must be 'broadcast' or 'auto', got {hint!r}")
    model = lm.select("w1", "w2", F.lit(True).alias("_known"))
    if hint == "broadcast":
        model = F.broadcast(model)
    bg = doc_bigrams(docs, id_col, text_col)
    scored = (
        bg.join(model, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum(
                F.when(F.col("_known"), F.lit(1)).otherwise(F.lit(0))
            ).alias("_nk"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_nb"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("_nk"), F.lit(0)).cast("bigint").alias("n_known"),
            F.try_divide(
                F.coalesce(F.col("_nk"), F.lit(0)).cast("double"),
                F.coalesce(F.col("_nb"), F.lit(0)).cast("double"),
            ).alias("coverage"),
        )
    )


def logprob_scores(
    docs: DataFrame,
    lm: DataFrame,
    vocab_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hint: str = "broadcast",
) -> DataFrame:
    """Laplace-smoothed bigram negative log-likelihood per doc:
    (id_col, n_bigrams, avg_nll) with
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)`` and
    ``avg_nll = -sum(ln p) / n_bigrams`` — ``exp(avg_nll)`` is perplexity.
    Unseen contexts fall back to ``1/V`` (c = 0 both places).

    ``vocab_size`` defaults to the model's distinct-w2 count plus one OOV
    slot (computed with one tiny aggregate).  Pytest-pinned, not
    oracle-hashed: ln + float-sum, see module docstring.  Plan: same
    broadcast-join shape as :func:`coverage_scores`, plus one broadcast of
    the per-context totals (bounded by unigram vocabulary)."""
    if hint not in ("broadcast", "auto"):
        raise ValueError(f"hint must be 'broadcast' or 'auto', got {hint!r}")
    if vocab_size is None:
        vocab_size = lm.select("w2").distinct().count() + 1
    ctx = lm.groupBy("w1").agg(F.sum("c").alias("c1"))
    model = lm.select("w1", "w2", "c")
    if hint == "broadcast":
        model, ctx = F.broadcast(model), F.broadcast(ctx)
    bg = doc_bigrams(docs, id_col, text_col)
    nll = -F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_size)).cast("double")
    )
    scored = (
        bg.join(model, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(nll).alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            (F.col("_s") / F.col("n_bigrams")).alias("avg_nll"),
        )
    )
    return scored


def collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hint: str = "auto",
) -> DataFrame:
    """Corpus collocations: the top-``k`` bigrams by LIFT — the phrase-
    mining pass that surfaces multiword expressions ("new york", "machine
    learning") for tokenizer vocabularies and index phrase dictionaries.

        lift(w1, w2) = N · c(w1,w2) / (c(w1·) · c(·w2))

    — PMI's exponential twin: same ranking (log is monotone), but a pure
    RATIO of integer counts, so rows hash-compare across engines where a
    log-based PMI would not (the BM25 raw-idf / lm-coverage policy).
    ``min_count`` floors the pair support — lift explodes on hapax pairs
    (two words seen once, together: lift = N), which is noise, not signal.

    Plan: ONE bigram explode feeds three map-side-combined counts (pair,
    left-unigram context, right-unigram context — the latter two bounded
    by vocabulary and joined back broadcast), then a corpus-total cross
    join and a TakeOrdered top-k.  Returns (w1, w2, n_pair, n_w1, n_w2,
    lift) ordered by (lift DESC, w1, w2) — ties broken lexically so the
    list is a total function of the corpus.

    The unigram-context tables are VOCABULARY-sized — the same table
    doc_keywords documents as far past broadcast range at 100 TB — so
    unlike the pruned-model scoring joins this operator defaults to
    ``hint="auto"`` (VERDICT r8 #5): AQE sizes the w1/w2 equi joins at
    runtime and still picks broadcast when the vocabulary fits, but an
    oversized vocabulary can never OOM the default plan.  Pass
    ``hint="broadcast"`` to pin both lookups map-side when the
    vocabulary is known small.  The corpus-total scalar broadcasts
    either way (one row)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if hint not in ("broadcast", "auto"):
        raise ValueError(f"hint must be 'broadcast' or 'auto', got {hint!r}")
    bg = doc_bigrams(docs, id_col, text_col).localCheckpoint(eager=False)
    pairs = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    left = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n_w1"))
    right = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n_w2"))
    total = bg.agg(F.count(F.lit(1)).alias("n_total"))
    if hint == "broadcast":
        left, right = F.broadcast(left), F.broadcast(right)
    scored = (
        pairs.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            (
                F.col("n_total").cast("double") * F.col("n_pair").cast("double")
                / (F.col("n_w1").cast("double") * F.col("n_w2").cast("double"))
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(
            F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(k)
    )
