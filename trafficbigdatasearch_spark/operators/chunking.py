"""Document chunking for training-data pipelines.

Beyond-reference surface (the reference has no text ops): split every
document into fixed-token-budget, optionally-overlapping chunks — the
context-window preprocessing step between raw corpus and sequence packing
(see operators/packing.py for the downstream step).

Shape: one projection computes the token array ONCE, a ``sequence`` of
chunk start offsets fans out via ``posexplode``, and each chunk re-joins
its token slice — all pure Catalyst expressions, no UDF, no shuffle.  At
100 TB this runs at scan speed and parallelizes per input split; the output
is ~(1 + overlap/stride)x the input tokens, and chunk rows inherit the
scan's partitioning (no exchange is introduced).

Determinism: chunk membership and ids depend only on (text, chunk_tokens,
stride) — reproducible across engines, retries, and repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.functions import text as T


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token chunks of ``chunk_tokens``
    tokens, consecutive chunks overlapping by ``overlap`` tokens.

    Returns (id_col, chunk_id, chunk_text, n_tokens):

    - ``chunk_id``: 0-based dense index of the chunk within its document;
    - ``chunk_text``: the space-joined token slice;
    - ``n_tokens``: actual tokens in the chunk (< chunk_tokens only for the
      final chunk of a document);
    - tokenless documents (empty/whitespace-only text) produce ZERO rows —
      the chunker is also the degenerate-doc filter.

    Starts are ``0, stride, 2*stride, ...`` while ``start < n_tokens``, so
    every token belongs to at least one chunk and no chunk is empty.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col),
        T.tokens(F.col(text_col)).alias("_t"),
    ).filter(F.size("_t") > 0)
    starts = F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
    return toks.select(
        F.col(id_col),
        F.col("_t"),
        F.posexplode(starts).alias("chunk_id", "_s"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("_t"), F.col("_s") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.size("_t") - F.col("_s")
        ).cast("bigint").alias("n_tokens"),
    )
