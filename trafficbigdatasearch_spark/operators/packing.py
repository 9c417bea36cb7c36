"""Sequence packing for training-data pipelines: assign documents to
fixed token-budget packs (the "sample packing" step before writing
training sequences).

The reference has no such surface; this is a beyond-parity operator in the
same family as dedup/sampling.  The core is a DETERMINISTIC DISTRIBUTED
PREFIX SUM: a naive ``SUM() OVER (ORDER BY id)`` plans one global sort into
a SINGLE partition — the textbook 100 TB scale-killer for any running-total
operator.  Instead:

1. docs are assigned to fixed id-range buckets (``bucket = id // bucket_size``
   — explicit arithmetic, NOT range-partition sampling, so the layout is
   deterministic across runs/engines);
2. per-bucket token sums aggregate map-side (one small shuffle);
3. bucket offsets are an exclusive cumsum over the tiny bucket summary
   (#buckets = n_docs / bucket_size rows — a single-partition window over
   the SUMMARY is fine; that is the point of two-level prefix sums);
4. each doc's global exclusive prefix = its bucket offset (broadcast join)
   + a within-bucket cumsum window partitioned by bucket.

Every heavy stage is partition-parallel; the only single-partition work is
over the bucket summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.functions import text as T


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    bucket_size: int = 4096,
) -> DataFrame:
    """Greedy sequential packing: documents in ``id_col`` order are laid
    end-to-end on a token tape; ``pack_id`` = which ``budget``-sized pack a
    document STARTS in, ``pack_offset`` = its start position within that
    pack.  Returns (id, n_tokens, pack_id, pack_offset).

    A document may overflow its pack (n_tokens > budget - pack_offset);
    the writer downstream decides to split or pad — recording exact start
    offsets is what makes both choices implementable without re-scanning.

    ``token_col`` uses a precomputed token count; default is the
    whitespace count (:func:`functions.text.token_count`).  Output is
    invariant to ``bucket_size`` (pinned in tests) — it only tunes shuffle
    granularity — and fuzz-pinned against a sequential tape reference for
    any (budget, bucket_size, partitioning) (tests/test_oracle_fuzz.py).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be positive, got {bucket_size}")
    tok = F.col(token_col) if token_col else T.token_count(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("id"), tok.cast("bigint").alias("n_tokens")
    ).withColumn("_b", F.floor(F.col("id") / bucket_size).cast("bigint"))

    bucket_sums = base.groupBy("_b").agg(F.sum("n_tokens").alias("_bsum"))
    # exclusive cumsum over the bucket SUMMARY (tiny: n_docs/bucket_size
    # rows) — the single-partition window is on the summary by design
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_sums.select(
        "_b", F.coalesce(F.sum("_bsum").over(wb), F.lit(0)).alias("_off")
    )

    win = Window.partitionBy("_b").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    excl = F.col("_off") + F.sum("n_tokens").over(win) - F.col("n_tokens")
    return (
        base.join(F.broadcast(offsets), "_b")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.floor(excl / budget).cast("bigint").alias("pack_id"),
            (excl % budget).cast("bigint").alias("pack_offset"),
        )
    )
