"""Compute-width partitioning: keep CPU-heavy stages at the session's
shuffle width.

AQE's partition coalescing sizes post-shuffle partitions by BYTES
(``advisoryPartitionSizeInBytes`` / ``minPartitionSize``).  That is the
right cost model for shuffle-bound stages, but the tokenize + shingle +
minhash and GEMM stages of this engine cost CPU *per row* that is orders
of magnitude above their byte footprint: a ~1 MB post-shuffle frame of
(id, text) rows carries seconds of downstream hashing.  Under the byte
model AQE coalesces such an exchange to ONE partition and serializes the
most expensive stage of the plan onto one core while the rest of the
session idles (measured in the r13 stage ledger: every dedup/text row ran
its signature stage at n=1; spreading decontaminate_fuzzy measured
4.69 -> 2.77 s min-of-3 interleaved at sf0.1, identical output).

Two levers, both scale-parameterised (optimization guide §2.5 input
parallelism, §1.2 "fix the distributed algorithm first"):

- :func:`spread` — for exchanges the operator ALREADY pays (the shared
  shingle/term/band exchanges): pass the partition count EXPLICITLY.
  A user-specified count opts that one exchange out of AQE coalescing;
  the value is the session's configured shuffle width, so cluster
  deployments (``spark.sql.shuffle.partitions`` in the thousands) keep
  their sizing — nothing is tuned to the local harness.
- :func:`ensure_compute_width` — for CPU-heavy derivations that have NO
  exchange today (corpus tokenization feeding a checkpoint or broadcast
  build): add one ONLY when the input's physical parallelism is below the
  session width.  At scale the scan itself provides the width and the
  text payload must not be reshuffled just to tokenize — the helper is an
  identity there; locally (single-row-group files) it is the difference
  between 1 busy core and all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_width(df: DataFrame) -> int:
    """The session's configured shuffle width — the pre-AQE partition count
    every plain exchange gets.  32 under the local harness, thousands under
    the documented cluster profile (SCALING.md)."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition on ``key_cols`` at the session's shuffle width with
    an EXPLICIT partition count, so AQE cannot coalesce the exchange below
    the width of the cluster.  Use for the one shared exchange feeding
    CPU-heavy per-row work; same exchange the keyed ``repartition(col)``
    already paid, minus the byte-model coalesce."""
    return df.repartition(compute_width(df), *[F.col(c) for c in key_cols])


def ensure_compute_width(df: DataFrame, *key_cols: str) -> DataFrame:
    """:func:`spread`, but ONLY when ``df``'s physical parallelism is below
    the session width (single-row-group local files; a coalesced upstream).
    Identity when the input is already wide — at 100 TB the scan supplies
    the parallelism and the payload is not reshuffled."""
    if df.isStreaming:
        # no static partition count to probe (.rdd is illegal on a stream);
        # micro-batch parallelism is the source's / state shuffle's concern
        return df
    n = compute_width(df)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in key_cols])
