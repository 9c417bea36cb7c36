"""Idempotent streaming sinks via foreachBatch.

Structured Streaming's file sink is append-only; the production shape for
maintaining a QUERYABLE partitioned table from a stream (the reference's
month-partitioned layout, fed continuously instead of by monthly drops) is
``foreachBatch`` + partition-scoped overwrite: each micro-batch rewrites
exactly the partitions it touches, so a batch REPLAY after a failure
rewrites the same partitions with the same rows — effectively-once output
on top of the checkpoint's exactly-once batch ids.

Two pieces:

- :func:`foreach_batch_upsert` — the writer: per batch, dynamic partition
  overwrite of the touched partitions (sources/parquet.py::upsert_partitions
  under the hood).  Idempotence contract: the batch->partition mapping must
  be deterministic, which holds for event-time-partitioned data (the batch
  carries the same rows on replay) — NOT for processing-time partitions.
- :func:`foreach_batch_merge_partials` — the incremental-aggregation
  marriage: per batch, collapse the delta to mergeable exact partials
  (operators/incremental.py) and upsert them into a partial-state table
  keyed by (group, batch partition); readers merge+finalize at query time.
  This keeps per-key state OUT of the streaming state store (no watermark
  eviction pressure) while queries still see every event exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.sources.parquet import upsert_partitions


def foreach_batch_upsert(
    path: str,
    partition_by: list[str],
):
    """Return a ``foreachBatch`` function that upserts each micro-batch
    into a partitioned parquet table at ``path``, overwriting only the
    partitions the batch touches.  Use:

        stream.writeStream.foreachBatch(foreach_batch_upsert(p, ["d"]))
              .option("checkpointLocation", cp).start()
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, path, partition_by)

    return _write


def foreach_batch_merge_partials(
    path: str,
    keys: list[str],
    value_cents_col: str,
):
    """Return a ``foreachBatch`` function that maintains a mergeable
    partial-aggregate table: each batch is collapsed to (keys..., _n,
    _sum_c, _min_c, _max_c) partials and written under its batch id, so
    replayed batches overwrite their own partials (idempotent) and a
    query-time ``merge_partials`` + ``finalize`` over the table equals a
    full rescan of every event ever seen.  ``value_cents_col`` names an
    already-integer cents column in the stream."""
    from trafficbigdatasearch_spark.operators import incremental as I

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = I.partial_aggregate(
            batch_df, keys, F.col(value_cents_col)
        ).withColumn("_batch_id", F.lit(batch_id))
        upsert_partitions(part, path, ["_batch_id"])

    return _write
