"""Structured Streaming surface (SURVEY.md §2.8: absent in the reference —
the `events` table is the hook).

Batch/stream symmetry is the design rule: every streaming aggregation here
has an identical batch formulation in queries/standard.py
(``time_bucket_hourly`` == ``tumbling_counts``), so results are testable
against the batch oracle and the same code serves both modes.

At scale: watermarks bound state (late data beyond the horizon is dropped);
window aggregations shuffle once on (window, keys); ``availableNow`` triggers
give batch-like backfill runs over the same queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import schemas


def read_event_stream(
    spark, path: str, fmt: str = "parquet", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream with the canonical events schema."""
    reader = spark.readStream.schema(schemas.EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + min/max — the streaming analog of the
    reference's GROUP BY hour (and of batch ``time_bucket_hourly``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("bucket"),
            "n",
            "min_v",
            "max_v",
        )
    )


def sliding_avg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-type average value."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(F.avg("value").alias("avg_v"), F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("bucket"),
            "event_type",
            "avg_v",
            "n",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) — counts and duration."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            (F.unix_millis(F.col("w.end")) - F.unix_millis(F.col("w.start"))).alias(
                "duration_ms"
            ),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup by event_id within the watermark horizon —
    the streaming twin of operators/dedup.exact: state is bounded by the
    watermark instead of growing forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich each event with a broadcast dimension row —
    the streaming twin of the batch station join (J1).  The static side is
    re-planned per micro-batch (picking up dim updates) and broadcast, so the
    stream side never shuffles for the join."""
    return events.join(F.broadcast(dim), on, "left")


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value sum, value max) maintained across
    micro-batches — the pattern for accumulators Spark's built-in windowed
    aggregations can't express (running totals over the whole stream,
    conditional state machines, per-key model state).

    State is one fixed-width row per user (bounded by key cardinality, not
    stream length); each micro-batch emits the keys it touched with their
    updated totals (output mode ``update``).  The Arrow batch boundary is the
    only Python crossing — grouped rows arrive as pandas chunks, state reads/
    writes are O(1) per key per batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, n_events bigint, total_value double, max_value double"
    )
    state_schema = "n bigint, s double, m double"

    def update(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [s],
                "max_value": [m],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_topk_events(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-user running TOP-K highest-value events via
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state API (the
    successor to ``applyInPandasWithState``): typed state handles
    (ValueState/ListState/MapState), per-state TTL, and timers, managed by
    the state store like any built-in stateful operator.

    A streaming windowed aggregate cannot maintain "the k best rows ever
    seen per key" (it would need ORDER BY over unbounded history); here
    state is EXACTLY k fixed-width rows per user — bounded by key
    cardinality × k, never stream length — and each micro-batch emits the
    refreshed top-k for the keys it touched (update semantics).  The
    merge is a pandas concat + nlargest over (k + batch) rows per touched
    key, at the Arrow batch boundary only.

    Deterministic tie-break: (value DESC, event_id ASC), so replays and
    retries rebuild identical state.

    ENVIRONMENT GATE: the transformWithState worker protocol needs
    ``protobuf`` (its state-server messages are proto-encoded); where the
    package is absent this raises immediately with the dependency named,
    instead of crashing the Python driver worker mid-query.  The
    ``applyInPandasWithState`` twin (:func:`user_running_totals`) has no
    such dependency and covers the custom-stateful pattern everywhere."""
    try:
        from google.protobuf import descriptor as _  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state-server protocol is proto-encoded); install "
            "protobuf or use user_running_totals "
            "(applyInPandasWithState) instead"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "user_id bigint, rank int, event_id bigint, value double"

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getListState(
                "topk", "event_id bigint, value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            cur = pd.DataFrame(
                [(r.event_id, r.value) for r in self._state.get()],
                columns=["event_id", "value"],
            )
            batches = [cur] + [
                pdf[["event_id", "value"]] for pdf in rows
            ]
            merged = pd.concat(batches, ignore_index=True)
            merged = merged.sort_values(
                ["value", "event_id"], ascending=[False, True]
            ).head(k)
            self._state.clear()
            self._state.appendList(
                [tuple(t) for t in merged.itertuples(index=False)]
            )
            out = merged.reset_index(drop=True)
            out.insert(0, "rank", out.index + 1)
            out.insert(0, "user_id", key[0])
            yield out[["user_id", "rank", "event_id", "value"]]

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join: attribute each purchase to the same user's
    view events within ``horizon`` before it — the canonical ad-attribution
    shape, and the one streaming join the rest of this module doesn't cover
    (dedup/enrich are stateless or stream-static).

    Both sides carry a watermark and the join condition bounds event time in
    BOTH directions (purchase in [view_ts, view_ts + horizon]), which is what
    lets the state store evict: a buffered view older than
    ``watermark + horizon`` can never match a future purchase and is dropped.
    Without the time bound the state grows with the whole stream — the
    unbounded-state trap this function exists to demonstrate avoiding.

    Batch-equivalence on a closed input is pinned in tests/test_streaming.py:
    the same condition as a static interval join (J2's shape, stream twin).
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond, "inner").select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts",
        "purchase_value",
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str | None = None):
    """Drive a streaming DataFrame to completion over the currently-available
    input (availableNow trigger) into an in-memory sink; returns the query.
    Test/backfill helper — production sinks are kafka/parquet/delta.

    ``output_mode`` defaults to "complete" for windowed aggregations and
    "append" otherwise; operators built with a fixed mode (e.g.
    ``user_running_totals`` -> "update") must pass it explicitly — the
    heuristic cannot see inside a stateful flatMapGroups operator.
    """
    if output_mode is None:
        output_mode = "complete" if _has_agg(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    return q


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def windowed_distinct_users(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Streaming distinct-user counts per tumbling window via HLL sketches —
    COUNT(DISTINCT) is not incrementally maintainable on a stream (Spark
    rejects it in streaming aggregations); a mergeable sketch is, which is
    exactly why sketch cubes (operators/sketches.py) are the scale shape.
    State per window is one ~16 KiB sketch regardless of cardinality.
    Complete/update modes work unbounded with a watermark downstream;
    tests pin the drained bounded stream equal to the batch exact counts
    (exact-phase cardinalities)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.hll_sketch_estimate(F.col("sk")).cast("bigint").alias("n_users"),
            "n_events",
        )
    )
