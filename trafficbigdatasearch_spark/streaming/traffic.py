"""Streaming form of the reference's flagship query: over-speed violation
counts over a LIVE camera-observation stream.

The batch pipeline (queries/overspeed.py) maps 1:1 onto Structured
Streaming primitives:

- station bbox filter          -> unchanged static prep (broadcast dim)
- obs ⋈ stations (J1)          -> stream-static broadcast join
- obs ⋈ toll trips (J2)        -> stream-static interval join (the SAME
                                  ``join_toll_class`` helper as batch, with
                                  the event-time column carried through)
- 4-segment CASE WHEN + count  -> watermarked tumbling-window aggregate

State is bounded by the watermark; the toll side is static per micro-batch
(re-planned each batch, so a slowly-updated toll table is picked up
automatically — the standard stream-static pattern).  That is the FAITHFUL
shape for the reference's semantics (trips are complete when observations
arrive); :func:`overspeed_stream_stream` is the beyond-parity variant for
the realistic deployment where toll trips ALSO arrive as a live feed —
dual watermarks, a time-range join condition bounding both state stores,
and the containment check as a residual (VERDICT r8 #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.queries._core import (
    BBox,
    car_type_col,
    join_stations,
    join_toll_class,
    overspeed_threshold,
    station_guids,
)


def overspeed_stream(
    obs_stream: DataFrame,
    speed_base: DataFrame,
    fee_data: DataFrame,
    bbox: BBox,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed over-speed counts per vehicle segment on streaming camera
    observations.  Output: (window_start, car_type, speed_limit_num).

    ``obs_stream`` must have the parsed speed-observation schema
    (SITE_GUID, HPHM, WZSJMillis, WZSJHourOfDay, CLSD, ...); the event time
    is derived from WZSJMillis.  Semantics are fixed-mode (no file-month
    key — a stream has no file-month notion), shared with batch via the
    ``_core`` helpers so the quirk-critical logic lives once.
    """
    guids = station_guids(speed_base, bbox)
    # watermark attached to the event-time column that actually feeds the
    # windowed aggregate (downstream of the station join — stream-static
    # joins themselves need no watermark)
    speed = (
        join_stations(obs_stream, guids)
        .withColumn("event_ts", F.timestamp_millis(F.col("time")))
        .withWatermark("event_ts", watermark)
    )
    classed = join_toll_class(speed, fee_data, month_key=False, carry=["event_ts"])
    return _overspeed_windows(classed, window)


def _overspeed_windows(classed: DataFrame, window: str) -> DataFrame:
    """Shared tail of both streaming shapes: 4-segment CASE classification,
    over-speed filter, watermarked tumbling-window count."""
    return (
        classed.withColumn("car_type", car_type_col())
        .filter(
            F.col("car_type").isNotNull() & (F.col("speed") > overspeed_threshold())
        )
        .groupBy(F.window("event_ts", window).alias("w"), "car_type")
        .agg(F.count("*").alias("speed_limit_num"))
        .select(
            F.col("w.start").alias("window_start"),
            "car_type",
            "speed_limit_num",
        )
    )


def overspeed_stream_stream(
    obs_stream: DataFrame,
    toll_stream: DataFrame,
    speed_base: DataFrame,
    bbox: BBox,
    window: str = "1 hour",
    obs_watermark: str = "2 hours",
    toll_watermark: str = "2 hours",
    max_trip: str = "6 hours",
) -> DataFrame:
    """STREAM-STREAM form of the over-speed pipeline: camera observations
    AND toll-trip records both arrive as live feeds (the realistic
    deployment — trips close and publish continuously), joined with dual
    watermarks so BOTH state stores are bounded.  Output matches
    :func:`overspeed_stream`: (window_start, car_type, speed_limit_num).

    The interval join (J2, src/OverSpeedCount.scala:123) becomes a
    watermarked stream-stream inner join.  Structured Streaming can only
    evict join state when the condition RELATES the two event-time
    columns, so the batch containment ``obs.time BETWEEN en AND ex``
    splits into

    - ``obs.event_ts BETWEEN toll.en_ts AND toll.en_ts + max_trip`` — the
      state-bounding range on the two WATERMARKED columns (a toll row can
      be dropped once the obs watermark passes ``en_ts + max_trip``; an
      obs row once the toll watermark passes its ``event_ts``), and
    - ``obs.time <= toll.EXTIMEMillis`` — the exact upper containment as
      a residual predicate on the raw millis columns.

    ``max_trip`` is therefore a CORRECTNESS contract, not a hint: trips
    longer than it lose their tail observations (the join's range prunes
    them), exactly like a watermark drops later-than-horizon events.
    Size it to the road network's maximum plausible trip; the default
    6 h covers the reference's toll data.  Equality with the
    stream-static shape (and with batch) under that contract is pinned in
    tests/test_streaming.py.

    The equi key stays ``plate = ENVEHPLATE`` (quirk §2.10.5: entry plate
    only) and fixed-mode semantics (no month key — pure time containment,
    clamped by ``max_trip``).  Downstream the shared windowed aggregate
    runs as a SECOND stateful operator (append-mode chained stateful ops);
    the station filter stays a stream-static broadcast."""
    guids = station_guids(speed_base, bbox)
    speed = (
        join_stations(obs_stream, guids)
        .withColumn("event_ts", F.timestamp_millis(F.col("time")))
        .withWatermark("event_ts", obs_watermark)
    )
    toll = toll_stream.withColumn(
        "en_ts", F.timestamp_millis(F.col("ENTIMEMillis"))
    ).withWatermark("en_ts", toll_watermark)
    cond = (
        (speed["plate"] == toll["ENVEHPLATE"])
        & (speed["event_ts"] >= toll["en_ts"])
        & (speed["event_ts"] <= toll["en_ts"] + F.expr(f"INTERVAL {max_trip}"))
        & (speed["time"] <= toll["EXTIMEMillis"])
    )
    classed = speed.join(toll, cond, "inner").select(
        speed["speed"],
        speed["hour"],
        toll["EXVEHCLASS"].alias("class"),
        toll["EXTRUCKFLAG"].alias("type"),
        speed["event_ts"],
    )
    return _overspeed_windows(classed, window)
