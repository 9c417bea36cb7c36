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
automatically — the standard stream-static pattern).  A stream-stream
variant would add a watermark + time-range condition on both sides; the
reference's semantics (trips are complete when observations arrive) make
stream-static the faithful shape.
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
