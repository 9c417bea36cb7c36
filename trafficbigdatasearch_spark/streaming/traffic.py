"""Streaming form of the reference's flagship query: over-speed violation
counts over a LIVE camera-observation stream.

The batch pipeline (queries/overspeed.py) maps 1:1 onto Structured
Streaming primitives:

- station bbox filter          -> unchanged static prep (broadcast dim)
- obs ⋈ stations (J1)          -> stream-static broadcast join
- obs ⋈ toll trips (J2)        -> stream-static interval join (equi plate
                                  key + containment residual, same plan)
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
    is derived from WZSJMillis.
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
    threshold = F.when(F.col("car_type") == "04", 100).otherwise(120)
    return (
        classed_with_ts(speed, fee_data)
        .withColumn("car_type", car_type_col())
        .filter(F.col("car_type").isNotNull() & (F.col("speed") > threshold))
        .groupBy(F.window("event_ts", window).alias("w"), "car_type")
        .agg(F.count("*").alias("speed_limit_num"))
        .select(
            F.col("w.start").alias("window_start"),
            "car_type",
            "speed_limit_num",
        )
    )


def classed_with_ts(speed: DataFrame, fee: DataFrame) -> DataFrame:
    """join_toll_class (J2) carrying the event-time column through for the
    windowed aggregate: equi plate key + containment residual, fixed-mode
    semantics (no month key — the stream has no file-month notion)."""
    cond = (speed["plate"] == fee["ENVEHPLATE"]) & speed["time"].between(
        fee["ENTIMEMillis"], fee["EXTIMEMillis"]
    )
    return speed.join(fee, cond, "inner").select(
        speed["event_ts"],
        speed["speed"],
        speed["hour"],
        fee["EXVEHCLASS"].alias("class"),
        fee["EXTRUCKFLAG"].alias("type"),
    )
