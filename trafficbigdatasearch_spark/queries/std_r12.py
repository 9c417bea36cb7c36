"""Round-12 registrations.  New rows enter the ROTATION QUEUE, not the
driver window (ROTATION.md, registration-pacing rule): each is rehearsed
green through tools/driver_sim at sf0.01 in its registration session and
continuously oracle-verified at sf0.001 by the parameterized pytest sweep,
then takes a driver slot when the queue reaches it."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from ._shared import _cents, register
from .std_r11 import _bucketed_events


@register(
    "ts_gapfill_bucketed",
    """WITH closes AS (
         SELECT user_id, date_trunc('hour', ts) AS bucket,
                arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS _close
         FROM events GROUP BY user_id, date_trunc('hour', ts)),
       spine AS (
         SELECT user_id,
                unnest(generate_series(min(bucket), max(bucket),
                                       INTERVAL 1 HOUR)) AS bucket
         FROM closes GROUP BY user_id)
       SELECT s.user_id, s.bucket,
              last_value(c._close IGNORE NULLS) OVER (
                PARTITION BY s.user_id ORDER BY s.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
              CAST(CASE WHEN c._close IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                AS is_observed
       FROM spine s LEFT JOIN closes c
         ON c.user_id = s.user_id AND c.bucket = s.bucket""",
)
def ts_gapfill_bucketed_q(spark, sf):
    """ts_gapfill over the SHARED bucketed+sorted events table (the
    std_r11._bucketed_events scratch table ts_ohlc_bucketed builds) —
    VERDICT r11 #7's generalization probe as a standing oracle row.  The
    gapfill plan has the same key-clustered shape OHLC has, THREE times
    over: the closes aggregate (max_by struct buffer -> SortAggregate),
    the per-key spine aggregate, and the forward-fill window all hash on
    user_id — over the bucketed layout every one of those exchanges
    disappears (bucket co-location satisfies the clustering) and the
    closes sort runs over already-sorted runs.  The oracle is ts_gapfill's
    SQL verbatim over the SOURCE table: a hash match proves the layout
    changes the plan, not one bit of the answer.  Measured at sf0.1 in
    SCALING.md's r12 entry; the plan (zero exchanges upstream of the
    spine join) is pinned in tests/test_plans.py."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    table = _bucketed_events(spark, sf)
    return TS.gapfill_ffill(
        spark.table(table), key_col="user_id", ts_col="ts",
        value_col="value", id_col="event_id", bucket="hour",
    )
