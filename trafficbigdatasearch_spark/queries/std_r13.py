"""Round-13 registrations.  New rows enter the ROTATION QUEUE, not the
driver window (ROTATION.md, registration-pacing rule): each is rehearsed
green through tools/driver_sim at sf0.01 AND sf0.1 in its registration
session and continuously oracle-verified at sf0.001 by the parameterized
pytest sweep, then takes a driver slot when the queue reaches it.

Per VERDICT r12 #8 this round prefers depth over breadth: every row here
names the evidence gap it closes in its docstring."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from ._shared import register


# Oracle recipe per operators/timeseries.py::_ord_key's docstring and
# tests/test_timeseries.py::test_negative_id_oracle_recipe_row_key: with
# ids of BOTH signs the legacy epoch*1e10+id HUGEINT pack inverts the
# (ts, id) order, so the oracle uses DuckDB's ordered-aggregate form —
# first/last(v ORDER BY epoch_ms(ts), id) is exactly the struct key's
# lexicographic comparison.
_SIGNED_ID = (
    "CASE WHEN event_id % 2 = 1 THEN -event_id ELSE event_id END"
)


@register(
    "ts_ohlc_negative_ids",
    f"""WITH ev AS (SELECT user_id, ts, value,
                   {_SIGNED_ID} AS event_id
            FROM events)
       SELECT user_id, date_trunc('hour', ts) AS bucket,
              first(value ORDER BY epoch_ms(ts), event_id) AS open,
              max(value) AS high,
              min(value) AS low,
              last(value ORDER BY epoch_ms(ts), event_id) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM ev GROUP BY user_id, date_trunc('hour', ts)""",
)
def ts_ohlc_negative_ids_q(spark, sf):
    """OHLC over a MIXED-SIGN id column — the one known cross-engine
    divergence class (VERDICT r12 #6), pinned by the driver instead of
    only locally: odd event_ids are negated, producing a corpus where the
    legacy DECIMAL pack (epoch*1e10 + id) would mis-order (ts, id) pairs
    whenever a large-magnitude negative id meets a nearby timestamp, while
    the engine's struct ordering key (operators/timeseries.py::_ord_key)
    compares field-wise and stays exact for EVERY bigint id.  The oracle
    deliberately uses the recipe the _ord_key docstring prescribes —
    DuckDB's ordered aggregates ``first/last(v ORDER BY epoch_ms(ts),
    id)`` — not the HUGEINT pack, so a driver hash-match proves the
    struct key and the ordered-aggregate recipe elect identical open/
    close winners on real data with both signs present.  Same one-pass,
    map-side-combinable aggregate plan as ts_resample_ohlc (no extra
    shuffle for the sign flip — it's a row-local projection)."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    ev = load_table(spark, sf, "events").select(
        "user_id",
        "ts",
        "value",
        F.when(
            F.col("event_id") % 2 == 1, -F.col("event_id")
        )
        .otherwise(F.col("event_id"))
        .alias("event_id"),
    )
    return TS.resample_ohlc(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", bucket="hour",
    )
