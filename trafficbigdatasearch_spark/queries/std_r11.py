"""Round-11 registrations.  New rows enter the ROTATION QUEUE, not the
driver window (ROTATION.md, registration-pacing rule): each is rehearsed
green through tools/driver_sim at sf0.01 in its registration session and
continuously oracle-verified at sf0.001 by the parameterized pytest sweep,
then takes a driver slot when the queue reaches it."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from ._shared import _cents, register
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


def _bucketed_events(spark, sf) -> str:
    """Ensure the shared bucketed+sorted events scratch table for this
    (process, sf) and return its catalog name: bucketBy(user_id, 32) +
    sortBy(user_id, ts), built once into the scratch root as an external
    table and reused by every key-clustered-aggregate row that rides the
    layout lever (ts_ohlc_bucketed here, ts_gapfill_bucketed in std_r12 —
    the hot-table economics REQUIRE sharing: one write amortized across
    every query on the table is the 100 TB story)."""
    import os

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
    return table


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
    from trafficbigdatasearch_spark.operators import timeseries as TS

    table = _bucketed_events(spark, sf)
    return TS.resample_ohlc(
        spark.table(table), key_col="user_id", ts_col="ts",
        value_col="value", id_col="event_id", bucket="hour",
    )


@register(
    "q13_customer_distribution",
    """WITH co AS (
         SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
         FROM customer c
         LEFT JOIN orders o
           ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey)
       SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
       FROM co GROUP BY c_count""",
)
def q13_customer_distribution_q(spark, sf):
    """TPC-H Q13 (customer order distribution), adapted to this schema's
    columns (the spec filters on o_comment, absent here; the urgent-
    priority exclusion keeps a real ON-clause predicate so the OUTER join
    cannot be rewritten inner).  The shape this adds to the canary family:
    a LEFT OUTER equi join whose preserved side is the DIMENSION, followed
    by a two-level aggregation (orders per customer, then the histogram of
    those counts).  Customers with zero surviving orders MUST appear in
    the c_count=0 bucket — the classic outer-join-then-count trap where an
    inner join silently drops the most interesting bucket.  Both
    aggregations are map-side combinable; the second one's input is
    dim-sized (one row per customer)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return co.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "q15_top_supplier",
    """WITH rev AS (
         SELECT l_suppkey,
                SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS revenue_i
         FROM lineitem
         WHERE l_shipdate >= DATE '1996-07-01'
           AND l_shipdate < DATE '1996-10-01'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name,
              CAST(revenue_i AS DOUBLE) / 10000 AS total_revenue
       FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
       WHERE revenue_i = (SELECT MAX(revenue_i) FROM rev)""",
)
def q15_top_supplier_q(spark, sf):
    """TPC-H Q15 (top supplier): the equality-to-a-global-MAX shape — the
    spec's revenue view reused three times (aggregate, scalar max,
    join-back).  The max comparison runs on the EXACT integer revenue
    (cents x discount-complement, the q3/q14 pattern), so 'equal to max'
    is bit-deterministic in both engines and ties all surface; the /10000
    double conversion happens only at output.  Spark shape: one partial-
    combined aggregate over the pruned quarter scan, a 1-row max frame
    broadcast back over it (broadcast nested loop on a single row — the
    scalar-subquery decorrelation), then a broadcast join to the supplier
    dim.  No global sort, no window over the full aggregate."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-07-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice"))
            * (100 - _cents(F.col("l_discount")))
        ).alias("revenue_i")
    )
    mx = rev.agg(F.max("revenue_i").alias("_mx"))
    s = load_table(spark, sf, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.revenue_i == mx._mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("revenue_i").cast("double") / 10000).alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """WITH pa AS (
         SELECT l_partkey,
                CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY l_partkey)
       SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS revenue_cents,
              CAST(COUNT(*) AS BIGINT) AS n_lines
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN pa ON pa.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#23'
         AND CAST(round(l.l_quantity) AS BIGINT) * 5 * pa.cnt < pa.sq""",
)
def q17_small_quantity_revenue_q(spark, sf):
    """TPC-H Q17 (small-quantity-order revenue): the CORRELATED SCALAR
    AVG subquery — each lineitem compares its quantity to 20% of its own
    part's average quantity — decorrelated the way every engine must at
    scale: the per-part average becomes one map-side-combined aggregate
    joined back on partkey.  The 0.2 x avg comparison is restated in
    EXACT integers (qty x 5 x cnt < sum_qty; quantities are integral), so
    no float average can flip a borderline row between engines.  The
    brand predicate pushes to the part scan and AQE broadcasts the
    filtered dim; container/size columns from the spec are absent in this
    schema, so brand alone plays the selective-dim role."""
    li = load_table(spark, sf, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qty).cast("bigint").alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    p = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.l_partkey)
        .filter(qty * 5 * F.col("cnt") < F.col("sq"))
    )
    return j.agg(
        F.sum(_cents(F.col("l_extendedprice"))).cast("bigint")
          .alias("revenue_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@register(
    "q21_late_sole_supplier",
    """WITH lo AS (
         SELECT l.l_orderkey, l.l_suppkey,
                MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS any_late
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         GROUP BY l.l_orderkey, l.l_suppkey),
       po AS (
         SELECT l_orderkey,
                CAST(COUNT(*) AS BIGINT) AS n_supps,
                CAST(SUM(any_late) AS BIGINT) AS n_late
         FROM lo GROUP BY l_orderkey)
       SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
       FROM lo JOIN po ON po.l_orderkey = lo.l_orderkey
       JOIN supplier s ON s.s_suppkey = lo.l_suppkey
       WHERE lo.any_late = 1 AND po.n_supps > 1 AND po.n_late = 1
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name ASC
       LIMIT 20""",
)
def q21_late_sole_supplier_q(spark, sf):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: the spec's
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) double correlation, with 'late' = shipped more than 90 days
    after the order date (receipt/commit dates are absent here).  The
    decorrelation is the scalable one: per-(order, supplier) late flags
    (one aggregate), per-order supplier/late counts (a second, dim-sized
    aggregate), then the EXISTS pair becomes two integer predicates —
    n_supps > 1 AND n_late = 1 — on one join, instead of two correlated
    subqueries re-scanning lineitem per row.  Counts are exact integers;
    top-20 is TakeOrderedAndProject with the (numwait desc, name)
    tie-break."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
    ).otherwise(0)
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("any_late"))
    )
    po = lo.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_supps"),
        F.sum("any_late").cast("bigint").alias("n_late"),
    )
    s = load_table(spark, sf, "supplier")
    return (
        lo.filter(F.col("any_late") == 1)
        .join(po, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), lo.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def _bpe_fertility_oracle() -> str:
    from .std_textsim import _bpe_oracle_ctes, _bpe_apply_ctes, _BPE_ROUNDS

    return f"""WITH {_bpe_oracle_ctes()},
       {_bpe_apply_ctes()},
       enc AS (SELECT word,
                      replace(substring(repr, 2, length(repr) - 2), '||', ' ')
                        AS encoded
               FROM w{_BPE_ROUNDS})
       SELECT LEAST(length(word), 8) AS word_len,
              CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(len(string_split(encoded, ' '))) AS BIGINT) AS n_tokens,
              CAST(SUM(length(word)) AS BIGINT) AS n_chars,
              CAST(SUM(len(string_split(encoded, ' '))) AS DOUBLE) / COUNT(*)
                AS fertility
       FROM enc GROUP BY 1"""


@register("eval_bpe_fertility", _bpe_fertility_oracle())
def eval_bpe_fertility_q(spark, sf):
    """Tokenizer FERTILITY eval — the standard tokenizer-quality report
    (subwords per word, by word length): rules learned on the corpus,
    applied to the held-out doc_id % 10 = 3 slice (text_bpe_apply's exact
    train->apply arrangement), then one map-side-combined rollup of
    (n_words, n_tokens, n_chars) per LEAST(word_len, 8) bucket.  Fertility
    is the one closing IEEE division (exact bigint sums / count — the
    registry's average discipline), so the row hash-compares across
    engines; chars-per-token and compression ratios derive from the exact
    integer columns downstream.  This is the measurement loop a tokenizer-
    training pipeline runs per candidate vocabulary: longer words should
    show sublinear token growth as merges land — a flat fertility curve
    means the merge budget is mis-spent.  Scale posture: the apply fold is
    zero-shuffle; the rollup groups into <= 8 buckets."""
    from trafficbigdatasearch_spark.operators import bpe
    from .std_textsim import _BPE_ROUNDS

    docs = load_table(spark, sf, "documents")
    rules, _ = bpe.learn_merges(docs, _BPE_ROUNDS)
    enc = bpe.apply_merges(docs.filter(F.col("doc_id") % 10 == 3), rules)
    n_tok = F.size(F.split(F.col("encoded"), " ")).cast("bigint")
    return (
        enc.groupBy(
            F.least(F.length("word"), F.lit(8)).cast("int").alias("word_len")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(n_tok).cast("bigint").alias("n_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
        .select(
            "word_len", "n_words", "n_tokens", "n_chars",
            (F.col("n_tokens").cast("double") / F.col("n_words"))
              .alias("fertility"),
        )
    )


@register(
    "q7_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
              CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                   AS DOUBLE) / 10000 AS revenue
       FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
       JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
       WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         AND l.l_shipdate >= DATE '1996-01-01'
         AND l.l_shipdate < DATE '1998-01-01'
       GROUP BY 1, 2, 3""",
)
def q7_volume_shipping_q(spark, sf):
    """TPC-H Q7 (volume shipping): the DISJUNCTIVE CROSS-DIMENSION
    residual — the nation-pair predicate couples TWO different dimension
    joins ((supp=A and cust=B) or (supp=B and cust=A)), so no single join
    can evaluate it; it must survive as a residual ABOVE both dim joins
    while each dim's membership filter (nation in {A,B}) still pushes
    INTO its own join to prune early.  Both nation copies broadcast (25
    rows); supplier broadcasts; customer is left to AQE.  Revenue folds
    on the exact cents x discount-complement integers with the /10000
    double conversion at output; the year extraction groups the two-year
    ship window.  Canary value: Catalyst must keep factoring the
    disjunction into per-dim IN-filters plus the cross residual — if it
    ever evaluates the OR only at the top, the early prune disappears and
    both fact joins run unfiltered."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    pair = ["NATION_3", "NATION_7"]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
    )


# =============================================================================
# ROUND-11 CLOSING STATE: the r11 window (ROTATION.md) was rehearsed 50/50
# green BEFORE any r11 registration landed; the eight r11 registrations
# above each rehearsed green at sf0.01 AND sf0.1 in their registration
# batch; the FULL registry swept 236/236 green mid-session (post-split,
# post-struct-key) and 243/243 at close; pytest closed 735 passed / 2
# env-gated skips / 0 failed.  The definitive closing bench: 199 headline
# queries, 202.3 s warm / 270.1 s cold at sf0.1 (1.02 s/query — the
# fastest full record of any round), ZERO regression flags, ZERO
# transients, quiet host (loadavg ~2.3 start and end).  Changed-code
# paths this round (timeseries ordering key, registry split; the CC
# check-batching experiment was REVERTED after its A/B refutation —
# SCALING.md) are itemized with their cycle-back obligations in
# ROTATION.md's ROUND-12 QUEUE.
# =============================================================================
