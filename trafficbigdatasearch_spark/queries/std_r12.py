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


# --------------------------------------------------------------------------
# TPC-H completion canaries (r12): with these eight the registry covers the
# full 22-query TPC-H suite (q1 = a_pricing_summary).  Schema adaptations
# (no partsupp / l_shipmode / receiptdate / c_phone in the testdata) are
# documented per query; every adaptation PRESERVES the plan shape the spec
# query exists to exercise — that shape, not the exact predicate constants,
# is what the canary pins.  Money math follows the registry's exact-cents
# rules; quotient/half-valued terms use floor() (identical in both engines)
# instead of round() (HALF_UP in Spark, half-even in DuckDB — divergent
# exactly on the .5 values quotients produce).
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """WITH costs AS (
         SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
                CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)
                  AS cost_cents
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN region ON r_regionkey = n_regionkey
         WHERE r_name = 'EUROPE'),
       best AS (SELECT l_partkey, MIN(cost_cents) AS min_cost
                FROM costs GROUP BY l_partkey)
       SELECT DISTINCT s_acctbal, s_name, n_name,
              p_partkey, p_type,
              CAST(c.cost_cents AS DOUBLE) / 100 AS supply_cost
       FROM costs c
       JOIN best b ON b.l_partkey = c.l_partkey
                  AND c.cost_cents = b.min_cost
       JOIN part ON p_partkey = c.l_partkey
       WHERE p_size = 15 AND p_type = 'LARGE'
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       LIMIT 100""",
)
def q2_min_cost_supplier_q(spark, sf):
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp table, so
    the part-supplier cost relation is DERIVED from lineitem (unit cost =
    floor(extendedprice / quantity) in cents — floor, not round: the
    quotient lands on exact halves and the engines' rounding modes
    differ).  The canary shape is the spec's: a CORRELATED MIN subquery
    (cheapest supplier per part within a region) DECORRELATED into a
    per-group MIN + join-back on (part, cost) — the rewrite every
    optimizer must do to avoid per-row rescans — under a broadcast dim
    chain (nation, region constant-size at every SF; supplier/part left
    to AQE).  The top-100 carries the full (acctbal DESC, n_name, s_name,
    partkey) tie-break so LIMIT is deterministic cross-engine."""
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = F.broadcast(load_table(spark, sf, "nation"))
    r = F.broadcast(
        load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    costs = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "l_partkey", "s_name", "s_acctbal", "n_name",
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 100
            ).cast("bigint").alias("cost_cents"),
        )
    )
    best = costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("cost_cents").alias("min_cost")
    )
    return (
        costs.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("cost_cents") == F.col("min_cost")),
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            (F.col("cost_cents").cast("double") / 100).alias("supply_cost"),
        )
        .distinct()
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q8_market_share",
    """WITH vol AS (
         SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT) AS vol_cents,
                sn.n_name AS supp_nation
         FROM lineitem
         JOIN orders   ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
         JOIN region   ON r_regionkey = cn.n_regionkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation sn ON sn.n_nationkey = s_nationkey
         JOIN part     ON p_partkey = l_partkey
         WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
           AND o_orderdate >= DATE '1996-01-01'
           AND o_orderdate < DATE '1998-01-01')
       SELECT o_year,
              CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                            THEN vol_cents ELSE 0 END) AS DOUBLE)
                / CAST(SUM(vol_cents) AS DOUBLE) AS mkt_share
       FROM vol GROUP BY o_year""",
)
def q8_market_share_q(spark, sf):
    """TPC-H Q8 (national market share): NATION_7's share of ECONOMY-part
    revenue delivered into ASIA, by order year.  The canary shape: the
    LONGEST join chain in the suite (lineitem + orders + customer +
    2x nation + region + supplier + part — nation joined TWICE under
    different roles), a conditional-numerator aggregate (share =
    CASE-summed volume / total volume), and a years-window date filter.
    Exact-cents volumes make both sums integers; the share is ONE double
    division of two exactly-agreed values, so the ratio hash-matches
    bit-for-bit.  Constant-size dims broadcast; the optimizer must
    order the fact joins so each dim prunes early."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    cn = F.broadcast(load_table(spark, sf, "nation").alias("cn"))
    sn = F.broadcast(load_table(spark, sf, "nation").alias("sn"))
    r = F.broadcast(
        load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    )
    vol_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    vol = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(cn, F.col("cn.n_nationkey") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("cn.n_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(sn, F.col("sn.n_nationkey") == F.col("s_nationkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol_cents.alias("vol_cents"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("vol_cents"))
        .otherwise(F.lit(0))
    ).cast("double")
    return vol.groupBy("o_year").agg(
        (num / F.sum("vol_cents").cast("double")).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """SELECT n_name AS nation,
              CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
              CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                            AS BIGINT)
                     - CAST(floor(p_retailprice * l_quantity * 50)
                            AS BIGINT)) AS DOUBLE) / 100 AS sum_profit
       FROM lineitem
       JOIN part     ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN nation   ON n_nationkey = s_nationkey
       JOIN orders   ON o_orderkey = l_orderkey
       WHERE p_name LIKE '%gizmo%'
       GROUP BY 1, 2""",
)
def q9_product_profit_q(spark, sf):
    """TPC-H Q9 (product-type profit), adapted: no partsupp, so supply
    cost is proxied at half retail (floor(retailprice * qty * 50) cents —
    retail-cents x whole qty / 2 lands EXACTLY on .0/.5, where the
    engines' round() modes diverge; floor is mode-free).  The canary
    shape is the spec's: a LIKE '%substring%' filter that CANNOT push to
    parquet min/max stats (it still prunes columns and pre-filters the
    join input — the plan must filter part BEFORE the fact join, not
    after), a 5-way join, and a (nation, year) rollup of a signed profit
    expression.  Profit sums in exact integer cents; one double cast at
    output."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("%gizmo%"))
    s = load_table(spark, sf, "supplier")
    n = F.broadcast(load_table(spark, sf, "nation"))
    o = load_table(spark, sf, "orders")
    profit_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint") - F.floor(
        F.col("p_retailprice") * F.col("l_quantity") * 50
    ).cast("bigint")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit_cents).cast("double") / 100).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    """WITH pv AS (
         SELECT l_partkey,
                SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS value_cents
         FROM lineitem
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation   ON n_nationkey = s_nationkey
         JOIN region   ON r_regionkey = n_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY l_partkey)
       SELECT l_partkey AS partkey,
              CAST(value_cents AS DOUBLE) / 100 AS part_value
       FROM pv, (SELECT SUM(value_cents) AS total_cents,
                        COUNT(*) AS n_parts FROM pv) t
       WHERE value_cents > CAST(total_cents AS DOUBLE) / n_parts * 2""",
)
def q11_important_stock_q(spark, sf):
    """TPC-H Q11 (important stock identification), adapted: part value =
    one REGION's suppliers' lineitem revenue per part (no partsupp
    availqty; region not nation so the row is non-degenerate at sf0.001,
    where single nations have no suppliers), and the spec's SF-scaled
    fraction becomes a scale-FREE threshold — value > 2x the average part
    value — since a fixed fraction of the grand total is provably empty
    once part count outgrows it (measured: 0.001 keeps 335 parts at
    sf0.01 and ZERO at sf0.1).  The canary shape is the spec's
    GLOBAL-THRESHOLD HAVING: a scalar subquery (grand total + count over
    the SAME aggregate) feeding the filter.  Decorrelation: the per-part
    aggregate computes once, the 1-row totals frame cross-joins back as a
    broadcast — two passes over the small aggregated frame, ZERO extra
    passes over the fact table.  The threshold compare is exact bigint
    cents vs (exact-int sum / exact-int count * 2) — one fixed IEEE op
    sequence, identical in both engines."""
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = F.broadcast(load_table(spark, sf, "nation"))
    r = F.broadcast(
        load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    )
    pv = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("value_cents"))
    )
    total = pv.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents")
            > F.col("total_cents").cast("double") / F.col("n_parts") * 2
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_cents").cast("double") / 100).alias("part_value"),
        )
    )


@register(
    "q12_shipmode_priority",
    """SELECT l_returnflag AS ship_class,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
       GROUP BY l_returnflag""",
)
def q12_shipmode_priority_q(spark, sf):
    """TPC-H Q12 (shipping modes / priority), adapted: no l_shipmode or
    receipt/commit dates, so 'late' = shipped >60 days after the order
    date and the mode axis is l_returnflag.  The canary shape is the
    spec's: a CROSS-TABLE inequality predicate (l_shipdate vs
    o_orderdate) that must run as a join RESIDUAL — neither scan can
    evaluate it alone, so the optimizer keeps the equi join on orderkey
    and filters the joined rows — plus the pivoted conditional counts
    (two CASE sums in one pass, not two joins)."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(high.cast("int")).cast("bigint").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_counts",
    """SELECT p_brand, p_type, p_size,
              CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
         AND p_size IN (1, 4, 9, 16, 25, 36, 49)
         AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size""",
)
def q16_supplier_part_counts_q(spark, sf):
    """TPC-H Q16 (part/supplier relationship), adapted: the supplier
    exclusion set is s_acctbal < 0 (no s_comment complaints column); the
    part-supplier link is lineitem (no partsupp).  The canary shape is
    the spec's: a NOT IN subquery that must decorrelate to an ANTI JOIN
    (the excluded set is tiny — broadcast anti join, never a per-row
    probe), negated dim predicates, and COUNT(DISTINCT) per group — the
    two-level aggregate (distinct-collapse then count) every engine must
    get right under skewed (brand, type, size) cells."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load_table(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"),
                "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_dominant_supplier",
    """WITH sq AS (
         SELECT l_partkey, l_suppkey,
                CAST(SUM(l_quantity) AS BIGINT) AS supp_qty
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_name LIKE 'small%'
           AND l_shipdate >= DATE '1997-01-01'
           AND l_shipdate < DATE '1998-01-01'
         GROUP BY l_partkey, l_suppkey),
       tq AS (SELECT l_partkey, SUM(supp_qty) AS total_qty
              FROM sq GROUP BY l_partkey),
       dom AS (SELECT DISTINCT l_suppkey FROM sq
               JOIN tq USING (l_partkey)
               WHERE supp_qty * 2 > total_qty)
       SELECT s_name, n_name,
              CAST((SELECT COUNT(*) FROM sq s2
                    JOIN tq USING (l_partkey)
                    WHERE s2.l_suppkey = supplier.s_suppkey
                      AND s2.supp_qty * 2 > tq.total_qty) AS BIGINT)
                AS n_dominated
       FROM supplier
       JOIN nation ON n_nationkey = s_nationkey
       JOIN dom ON dom.l_suppkey = s_suppkey
       WHERE n_name = 'NATION_1'""",
)
def q20_dominant_supplier_q(spark, sf):
    """TPC-H Q20 (potential part promotion), adapted: no partsupp
    availqty, so the spec's 'stock exceeds half of shipped quantity'
    becomes 'supplier shipped more than half of the part's total 1997
    volume' — same nested TWO-LEVEL aggregate + threshold + SEMI-join
    reduction shape.  Quantities are whole-number doubles, so the sums
    are exact integers and the share test runs as bigint supp_qty * 2 >
    total_qty — no division, no epsilon.  The supplier table is reduced
    by a semi join against the dominant set (never inflated then
    deduped), then the per-supplier dominated-part count rides the
    already-aggregated sq frame."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf, "supplier")
    n = F.broadcast(
        load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    )
    sq = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("supp_qty"))
    )
    tq = sq.groupBy("l_partkey").agg(F.sum("supp_qty").alias("total_qty"))
    dom = (
        sq.join(tq, "l_partkey")
        .filter(F.col("supp_qty") * 2 > F.col("total_qty"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dominated"))
    )
    return (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(dom, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name", "n_dominated")
    )


@register(
    "q22_global_sales_opportunity",
    """WITH pos AS (
         SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents,
                COUNT(*) AS n
         FROM customer WHERE c_acctbal > 0
           AND c_nationkey IN (0, 3, 7, 11, 14, 17, 20)),
       rich AS (
         SELECT c_custkey, c_nationkey, c_acctbal
         FROM customer, pos
         WHERE c_nationkey IN (0, 3, 7, 11, 14, 17, 20)
           AND CAST(round(c_acctbal * 100) AS BIGINT)
               > CAST(sum_cents AS DOUBLE) / n)
       SELECT c_nationkey AS cntrycode,
              CAST(COUNT(*) AS BIGINT) AS numcust,
              CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / 100 AS totacctbal
       FROM rich
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = rich.c_custkey
                           AND o_orderdate >= DATE '2000-01-01')
       GROUP BY c_nationkey""",
)
def q22_global_sales_opportunity_q(spark, sf):
    """TPC-H Q22 (global sales opportunity), adapted twice: the
    phone-prefix country codes become a c_nationkey IN-set, and 'never
    bought' becomes 'no order since 2000' — the synthetic orders table
    gives EVERY customer at least one order, so the spec's literal
    anti-join is provably empty at every SF and would pin nothing.  The
    canary shape is the spec's, all three parts: a SCALAR AVG subquery
    (above-average account balance) broadcast as a 1-row threshold, an
    ANTI join against (filtered) orders, and the final per-country
    rollup.  The
    average is computed as exact-cents sum / count — ONE double division
    both engines perform on identical integers — and compared against
    exact cents, so threshold membership never wobbles with partial-sum
    order.  orders is reduced to distinct custkeys BEFORE the anti join
    (the anti side only needs existence)."""
    nats = [0, 3, 7, 11, 14, 17, 20]
    c = load_table(spark, sf, "customer").filter(
        F.col("c_nationkey").isin(nats)
    )
    cents = _cents(F.col("c_acctbal"))
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(
            cents > F.col("sum_cents").cast("double") / F.col("n")
        )
    )
    return (
        rich.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            (F.sum(cents).cast("double") / 100).alias("totacctbal"),
        )
    )


_OHLC_ORACLE_R12 = """SELECT user_id, date_trunc('hour', ts) AS bucket,
              arg_min(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS open,
              max(value) AS high,
              min(value) AS low,
              arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM events GROUP BY user_id, date_trunc('hour', ts)"""


@register("ts_ohlc_bucketed_append", _OHLC_ORACLE_R12)
def ts_ohlc_bucketed_append_q(spark, sf):
    """The bucketed layout's MAINTENANCE story: the hot events table is
    built from history (ts < 2024-01-21) and new arrivals append as a
    second bucketed write — `bucketBy` appends add files PER BUCKET, so
    bucket co-location (and therefore the zero-exchange aggregate plan)
    survives; only the per-file sorted-run property weakens (two sorted
    runs per bucket instead of one — the local sort merges them, still no
    exchange).  At 100 TB this is the difference between a daily
    full-table rewrite and appending the day's partition.  The oracle is
    the plain OHLC SQL over the FULL source table: a hash match proves
    history + appended increment == the unsplit corpus, exactly — the
    append path loses no rows, duplicates none, and elects the same
    open/close winners.  Uses its own scratch table (not
    _bucketed_events' — that one must stay a pristine single-write
    layout for the ts_ohlc_bucketed / ts_gapfill_bucketed measurements)."""
    import os

    from trafficbigdatasearch_spark.operators import timeseries as TS
    from trafficbigdatasearch_spark.sources.parquet import write_bucketed
    from .std_textsim import _scratch

    scratch = _scratch("ohlc_bkta", sf)
    table = "tbds_ohlc_bkta_" + os.path.basename(scratch)[-8:].replace(
        "-", "_"
    )
    # The build is TWO writes (history overwrite, then increment append);
    # an interruption between them would leave a catalog-visible table
    # holding history only.  A marker file recorded only AFTER the append
    # gates reuse: table-exists-without-marker means a torn build, so
    # rebuild instead of silently serving partial data (ADVICE r12).
    marker = os.path.join(scratch, "_APPEND_COMPLETE")
    if not spark.catalog.tableExists(table) or not os.path.exists(marker):
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        path = os.path.join(scratch, "tbl")
        shutil.rmtree(path, ignore_errors=True)  # torn-build leftovers
        ev = load_table(spark, sf, "events")
        cutoff = "2024-01-21"
        write_bucketed(
            ev.filter(F.col("ts") < cutoff), table, ["user_id"], 32,
            path=path, sort_cols=["user_id", "ts"],
        )
        write_bucketed(
            ev.filter(F.col("ts") >= cutoff), table, ["user_id"], 32,
            path=path, sort_cols=["user_id", "ts"], mode="append",
        )
        with open(marker, "w") as fh:
            fh.write("history+append committed\n")
    return TS.resample_ohlc(
        spark.table(table), key_col="user_id", ts_col="ts",
        value_col="value", id_col="event_id", bucket="hour",
    )


@register(
    "j_user_baseline_bucketed",
    """WITH us AS (
         SELECT user_id,
                SUM(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
                COUNT(*) AS n
         FROM events GROUP BY user_id)
       SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_above
       FROM events e JOIN us USING (user_id)
       WHERE CAST(round(e.value * 100) AS BIGINT) * n > sum_cents
       GROUP BY e.user_id""",
)
def j_user_baseline_bucketed_q(spark, sf):
    """CO-LOCATED fact ⋈ derived-dim join over the shared bucketed layout —
    the layout lever extended from aggregates to JOINS as a standing
    registry row (the synthetic twin lives in
    tests/test_plans.py::test_bucketed_join_shuffle_free; this row drives
    it through the driver's cross-engine gate on real data).  user_stats
    (per-user exact-cents sum + count) is built FROM the bucketed events
    table with a zero-exchange aggregate and written bucketed the same
    32 ways; the row then joins raw events against it and counts each
    user's above-own-mean events.  Both sides arrive bucket-aligned, so
    the join AND the final per-user count plan with ZERO exchanges
    (pinned) — at 100 TB this is the difference between re-shuffling the
    fact table per enrichment join and reading both sides pre-partitioned.
    Above-mean is the exact integer test cents*n > sum_cents — no
    division, no epsilon, so membership hash-matches DuckDB bit-for-bit."""
    import os

    from trafficbigdatasearch_spark.sources.parquet import write_bucketed
    from .std_textsim import _scratch
    from .std_r11 import _bucketed_events

    ev_table = _bucketed_events(spark, sf)
    us_table = "tbds_user_stats_" + os.path.basename(
        _scratch("user_stats", sf)
    )[-8:].replace("-", "_")
    if not spark.catalog.tableExists(us_table):
        us = (
            spark.table(ev_table)
            .groupBy("user_id")
            .agg(
                F.sum(_cents(F.col("value"))).alias("sum_cents"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        write_bucketed(
            us, us_table, ["user_id"], 32,
            path=os.path.join(_scratch("user_stats", sf), "tbl"),
            sort_cols=["user_id"],
        )
    ev = spark.table(ev_table)
    us = spark.table(us_table)
    return (
        ev.join(us, "user_id")
        .filter(_cents(F.col("value")) * F.col("n") > F.col("sum_cents"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_above"))
    )


@register(
    "s_bucket_pruned_lookup",
    """SELECT user_id, date_trunc('hour', ts) AS bucket,
              CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
                AS sum_value,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM events WHERE user_id IN (7, 13)
       GROUP BY user_id, date_trunc('hour', ts)""",
)
def s_bucket_pruned_lookup_q(spark, sf):
    """BUCKET-PRUNED point lookup — the third leg of the layout trilogy
    (zero-exchange aggregate: ts_ohlc_bucketed; shuffle-free join:
    j_user_baseline_bucketed; and here the SCAN itself shrinks): a
    per-user drilldown over the shared bucketed events table reads ONLY
    the buckets the literal keys hash to — the physical scan reports
    ``SelectedBucketsCount: ≤2 out of 32`` (pinned) — so a hot-key query
    over a 100 TB fact table touches 1/32nd of the files BEFORE any
    filter runs, on top of the usual parquet pushdown.  Partition
    pruning's hash-bucketed sibling: same catalog metadata, no directory
    explosion for high-cardinality keys.  Exact-cents hourly rollup so
    values hash-match the plain-scan oracle bit-for-bit."""
    from .std_r11 import _bucketed_events

    ev = spark.table(_bucketed_events(spark, sf))
    return (
        ev.filter(F.col("user_id").isin(7, 13))
        .groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(
            (F.sum(_cents(F.col("value"))).cast("double") / 100).alias(
                "sum_value"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
