"""Round-4 era: spatial joins, table reconciliation, incremental
maintenance, graph algorithms (PageRank/k-core/LPA/SSSP), DBSCAN.

Split from queries/standard.py (VERDICT r10 #7) with registration
order preserved by the aggregator's import order; see ROTATION.md
for the driver-window policy and ledger."""

from __future__ import annotations

from pyspark.sql import functions as F
from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.functions import text as T
from trafficbigdatasearch_spark.functions import vectors as V
from trafficbigdatasearch_spark.operators import (
    dedup,
    graph,
    joins,
    sampling,
    similarity,
)
from ._shared import _REGISTRY, _cents, register
from .std_textsim import (
    _GUARDED_TOKS,
    _MINHASH_K,
    _QVEC,
    _TOKCOUNT_SQL,
    _drain_to_memory,
    _lsh_pairs_cte,
    _scratch,
    _stream_events_source,
)
from .std_tpch_sampling import _BUCKET_SQL, _TEXT_INDEX_CACHE

# =============================================================================
# Round-4 additions — spatial join, reconciliation, incremental maintenance,
# frontier graph traversal, fuzzy join, higher-order-function surface
# =============================================================================


@register(
    "j_spatial_grid",
    """WITH pts AS (SELECT c_custkey AS id,
                           ((c_custkey * 48271) % 99991) % 1000 AS x,
                           ((c_custkey * 16807) % 104729) % 1000 AS y
                    FROM customer)
       SELECT a.id AS id_a, b.id AS id_b,
              CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
       FROM pts a JOIN pts b
         ON a.id < b.id
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225""",
)
def j_spatial_grid_q(spark, sf):
    """SPATIAL RADIUS JOIN — the join form of the reference's bbox predicate
    (P1, src/AccidentStatistics.scala:102): all point pairs within distance
    r, via the uniform-grid bucketing of operators/spatial.py::radius_pairs.
    Cell pitch = r, left side explodes to its 3x3 neighborhood, right side
    keeps its home cell, so every qualifying pair matches on exactly ONE
    cell key: one equi-join shuffle, no dedup, exact integer dist² residual
    on candidates only.  The ORACLE is the O(n²) cross join — quadratic
    lives only on the DuckDB side, as with every dedup/ANN row.  Points are
    a deterministic integer scatter of the customer keys (prime-modulus
    LCG mixing), so the query runs at any SF."""
    from trafficbigdatasearch_spark.operators import spatial

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 48271) % 99991) % 1000).alias("x"),
        (((F.col("c_custkey") * 16807) % 104729) % 1000).alias("y"),
    )
    return spatial.radius_pairs(pts, "id", "x", "y", radius=15)


@register(
    "table_diff_orders",
    """WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus
                    FROM orders WHERE o_orderkey % 10 <> 3),
            new AS (SELECT o_orderkey,
                           CASE WHEN o_orderkey % 5 = 0
                                THEN o_totalprice + 10.0
                                ELSE o_totalprice END AS o_totalprice,
                           o_orderstatus
                    FROM orders WHERE o_orderkey % 10 <> 7)
       SELECT o_orderkey, diff_status FROM (
         SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
                CASE WHEN old.o_orderkey IS NULL THEN 'added'
                     WHEN new.o_orderkey IS NULL THEN 'removed'
                     WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                       OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                          THEN 'changed'
                     ELSE 'unchanged' END AS diff_status
         FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
       WHERE diff_status <> 'unchanged'""",
)
def table_diff_orders_q(spark, sf):
    """SNAPSHOT RECONCILIATION (operators/diff.py::snapshot_diff): which
    keys were added / removed / changed between two versions of a table —
    the daily question behind incremental reprocessing and
    pipeline-rewrite regression gates.  One full-outer hash join on the
    key; unchanged rows (the dominant class) are dropped before leaving
    the join, so output ∝ churn.  This row uses the exact column-compare
    mode (engine-portable null-safe equality); production at 100 TB uses
    fingerprint=True — map-side xxhash64 collapses any table width to a
    16-byte shuffle row (tests/test_diff.py pins both modes agree).  The
    two snapshots are deterministic slices of orders (drop keys %10=3 vs
    %10=7, perturb prices of keys %5=0)."""
    from trafficbigdatasearch_spark.operators import diff

    orders = load_table(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    return diff.snapshot_diff(
        old,
        new,
        keys=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
        fingerprint=False,
    )


@register(
    "a_incremental_merge",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS total,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*)
                AS avg_value,
              CAST(MIN(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100
                AS min_value,
              CAST(MAX(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100
                AS max_value
       FROM events GROUP BY event_type""",
)
def a_incremental_merge_q(spark, sf):
    """INCREMENTAL AGGREGATE MAINTENANCE (operators/incremental.py): the
    events table is split into a history slice and a delta slice, each
    collapsed independently to mergeable integer partials (count / sum /
    min / max cents), then MERGED and finalized — and the result is
    bit-identical to the oracle's full rescan.  This is the exact-measure
    sibling of the sketch rollups: at 100 TB the history partials are
    computed once when each day lands and stored (kilobytes/key); a query
    over any horizon merges partials instead of rescanning history, and a
    late backfill is one more partial in the union.  The reference
    re-parses every month's CSV per query — this row is the structural
    fix."""
    from trafficbigdatasearch_spark.operators import incremental as I

    ev = load_table(spark, sf, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    base = ev.filter(F.col("ts") < cut)
    delta = ev.filter(F.col("ts") >= cut)
    parts = [
        I.partial_aggregate(base, ["event_type"], _cents(F.col("value"))),
        I.partial_aggregate(delta, ["event_type"], _cents(F.col("value"))),
    ]
    return I.finalize(I.merge_partials(parts, ["event_type"]), ["event_type"])


@register(
    "graph_bfs_reach",
    """WITH RECURSIVE e AS (
         SELECT c_custkey AS u, (c_custkey*c_custkey) % 1500 + 1 AS v
         FROM customer),
       sym AS (SELECT u, v FROM e WHERE u <> v
               UNION SELECT v, u FROM e WHERE u <> v),
       bfs(id, level) AS (
         SELECT c_custkey, 0 FROM customer WHERE c_custkey <= 5
         UNION
         SELECT s.v, b.level + 1 FROM bfs b JOIN sym s ON s.u = b.id
         WHERE b.level < 4)
       SELECT id, CAST(MIN(level) AS INTEGER) AS level FROM bfs GROUP BY id""",
)
def graph_bfs_reach_q(spark, sf):
    """BOUNDED BFS from a seed set (operators/graph.py::bfs_levels) — the
    frontier-expansion sibling of connected_components: k-hop reachability
    with shortest-hop levels, the shape behind decontamination blast-radius
    ("every doc within 4 near-dup hops of a benchmark doc") and crawl
    seed-set expansion.  Fixed round count → NO per-round driver sync or
    convergence job (unlike the CC fixpoint); each round is one hash join
    on the frontier + anti-join against visited, all node-id-partitioned.
    The graph is a deterministic quadratic-residue scatter over customer
    keys (branching ~3x/level); the oracle is DuckDB's recursive CTE with
    MIN(level) — level-synchronous BFS and shortest-path closure agree by
    definition."""
    from trafficbigdatasearch_spark.operators import graph as G

    cust = load_table(spark, sf, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("u"),
        ((F.col("c_custkey") * F.col("c_custkey")) % 1500 + 1).alias("v"),
    )
    seeds = cust.filter(F.col("c_custkey") <= 5).select(
        F.col("c_custkey").alias("id")
    )
    return G.bfs_levels(edges, seeds, max_depth=4)


@register(
    "graph_cc_incremental",
    """WITH RECURSIVE e AS (
         SELECT c_custkey AS u, (c_custkey*c_custkey) % 1500 + 1 AS v
         FROM customer WHERE c_custkey <> (c_custkey*c_custkey) % 1500 + 1),
       sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
       nds AS (SELECT DISTINCT u AS id FROM sym),
       walk(id, lab) AS (
         SELECT id, id FROM nds
         UNION
         SELECT w.id, s.v FROM walk w JOIN sym s ON s.u = w.lab
       )
       SELECT id, CAST(min(lab) AS BIGINT) AS component
       FROM walk GROUP BY id""",
)
def graph_cc_incremental_q(spark, sf):
    """INCREMENTAL connected-components maintenance (operators/graph.py::
    incremental_components, r9): the standing labeling built from the
    even-parity half of the quadratic-scatter edge set is folded forward
    with the odd-parity half as the NEW batch — merges, bridges through
    globally-minimal new ids, and brand-new components all land through a
    label-graph fixpoint BOUNDED BY THE NEW EDGES while the labeled
    corpus is scanned twice and shuffled never (two broadcast-map
    passes).  The maintenance identity makes the oracle exact: an
    existing label IS its component's min id, so incrementing equals the
    full closure over ALL edges — which is what the recursive CTE
    computes.  This completes the incremental-dedup story: the pair
    finders (dedup_incremental / dedup_semantic_incremental) produce the
    new edges; this keeps the cluster assignment current without
    re-clustering the corpus."""
    from trafficbigdatasearch_spark.operators import graph as G

    cust = load_table(spark, sf, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("id_a"),
        ((F.col("c_custkey") * F.col("c_custkey")) % 1500 + 1).alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    old = edges.filter((F.col("id_a") + F.col("id_b")) % 2 == 0)
    new = edges.filter((F.col("id_a") + F.col("id_b")) % 2 == 1)
    base = G.connected_components(old)
    return G.incremental_components(base, new)


@register(
    "j_fuzzy_name",
    """WITH n AS (SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM part GROUP BY p_name)
       SELECT a.p_name AS name_a, b.p_name AS name_b,
              CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance,
              CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
       FROM n a JOIN n b
         ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
        AND a.p_name < b.p_name
        AND levenshtein(a.p_name, b.p_name) <= 2""",
)
def j_fuzzy_name_q(spark, sf):
    """FUZZY (edit-distance) JOIN via blocking
    (operators/joins.py::blocked_levenshtein_join) — entity resolution for
    short keys: near-identical part names, blocked on the head noun so
    Levenshtein runs only inside blocks (one equi join on the block key)
    instead of over all name pairs — the short-string sibling of the dedup
    module's LSH banding, with the same recall contract (pairs sharing no
    block are unseen; add blocking passes and union for recall).  Names
    are first collapsed to distinct (name, count); n_pairs = cnt_a*cnt_b
    scores how many raw part pairs each name pair represents."""
    names = (
        load_table(spark, sf, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b"))
    out = joins.blocked_levenshtein_join(
        a,
        b,
        "name_a",
        "name_b",
        F.split(F.col("name_a"), " ")[1],
        F.split(F.col("name_b"), " ")[1],
        max_distance=2,
    )
    return out.filter(F.col("name_a") < F.col("name_b")).select(
        "name_a",
        "name_b",
        "edit_distance",
        (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
    )


@register(
    "f_higher_order",
    """WITH q AS (SELECT vec_id,
              list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
            FROM embeddings)
       SELECT vec_id,
              CAST(list_sum(list_transform(v, x -> abs(x))) AS BIGINT) AS l1,
              CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
              CAST(list_dot_product(v[1:32], v[33:64]) AS BIGINT) AS half_dot,
              CAST(len(list_filter(v, x -> abs(x) > 2500)) AS INTEGER)
                AS n_extreme
       FROM q""",
)
def f_higher_order_q(spark, sf):
    """HIGHER-ORDER ARRAY FUNCTION surface (§2.6 beyond the reference,
    which has no array types at all): transform / filter / aggregate /
    zip_with / slice composed over the embedding arrays, all JVM-side
    Catalyst lambda expressions — zero Python, zero explode (the naive
    relational form explodes 64 rows/vector through a shuffle; the lambda
    form is a row-local fold at scan speed).  Quantized to the registry's
    1e-4 integer lattice so every measure is integer-exact and
    hash-comparable: L1 norm, positive-component count, first-half x
    second-half dot product, extreme-component count."""
    emb = load_table(spark, sf, "embeddings")
    v = V.quantize(F.col("embedding"))
    q = emb.select("vec_id", v.alias("v"))
    return q.select(
        "vec_id",
        F.aggregate(
            F.transform(F.col("v"), lambda x: F.abs(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("l1"),
        F.size(F.filter(F.col("v"), lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.zip_with(
                F.slice(F.col("v"), 1, 32),
                F.slice(F.col("v"), 33, 32),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("half_dot"),
        F.size(F.filter(F.col("v"), lambda x: F.abs(x) > 2500)).alias(
            "n_extreme"
        ),
    )


@register(
    "stream_partial_maintenance",
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS total,
              CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*)
                AS avg_value,
              CAST(MIN(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100
                AS min_value,
              CAST(MAX(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100
                AS max_value
       FROM events GROUP BY event_type""",
)
def stream_partial_maintenance_q(spark, sf):
    """STREAMING-MAINTAINED incremental aggregates — a_incremental_merge's
    batch-split partials, maintained continuously instead: the bounded
    event stream runs through streaming/sink.py::foreach_batch_merge_partials
    (each micro-batch collapsed to mergeable integer partials, upserted
    under its batch id — replay-idempotent), then query time merges the
    partial table and finalizes.  Same oracle as the batch row: the
    streamed partial state must equal a full rescan bit-for-bit.  This is
    the no-state-store maintenance path — per-key state lives in parquet
    partials, not the streaming state store, so there is no watermark
    eviction pressure and the history horizon is unbounded."""
    import os
    import uuid

    from trafficbigdatasearch_spark.operators import incremental as I
    from trafficbigdatasearch_spark.streaming import sink as SK

    src = _stream_events_source(spark, sf).withColumn(
        "v_cents", _cents(F.col("value"))
    )
    d = _scratch("stream_partials", sf)
    out = os.path.join(d, "partials")
    q = (
        src.writeStream.foreachBatch(
            SK.foreach_batch_merge_partials(out, ["event_type"], "v_cents")
        )
        .option("checkpointLocation", os.path.join(d, "cp-" + uuid.uuid4().hex[:8]))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("stream_partial_maintenance: did not drain in 300s")
    partials = spark.read.parquet(out).drop("_batch_id")
    return I.finalize(
        I.merge_partials([partials], ["event_type"]), ["event_type"]
    )


@register(
    "q4_priority_exists",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def q4_priority_exists_q(spark, sf):
    """TPC-H Q4 shape — correlated EXISTS subquery, counted by priority
    (adapted to the testdata's columns: "has a returned line" instead of
    commit<receipt, which the generator lacks).  Registered through
    ``spark.sql`` EXISTS on purpose: it pins Catalyst's subquery
    DECORRELATION — the optimizer must rewrite the per-row EXISTS probe
    into one left-semi hash join (RewritePredicateSubquery), the only
    shape that scales; a row-at-a-time subquery evaluation would be
    O(|orders| × probe).  Semi-join plan pinned in tests/test_plans.py."""
    load_table(spark, sf, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
           FROM v_orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
             AND EXISTS (SELECT 1 FROM v_lineitem
                         WHERE l_orderkey = o_orderkey
                           AND l_returnflag = 'R')
           GROUP BY o_orderpriority"""
    )


@register(
    "a_exact_percentiles",
    """SELECT event_type,
              quantile_cont(CAST(round(value*100) AS BIGINT), 0.50) AS p50_cents,
              quantile_cont(CAST(round(value*100) AS BIGINT), 0.90) AS p90_cents,
              quantile_cont(CAST(round(value*100) AS BIGINT), 0.99) AS p99_cents
       FROM events GROUP BY event_type""",
)
def a_exact_percentiles_q(spark, sf):
    """EXACT percentiles per group (vs the mergeable KLL approximation in
    the sketch family): Spark's ``percentile`` sorts within each hash
    partition group — one shuffle, no global sort.  Cross-engine
    determinism: computed over integer CENTS so both engines interpolate
    ``lo + (hi - lo) * frac`` between exact integers with one IEEE
    multiply-add — bit-identical doubles (percentile over raw doubles
    would compare two engines' float sums).  At 100 TB exact per-group
    percentiles are the spill risk (a group's values must co-locate);
    the KLL sketch rollup is the bounded-memory alternative and this row
    is its audit baseline."""
    ev = load_table(spark, sf, "events")
    cents = _cents(F.col("value"))
    return ev.groupBy("event_type").agg(
        F.percentile(cents, F.lit(0.50)).alias("p50_cents"),
        F.percentile(cents, F.lit(0.90)).alias("p90_cents"),
        F.percentile(cents, F.lit(0.99)).alias("p99_cents"),
    )


@register(
    "f_variant_extract",
    """SELECT event_id,
              CAST(props->>'$.k' AS INTEGER) AS k_val,
              CAST(CASE WHEN json_extract(props, '$.missing') IS NULL
                   THEN 0 ELSE 1 END AS INTEGER) AS has_missing
       FROM events WHERE event_id < 2000""",
)
def f_variant_extract_q(spark, sf):
    """Semi-structured VARIANT surface (Spark 4's open-schema JSON type,
    beyond the fixed-schema ``from_json`` used in f_json_extract):
    ``parse_json`` ingests the props column ONCE into the binary variant
    encoding; ``try_variant_get`` then extracts typed paths without
    re-parsing text per access — the pattern for 100 TB event-property
    columns where fields vary by event type and a declared struct schema
    would either drop fields or explode column count.  Missing paths
    yield NULL (mapped to a 0/1 flag so the oracle compare is
    dtype-stable)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_val"),
        F.when(
            F.try_variant_get(v, "$.missing", "string").isNull(), F.lit(0)
        ).otherwise(F.lit(1)).alias("has_missing"),
    )


@register(
    "pipeline_entity_resolution",
    """WITH RECURSIVE n AS (
         SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt FROM part
         GROUP BY p_name),
       pairs AS (
         SELECT a.p_name AS na, b.p_name AS nb
         FROM n a JOIN n b
           ON split_part(a.p_name,' ',2) = split_part(b.p_name,' ',2)
          AND a.p_name < b.p_name
          AND levenshtein(a.p_name, b.p_name) <= 2),
       sym AS (SELECT na, nb FROM pairs UNION SELECT nb, na FROM pairs),
       reach(a, b) AS (
         SELECT na, nb FROM sym
         UNION
         SELECT r.a, s.nb FROM reach r JOIN sym s ON s.na = r.b
         WHERE s.nb <> r.a),
       canon AS (
         SELECT n.p_name AS name, n.cnt,
                COALESCE(LEAST(n.p_name, m.mn), n.p_name) AS canonical_name
         FROM n LEFT JOIN (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) m
           ON m.a = n.p_name)
       SELECT canonical_name,
              CAST(COUNT(*) AS BIGINT) AS n_variants,
              CAST(SUM(cnt) AS BIGINT) AS n_parts
       FROM canon GROUP BY canonical_name""",
)
def pipeline_entity_resolution_q(spark, sf):
    """ENTITY RESOLUTION end-to-end — the composition the fuzzy join and
    connected components exist for: near-identical part names are blocked
    + matched (blocked_levenshtein_join, d<=2), the match pairs resolve
    into entity clusters via the SAME alternating-star CC engine the dedup
    pipeline uses (``cast=None``: the algorithm needs only a total order,
    so string keys cluster directly — no surrogate-id round trip), and
    each cluster elects its lexicographic-min name as the golden record.
    Transitivity is the point: 'cold bolt'-'old bolt'-'red bolt'-'new
    bolt' chain into ONE entity even though the ends are distance 4
    apart.  Oracle = recursive-CTE reachability closure over the identical
    pair set."""
    from trafficbigdatasearch_spark.operators import graph as G

    names = (
        load_table(spark, sf, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
    )
    a = names.select(F.col("p_name").alias("na"))
    b = names.select(F.col("p_name").alias("nb"))
    pairs = joins.blocked_levenshtein_join(
        a, b, "na", "nb",
        F.split(F.col("na"), " ")[1], F.split(F.col("nb"), " ")[1],
        max_distance=2,
    ).filter(F.col("na") < F.col("nb"))
    cc = G.connected_components(
        pairs, "na", "nb",
        nodes=names.select(F.col("p_name").alias("id")),
        cast=None,
    )
    return (
        names.join(cc, names["p_name"] == cc["id"])
        .groupBy(F.col("component").alias("canonical_name"))
        .agg(
            F.count("*").alias("n_variants"),
            F.sum("cnt").alias("n_parts"),
        )
    )


@register(
    "pipeline_incremental_refresh",
    """WITH new AS (SELECT o_orderkey, o_orderstatus,
                           CASE WHEN o_orderkey % 5 = 0
                                THEN o_totalprice + 10.0
                                ELSE o_totalprice END AS o_totalprice
                    FROM orders WHERE o_orderkey % 10 <> 7)
       SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
                AS total,
              CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100
                /COUNT(*) AS avg_value
       FROM new GROUP BY o_orderstatus""",
)
def pipeline_incremental_refresh_q(spark, sf):
    """INCREMENTAL VIEW MAINTENANCE — diff-driven aggregate refresh, the
    composition of snapshot_diff and the additive delta algebra
    (operators/incremental.py::additive_partial/apply_delta): starting
    from the OLD snapshot's aggregate, the new aggregate is produced by
    applying signed partials over only the CHANGED rows — inserts
    positive, deletes negative, updates as delete+insert — and the result
    must equal the oracle's direct rescan of the new snapshot
    bit-for-bit.  Count/sum form a group (invertible), which is exactly
    why the maintained measures here exclude min/max (monoid-only; a
    removed minimum needs a per-group rescan).  At 100 TB: the refresh
    touches O(churn), never O(table)."""
    from trafficbigdatasearch_spark.operators import incremental as I

    orders = load_table(spark, sf, "orders")
    keys = ["o_orderstatus"]
    price_new = F.when(
        F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10.0
    ).otherwise(F.col("o_totalprice"))
    old = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey", "o_orderstatus", price_new.alias("o_totalprice")
    )
    base = I.additive_partial(old, keys, _cents(F.col("o_totalprice")))
    added = new.join(old.select("o_orderkey"), "o_orderkey", "left_anti")
    removed = old.join(new.select("o_orderkey"), "o_orderkey", "left_anti")
    # updates: both present, value differs — retract old row, insert new
    both = old.alias("o").join(new.alias("n"), "o_orderkey").filter(
        ~F.col("o.o_totalprice").eqNullSafe(F.col("n.o_totalprice"))
        | ~F.col("o.o_orderstatus").eqNullSafe(F.col("n.o_orderstatus"))
    )
    upd_old = both.select(
        F.col("o.o_orderstatus").alias("o_orderstatus"),
        F.col("o.o_totalprice").alias("o_totalprice"),
    )
    upd_new = both.select(
        F.col("n.o_orderstatus").alias("o_orderstatus"),
        F.col("n.o_totalprice").alias("o_totalprice"),
    )
    cents = _cents(F.col("o_totalprice"))
    deltas = [
        I.additive_partial(added, keys, cents),
        I.additive_partial(removed, keys, cents, sign=-1),
        I.additive_partial(upd_old, keys, cents, sign=-1),
        I.additive_partial(upd_new, keys, cents),
    ]
    return I.finalize_additive(I.apply_delta(base, deltas, keys), keys)


@register(
    "j_interval_overlap",
    """WITH spans AS (
         SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
                epoch_ms(MIN(ts)) AS lo, epoch_ms(MAX(ts)) AS hi
         FROM events GROUP BY 1, 2),
       w AS (SELECT DISTINCT date_trunc('day', ts) AS s FROM events),
       w2 AS (SELECT strftime(s, '%Y-%m-%d') AS w_id,
                     epoch_ms(s) AS wlo,
                     epoch_ms(s + INTERVAL 36 HOUR) AS whi
              FROM w)
       SELECT user_id, d, w_id,
              CAST(LEAST(hi, whi) - GREATEST(lo, wlo) AS BIGINT) AS overlap_ms
       FROM spans JOIN w2 ON lo <= whi AND wlo <= hi""",
)
def j_interval_overlap_q(spark, sf):
    """INTERVAL × INTERVAL overlap join (operators/joins.py::
    interval_overlap_join) — the range-vs-range member of the range-join
    family (j2 = keyed point-in-interval, j_range_keyless = keyless
    point-in-interval): per-user daily activity spans against overlapping
    36-hour maintenance windows, overlap duration in exact millis.  Both
    interval sets explode into 6-hour buckets and equi-join on the
    bucket; each overlapping pair CLAIMS exactly one bucket (the first
    bucket of the intersection), so the output is exactly-once with NO
    dedup exchange.  Oracle = the quadratic overlap join."""
    ev = load_table(spark, sf, "events")
    spans = ev.groupBy(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
    ).agg(
        F.unix_millis(F.min("ts")).alias("lo"),
        F.unix_millis(F.max("ts")).alias("hi"),
    )
    w = (
        ev.select(F.date_trunc("day", "ts").alias("s"))
        .distinct()
        .select(
            F.date_format("s", "yyyy-MM-dd").alias("w_id"),
            F.unix_millis(F.col("s")).alias("wlo"),
            F.unix_millis(F.col("s") + F.expr("INTERVAL 36 HOURS")).alias("whi"),
        )
    )
    j = joins.interval_overlap_join(
        spans, w, "lo", "hi", "wlo", "whi", bucket_width=6 * 3600 * 1000
    )
    return j.select(
        "user_id",
        "d",
        "w_id",
        (F.least(F.col("hi"), F.col("whi")) - F.greatest(F.col("lo"), F.col("wlo")))
        .cast("bigint")
        .alias("overlap_ms"),
    )


@register(
    "w_pattern_sequence",
    """WITH seqs AS (
         SELECT user_id,
                string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
                CAST(COUNT(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id)
       SELECT user_id, n_events,
              CAST(CASE WHEN regexp_matches(seq, 'signup.*purchase')
                   THEN 1 ELSE 0 END AS INTEGER) AS converted,
              CAST(CASE WHEN regexp_matches(seq, 'error,error,error')
                   THEN 1 ELSE 0 END AS INTEGER) AS rage_errors
       FROM seqs""",
)
def w_pattern_sequence_q(spark, sf):
    """SEQUENCE PATTERN MATCHING over per-user event streams (the
    MATCH_RECOGNIZE-class question, composed from primitives): each
    user's events are ordered into one comma-joined type sequence
    (deterministic tiebreak ts, event_id) and regex-scanned — 'did a
    signup ever lead to a purchase' (conversion with any gap) and 'three
    errors back-to-back' (exact adjacency — the comma-join makes
    adjacency expressible, unlike the funnel's step-min formulation).
    ONE shuffle (groupBy user); the per-user sequence is the documented
    memory bound — at 100 TB, sessionize first (w_sessionize) so
    sequences are per-session, or cap with slice(array, 1, K).  Plan
    note: collect_list+array_sort is a row-local fold after the
    exchange; no window, no second shuffle."""
    ev = load_table(spark, sf, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type").alias("et")))
            ),
            lambda x: x["et"],
        ),
        ",",
    )
    g = ev.groupBy("user_id").agg(
        seq.alias("seq"), F.count("*").alias("n_events")
    )
    return g.select(
        "user_id",
        "n_events",
        F.when(F.col("seq").rlike("signup.*purchase"), 1)
        .otherwise(0)
        .cast("int")
        .alias("converted"),
        F.when(F.col("seq").rlike("error,error,error"), 1)
        .otherwise(0)
        .cast("int")
        .alias("rage_errors"),
    )


@register(
    "pipeline_semantic_dedup",
    f"""WITH RECURSIVE c AS (SELECT vec_id, label, {_QVEC} AS qv FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS ia, b.vec_id AS ib
         FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_dot_product(a.qv, b.qv) /
               (sqrt(list_dot_product(a.qv, a.qv)) *
                sqrt(list_dot_product(b.qv, b.qv))) >= 0.4),
       sym AS (SELECT ia, ib FROM pairs UNION SELECT ib, ia FROM pairs),
       reach(a, b) AS (
         SELECT ia, ib FROM sym
         UNION
         SELECT r.a, s.ib FROM reach r JOIN sym s ON s.ia = r.b
         WHERE s.ib <> r.a),
       comp AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS component
                FROM reach GROUP BY a)
       SELECT e.vec_id,
              COALESCE(comp.component, e.vec_id) AS component,
              CAST(CASE WHEN COALESCE(comp.component, e.vec_id) = e.vec_id
                   THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
       FROM (SELECT vec_id FROM embeddings) e
       LEFT JOIN comp ON comp.vec_id = e.vec_id""",
)
def pipeline_semantic_dedup_q(spark, sf):
    """SEMANTIC (embedding-space) DEDUP end-to-end — the third dedup
    pipeline alongside the lexical one (pipeline_dedup_corpus: shingles)
    and the perceptual one (mm_phash_pairs: pHash): cosine near-dup pairs
    (label-blocked, quantized-exact scores) resolve through the shared CC
    engine into semantic clusters, min-id keeper per cluster, isolated
    vectors keep themselves.  This is the text-paraphrase/near-translation
    dedup shape that lexical shingles cannot see.  Oracle = recursive
    closure over the identical pair SQL."""
    from trafficbigdatasearch_spark.operators import graph as G

    emb = load_table(spark, sf, "embeddings")
    pairs = similarity.embedding_near_dup_pairs(
        emb, threshold=0.4, block_col="label"
    )
    cc = G.connected_components(
        pairs, "id_a", "id_b", nodes=emb.select(F.col("vec_id").alias("id"))
    )
    return cc.select(
        F.col("id").alias("vec_id"),
        "component",
        F.when(F.col("id") == F.col("component"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_keeper"),
    )


@register(
    "spatial_density",
    """WITH pts AS (SELECT c_custkey AS id,
                           ((c_custkey * 48271) % 99991) % 1000 AS x,
                           ((c_custkey * 16807) % 104729) % 1000 AS y
                    FROM customer),
       pairs AS (
         SELECT a.id AS ia, b.id AS ib
         FROM pts a JOIN pts b
           ON a.id < b.id
          AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225),
       sides AS (SELECT ia AS id FROM pairs UNION ALL SELECT ib FROM pairs),
       cnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sides GROUP BY id)
       SELECT pts.id, COALESCE(cnt.n, 0) AS n_neighbors
       FROM pts LEFT JOIN cnt ON cnt.id = pts.id""",
)
def spatial_density_q(spark, sf):
    """Per-point neighbor DENSITY within radius r (operators/spatial.py::
    radius_join_counts) — the hotspot score over the same grid join as
    j_spatial_grid: symmetric counts from the one-shot pair set, isolated
    points report 0.  This is the accident-hotspot / station-coverage
    question asked as a per-entity measure instead of a pair list; at
    scale it is the density stage of DBSCAN-style clustering (core-point
    test = n_neighbors >= minPts)."""
    from trafficbigdatasearch_spark.operators import spatial

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 48271) % 99991) % 1000).alias("x"),
        (((F.col("c_custkey") * 16807) % 104729) % 1000).alias("y"),
    )
    return spatial.radius_join_counts(pts, "id", "x", "y", radius=15)


@register(
    "pipeline_dbscan",
    """WITH RECURSIVE pts AS (
         SELECT c_custkey AS id,
                ((c_custkey * 48271) % 99991) % 1000 AS x,
                ((c_custkey * 16807) % 104729) % 1000 AS y
         FROM customer),
       pairs AS (
         SELECT a.id AS ia, b.id AS ib
         FROM pts a JOIN pts b
           ON a.id < b.id
          AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225),
       sides AS (SELECT ia AS id FROM pairs UNION ALL SELECT ib FROM pairs),
       cnt AS (SELECT id, COUNT(*) AS n FROM sides GROUP BY id),
       core AS (SELECT id FROM cnt WHERE n >= 3),
       cp AS (SELECT ia, ib FROM pairs
              WHERE ia IN (SELECT id FROM core)
                AND ib IN (SELECT id FROM core)),
       csym AS (SELECT ia, ib FROM cp UNION SELECT ib, ia FROM cp),
       reach(a, b) AS (
         SELECT ia, ib FROM csym
         UNION
         SELECT r.a, s.ib FROM reach r JOIN csym s ON s.ia = r.b
         WHERE s.ib <> r.a),
       comp AS (
         SELECT core.id,
                COALESCE(LEAST(core.id, m.mn), core.id) AS component
         FROM core LEFT JOIN
              (SELECT a, MIN(b) AS mn FROM reach GROUP BY a) m
           ON m.a = core.id),
       asym AS (SELECT ia, ib FROM pairs
                UNION ALL SELECT ib, ia FROM pairs),
       border AS (
         SELECT asym.ib AS id, MIN(comp.component) AS cluster
         FROM asym JOIN comp ON comp.id = asym.ia
         WHERE asym.ib NOT IN (SELECT id FROM core)
         GROUP BY asym.ib)
       SELECT id, CAST(cluster AS BIGINT) AS cluster, role FROM (
         SELECT id, component AS cluster, 'core' AS role FROM comp
         UNION ALL
         SELECT id, cluster, 'border' FROM border
         UNION ALL
         SELECT pts.id, -1, 'noise' FROM pts
         WHERE pts.id NOT IN (SELECT id FROM comp)
           AND pts.id NOT IN (SELECT id FROM border))""",
)
def pipeline_dbscan_q(spark, sf):
    """DISTRIBUTED DBSCAN (operators/spatial.py::dbscan) — density
    clustering composed entirely from verified pieces: grid radius join
    (eps-neighborhoods) -> pair counts (core test, minPts=3) -> connected
    components over the core-core subgraph (flood fill replaced by the
    O(log² n) alternating-star fixpoint) -> border points adopt the min
    cluster among their core neighbors; the rest is noise.  Min-id labels
    make the output deterministic under any partitioning — textbook
    DBSCAN's border assignment is scan-order-dependent, which cannot
    exist at 100 TB.  Oracle = the same construction over the quadratic
    pair join with a recursive-CTE closure."""
    from trafficbigdatasearch_spark.operators import spatial

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 48271) % 99991) % 1000).alias("x"),
        (((F.col("c_custkey") * 16807) % 104729) % 1000).alias("y"),
    )
    return spatial.dbscan(pts, "id", "x", "y", radius=15, min_pts=3)


@register(
    "sample_importance",
    f"""SELECT doc_id, n_chars
       FROM documents
       WHERE {_BUCKET_SQL.format(salt='importance')} <
             CAST(floor(LEAST(GREATEST(n_chars / 1000.0, 0.0), 1.0)
                        * {sampling.BUCKETS}) AS BIGINT)""",
)
def sample_importance_q(spark, sf):
    """IMPORTANCE (weighted Bernoulli) sampling
    (operators/sampling.py::importance_sample): each document's keep
    probability is its own quality proxy (length-based here: n_chars/1000
    clamped to [0,1]), and the accept test is the md5-uniform draw under
    that per-row rate — quality-weighted data mixing with zero shuffle,
    zero RNG state.  A row's fate depends only on (key, weight): reruns,
    retries, repartitions, and corpus growth never flip it — the
    stability that daily-rebuilt training mixes need.  Oracle recomputes
    the identical md5 threshold test."""
    docs = load_table(spark, sf, "documents")
    w = F.col("n_chars") / 1000.0
    return sampling.importance_sample(docs, "doc_id", w).select(
        "doc_id", "n_chars"
    )


_PR_SCALE = 10**12


_PR_N = 1500


_PR_BASE = (3 * _PR_SCALE) // (20 * _PR_N)


def _pr_oracle() -> str:
    parts = [
        f"e AS (SELECT range AS u, (range*range) % {_PR_N} AS v "
        f"FROM range({_PR_N}))",
        "nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e)",
        "deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u)",
        f"r0 AS (SELECT id, CAST({_PR_SCALE // _PR_N} AS BIGINT) AS rank "
        "FROM nodes)",
    ]
    for k in range(1, 4):
        parts.append(
            f"s{k} AS (SELECT e.v, SUM(r{k-1}.rank // deg.d) AS s "
            f"FROM e JOIN r{k-1} ON r{k-1}.id = e.u "
            "JOIN deg ON deg.u = e.u GROUP BY e.v)"
        )
        parts.append(
            f"r{k} AS (SELECT nodes.id, "
            f"CAST({_PR_BASE} + (17 * COALESCE(s{k}.s, 0)) // 20 AS BIGINT) "
            f"AS rank FROM nodes LEFT JOIN s{k} ON s{k}.v = nodes.id)"
        )
    return "WITH " + ",\n       ".join(parts) + "\n       SELECT id, rank FROM r3"


_KC_N = 1500


_KC_K = 3


_KC_ROUNDS = 10  # peel converges at 8 on this graph (1489-node true 3-core)


def _kcore_oracle() -> str:
    # MATERIALIZED is load-bearing: each CTE is referenced 2-3x per round;
    # DuckDB's default inlining would re-evaluate the whole chain per
    # reference — exponential in round count (measured: 6 plain rounds
    # time out, 16 materialized rounds run in 60 ms)
    parts = [
        f"""raw AS MATERIALIZED (
           SELECT range AS u, (range + 1) % {_KC_N} AS v FROM range({_KC_N})
           UNION ALL
           SELECT range, (range + 2) % {_KC_N} FROM range({_KC_N})
           WHERE range < 900
           UNION ALL
           SELECT range, (range*range + 1) % {_KC_N} FROM range({_KC_N}))""",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, "
        "greatest(u, v) AS v FROM raw WHERE u <> v)",
        f"nodes AS (SELECT range AS id FROM range({_KC_N}))",
    ]
    # one extra d/s stage past the last edge deletion — membership is the
    # FINAL degree pass over e{ROUNDS}, matching kcore_membership's
    # "n complete peels" semantics
    for r in range(1, _KC_ROUNDS + 2):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT n, COUNT(*) AS d FROM "
            f"(SELECT u AS n FROM e{r-1} UNION ALL SELECT v FROM e{r-1}) t{r} "
            "GROUP BY n)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {_KC_K})"
        )
        if r <= _KC_ROUNDS:
            parts.append(
                f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{r-1} e "
                f"JOIN s{r} a ON a.n = e.u JOIN s{r} b ON b.n = e.v)"
            )
    last = f"s{_KC_ROUNDS + 1}"
    return (
        "WITH "
        + ",\n       ".join(parts)
        + f"\n       SELECT nodes.id, CAST(CASE WHEN {last}.n IS NOT NULL "
        "THEN 1 ELSE 0 END AS INTEGER) AS in_kcore "
        f"FROM nodes LEFT JOIN {last} ON {last}.n = nodes.id"
    )


@register("graph_kcore", _kcore_oracle())
def graph_kcore_q(spark, sf):
    """Bounded k-CORE peeling (operators/graph.py::kcore_membership): 10
    rounds of drop-degree-below-3 over a 1500-node graph mixing a dense
    chord band (cycle + partial chords — the surviving community) with
    quadratic-functional tendrils (what peels away) — the cohesion filter
    separating dense communities from tendrils (spam farms vs organic
    clusters, template families vs genuinely interlinked docs).  The peel
    converges at round 8 here, so the row verifies the TRUE 3-core (1489
    in, 11 out); fixed round count keeps the operator a pure function of
    (edges, k, rounds) — no driver convergence sync, retry-deterministic,
    and the oracle is the same peel unrolled as materialized CTE stages.
    Per round: one map-side-combined degree aggregate + two semi joins,
    lineage checkpointed."""
    from trafficbigdatasearch_spark.operators import graph as G

    ids = spark.range(_KC_N)
    edges = (
        ids.select(F.col("id").alias("u"), ((F.col("id") + 1) % _KC_N).alias("v"))
        .union(
            ids.filter(F.col("id") < 900).select(
                F.col("id"), (F.col("id") + 2) % _KC_N
            )
        )
        .union(
            ids.select(F.col("id"), (F.col("id") * F.col("id") + 1) % _KC_N)
        )
    )
    return G.kcore_membership(
        edges, k=_KC_K, n_rounds=_KC_ROUNDS, nodes=ids
    )


_LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    parts = [
        f"""raw AS MATERIALIZED (
           SELECT range AS u, (range + 1) % {_KC_N} AS v FROM range({_KC_N})
           UNION ALL
           SELECT range, (range + 2) % {_KC_N} FROM range({_KC_N})
           WHERE range < 900
           UNION ALL
           SELECT range, (range*range + 1) % {_KC_N} FROM range({_KC_N}))""",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, "
        "greatest(u, v) AS v FROM raw WHERE u <> v)",
        "sym AS MATERIALIZED (SELECT u, v FROM e0 "
        "UNION ALL SELECT v, u FROM e0)",
        f"nodes AS MATERIALIZED (SELECT range AS id FROM range({_KC_N}))",
        "l0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes)",
    ]
    for r in range(1, _LPA_ROUNDS + 1):
        parts.append(
            f"nb{r} AS MATERIALIZED (SELECT id, lab, COUNT(*) AS c FROM "
            f"(SELECT s.v AS id, l.lab FROM sym s JOIN l{r-1} l ON l.id = s.u "
            f"UNION ALL SELECT id, lab FROM l{r-1}) t{r} "
            "GROUP BY id, lab)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT id, "
            f"arg_max(lab, c * 2147483648 - lab) AS lab "
            f"FROM nb{r} GROUP BY id)"
        )
    return (
        "WITH "
        + ",\n       ".join(parts)
        + f"\n       SELECT id, lab AS community FROM l{_LPA_ROUNDS}"
    )


@register("graph_label_prop", _lpa_oracle())
def graph_label_prop_q(spark, sf):
    """Deterministic label-propagation COMMUNITIES (operators/graph.py::
    label_propagation), 4 synchronous rounds over the same chord-band +
    tendril graph as graph_kcore — the detector that splits one CONNECTED
    graph into densely-linked groups, which connected components cannot
    (CC gives a single label here).  Textbook LPA is scan-order- and
    tie-random — impossible at 100 TB where retries and speculation would
    flap; this formulation packs (count, label) into ONE composite argmax
    (counts dominate, smaller label breaks ties), adds a self-vote (kills
    the two-node swap oscillation), and fixes the round count,
    making the result a pure function of the graph and the oracle the
    same rounds unrolled as materialized CTEs."""
    from trafficbigdatasearch_spark.operators import graph as G

    ids = spark.range(_KC_N)
    edges = (
        ids.select(F.col("id").alias("u"), ((F.col("id") + 1) % _KC_N).alias("v"))
        .union(
            ids.filter(F.col("id") < 900).select(
                F.col("id"), (F.col("id") + 2) % _KC_N
            )
        )
        .union(
            ids.select(F.col("id"), (F.col("id") * F.col("id") + 1) % _KC_N)
        )
    )
    return G.label_propagation(edges, n_rounds=_LPA_ROUNDS, nodes=ids)


_SSSP_ROUNDS = 8


def _sssp_oracle() -> str:
    parts = [
        f"""e AS MATERIALIZED (
           SELECT range AS u, (range * 7 + 3) % {_KC_N} AS v,
                  (range % 10) + 1 AS w FROM range({_KC_N})
           UNION ALL
           SELECT range, (range + 1) % {_KC_N}, (range % 5) + 1
           FROM range({_KC_N}))""",
        f"nodes AS (SELECT range AS id FROM range({_KC_N}))",
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS id, "
        "CAST(0 AS BIGINT) AS dist)",
    ]
    for r in range(1, _SSSP_ROUNDS + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM "
            f"(SELECT id, dist FROM d{r-1} "
            f"UNION ALL "
            f"SELECT e.v AS id, d.dist + e.w FROM e "
            f"JOIN d{r-1} d ON d.id = e.u) t{r} GROUP BY id)"
        )
    last = f"d{_SSSP_ROUNDS}"
    return (
        "WITH "
        + ",\n       ".join(parts)
        + f"\n       SELECT nodes.id, COALESCE({last}.dist, -1) AS dist "
        f"FROM nodes LEFT JOIN {last} ON {last}.id = nodes.id"
    )


@register("graph_sssp", _sssp_oracle())
def graph_sssp_q(spark, sf):
    """Bounded weighted SHORTEST PATHS (operators/graph.py::sssp_bounded):
    8 synchronous Bellman-Ford relaxations from node 0 over a directed
    two-out-edge graph with integer weights — routing distance / weighted
    influence radius, where graph_bfs_reach counts unweighted hops.
    Result is exact for every node whose shortest path uses <= 8 edges
    (here the expander-style (7x+3) jumps reach all 1500 nodes well
    within 8), -1 for the unreached; fixed rounds keep it a pure function
    of (edges, seeds, rounds) — no convergence sync, integer distances
    bit-identical to the oracle's unrolled materialized-CTE relaxations."""
    from trafficbigdatasearch_spark.operators import graph as G

    ids = spark.range(_KC_N)
    edges = ids.select(
        F.col("id").alias("u"),
        ((F.col("id") * 7 + 3) % _KC_N).alias("v"),
        ((F.col("id") % 10) + 1).alias("w"),
    ).union(
        ids.select(
            F.col("id"), (F.col("id") + 1) % _KC_N, (F.col("id") % 5) + 1
        )
    )
    seeds = spark.range(1).select(F.col("id"))
    dist = G.sssp_bounded(edges, seeds, n_rounds=_SSSP_ROUNDS)
    return ids.join(dist, "id", "left").select(
        "id", F.coalesce("dist", F.lit(-1)).alias("dist")
    )


@register("graph_pagerank", _pr_oracle())
def graph_pagerank_q(spark, sf):
    """Integer-exact PageRank (operators/graph.py::pagerank_integer), 3
    iterations at damping 17/20 over the deterministic quadratic-residue
    functional graph on 1500 nodes (every node has out-degree 1 — no
    dangling mass, so the oracle needs no redistribution term).  Scaled-
    bigint ranks with integer floor-division make the whole chain
    bit-identical to the oracle's unrolled CTE iterations — the float
    formulation could not be hash-compared across engines.  Each round is
    one hash join + one map-side-combined aggregate; fixed iteration
    count -> no driver convergence sync (same argument as
    graph_bfs_reach)."""
    from trafficbigdatasearch_spark.operators import graph as G

    ids = spark.range(_PR_N)
    edges = ids.select(
        F.col("id").alias("u"), ((F.col("id") * F.col("id")) % _PR_N).alias("v")
    )
    return G.pagerank_integer(edges, n_iter=3, scale=_PR_SCALE)


@register(
    "ts_resample_ohlc",
    """SELECT user_id, date_trunc('hour', ts) AS bucket,
              arg_min(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS open,
              max(value) AS high,
              min(value) AS low,
              arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM events GROUP BY user_id, date_trunc('hour', ts)""",
)
def ts_resample_ohlc_q(spark, sf):
    """Time-series RESAMPLE (operators/timeseries.py::resample_ohlc): the
    irregular per-user event stream bucketed to an hourly OHLC grid —
    open/close are min_by/max_by over the native (unix_millis, event_id)
    struct ordering key (deterministic tie-break, exact at any id; the
    SCALING.md r11 ruling), high/low/
    volume ride the same map-side-combined aggregate.  Values pass through
    with no float arithmetic, so doubles hash-compare exactly.  This is the
    hypertable/continuous-aggregate rollup shape: ONE shuffle total, and at
    100 TB the partial aggregation means each executor ships one row per
    (user, hour) it saw, not its raw events."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    ev = load_table(spark, sf, "events")
    return TS.resample_ohlc(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", bucket="hour",
    )


@register(
    "ts_gapfill",
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
def ts_gapfill_q(spark, sf):
    """GAP-FILL + forward-fill (operators/timeseries.py::gapfill_ffill):
    densify each user's hourly grid from its OWN [min, max] span
    (``sequence`` + ``explode`` — row-local spine, no driver calendar, no
    global cross join) and carry the last hourly close forward with one
    ``last(ignorenulls)`` running window.  Two shuffles on user_id total
    (aggregate + window); a key dark for a year inflates only its own
    partition.  This is the sensor-downtime / traffic-station-outage
    completion the reference's per-month scans cannot express."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    ev = load_table(spark, sf, "events")
    return TS.gapfill_ffill(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", bucket="hour",
    )


@register(
    "graph_triangles",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
       raw AS (
         SELECT c_custkey AS u, (c_custkey % n.n) + 1 AS v FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey + 1) % n.n) + 1 FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey + 2) % n.n) + 1 FROM customer, n),
       e AS (
         SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
         FROM raw WHERE u <> v),
       tri AS (
         SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM e e1
         JOIN e e2 ON e2.a = e1.b
         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       corners AS (
         SELECT x AS id FROM tri
         UNION ALL SELECT y FROM tri
         UNION ALL SELECT z FROM tri),
       cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
               FROM corners GROUP BY id)
       SELECT c.c_custkey AS id, COALESCE(cnt.n_triangles, 0) AS n_triangles
       FROM customer c LEFT JOIN cnt ON cnt.id = c.c_custkey""",
)
def graph_triangles_q(spark, sf):
    """Per-node TRIANGLE COUNTS (operators/graph.py::triangle_counts) over
    the circulant graph C_N{1,2,3} on the customer ids — the local
    clustering-coefficient numerator, the classic cohesion feature for
    community/spam detection over near-dup and link graphs.  The Spark side
    is the degree-ordered wedge join (Suri & Vassilvitskii, WWW'11): orient
    edges small->large by (degree, id) so per-node out-degree is
    O(sqrt(|E|)) and the hub-skew wedge explosion of the naive self-join
    cannot happen; the oracle counts the same triangles declaratively with
    an a<b<c three-way join."""
    from trafficbigdatasearch_spark.operators import graph as G

    cust = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id")
    )
    n = cust.count()
    edges = cust.select(
        F.col("id").alias("u"), ((F.col("id") % n) + 1).alias("v")
    ).union(
        cust.select(F.col("id"), ((F.col("id") + 1) % n) + 1)
    ).union(
        cust.select(F.col("id"), ((F.col("id") + 2) % n) + 1)
    )
    return G.triangle_counts(edges, nodes=cust)


@register(
    "a_corr_stats",
    """WITH t AS (
         SELECT l_returnflag AS rflag,
                CAST(round(l_quantity) AS BIGINT) AS x,
                CAST(round(l_discount * 100) AS BIGINT) AS y
         FROM lineitem),
       s AS (
         SELECT rflag,
                CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sum_x,
                CAST(SUM(y) AS BIGINT) AS sum_y,
                CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                CAST(SUM(y * y) AS BIGINT) AS sum_yy,
                CAST(SUM(x * y) AS BIGINT) AS sum_xy
         FROM t GROUP BY rflag)
       SELECT rflag, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
              CAST(n * sum_xy - sum_x * sum_y AS DOUBLE) /
                sqrt(CAST(n * sum_xx - sum_x * sum_x AS DOUBLE) *
                     CAST(n * sum_yy - sum_y * sum_y AS DOUBLE)) AS corr_xy
       FROM s""",
)
def a_corr_stats_q(spark, sf):
    """Distributed Pearson CORRELATION via exact integer sufficient
    statistics: per group, ONE map-side-combined aggregate ships six
    bigints (n, Σx, Σy, Σx², Σy², Σxy) — the mergeable-statistic shape that
    pre-aggregates at the executor and composes across partitions/days,
    unlike a naive two-pass mean-then-deviation formulation.  The
    correlation itself is derived from the integers with one FIXED double
    op sequence, bit-identical across engines.  int64 headroom: per-group
    n·Σxy ≤ n²·x_max·y_max — safe to ~10⁸ rows/group at these value ranges;
    the 100 TB variant casts the moment products to DECIMAL(38,0)."""
    li = load_table(spark, sf, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.round(F.col("l_discount") * 100).cast("bigint")
    s = (
        li.select(F.col("l_returnflag").alias("rflag"), x.alias("x"), y.alias("y"))
        .groupBy("rflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sum_x"),
            F.sum("y").alias("sum_y"),
            F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
            F.sum(F.col("y") * F.col("y")).alias("sum_yy"),
            F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        )
    )
    num = (F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")).cast(
        "double"
    )
    den_x = (F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")).cast(
        "double"
    )
    den_y = (F.col("n") * F.col("sum_yy") - F.col("sum_y") * F.col("sum_y")).cast(
        "double"
    )
    return s.select(
        "rflag", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy",
        (num / F.sqrt(den_x * den_y)).alias("corr_xy"),
    )


@register(
    "text_bm25_topk",
    f"""WITH d AS (SELECT doc_id, {_GUARDED_TOKS} AS t FROM documents),
       dd AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM d),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
                 FROM dd),
       p AS (SELECT doc_id, dl, unnest(t) AS term FROM dd),
       tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
                     CAST(min(dl) AS BIGINT) AS dl
              FROM p WHERE term IN ('join', 'merge', 'query')
              GROUP BY term, doc_id),
       dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       s AS (SELECT term, doc_id, tf, dl, df,
                    (tf * (CAST(1.2 AS DOUBLE) + 1)) /
                      (tf + CAST(1.2 AS DOUBLE) *
                        ((1 - CAST(0.75 AS DOUBLE)) +
                         CAST(0.75 AS DOUBLE) * dl / avgdl)) *
                      (n / df) AS score
             FROM tf JOIN dfq USING (term), stats)
       SELECT term, doc_id, tf, dl, df, score,
              CAST(row_number() OVER (PARTITION BY term
                     ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       FROM s QUALIFY rank <= 10""",
)
def text_bm25_topk_q(spark, sf):
    """BM25 ranking (operators/search.py::bm25_topk) — TF-IDF's production
    successor: saturation (k1=1.2) caps keyword-stuffed term counts,
    length normalization (b=0.75) stops short docs free-riding.  Same
    O(matches) plan as tfidf_topk (pre-filtered postings, broadcast
    df/N/avgdl, one (term, doc) shuffle + per-term top-k window); the one
    new input, per-doc token length, is a row-local size() on the scan.
    Raw-ratio idf keeps the score a fixed IEEE op sequence — oracle-
    hashable to the last bit."""
    from trafficbigdatasearch_spark.operators import search

    docs = load_table(spark, sf, "documents")
    return search.bm25_topk(docs, ["join", "merge", "query"], k=10)


@register("text_bm25_indexed", _REGISTRY["text_bm25_topk"][1])
def text_bm25_indexed_q(spark, sf):
    """BM25 over the PERSISTED positional index (operators/search.py::
    bm25_indexed): identical scores to text_bm25_topk (same oracle SQL),
    but tf comes from partition-pruned posting reads and dl/N/avgdl from
    the doc-stats sidecar the index build writes alongside — ranked
    retrieval without re-tokenizing the corpus at query time, completing
    the indexed-search story (phrase: text_phrase_indexed; ranked: this).
    Shares the per-process index cache with text_phrase_indexed, so the
    build cost is paid once for both."""
    import os

    from trafficbigdatasearch_spark.operators import search

    path = _TEXT_INDEX_CACHE.get(sf)
    if path is None:
        path = os.path.join(_scratch("text_index", sf), "postings")
        search.build_text_index(load_table(spark, sf, "documents"), path)
        _TEXT_INDEX_CACHE[sf] = path
    return search.bm25_indexed(spark, path, ["join", "merge", "query"], k=10)


#: Per-(sf dir) cache of the APPENDED text index (standing build + one
#: appended batch) — the text twin of _IVF_APPEND_CACHE.


_TEXT_APPEND_CACHE: dict[str, str] = {}


@register("text_bm25_append", _REGISTRY["text_bm25_topk"][1])
def text_bm25_append_q(spark, sf):
    """Text-index MAINTENANCE (r10, the ivf_index_append twin): build the
    persisted positional index on the standing corpus (doc_id % 10 != 7),
    then text_index_append folds the held-out batch in — postings land in
    the same md5-bucket partitions, the stats sidecar gains the batch's
    (doc, dl) rows, and the standing index bytes are never read or
    rewritten (operators/search.py::text_index_append).  Because every
    corpus statistic BM25 uses (N, avgdl, df) is derived at query time
    from the stored rows, the merged index answers bm25_indexed
    IDENTICALLY to a full rebuild — which is why this row shares
    text_bm25_topk's whole-corpus oracle verbatim: a green row proves
    append ≡ rebuild end-to-end, including ranks that shift when the
    appended docs beat standing ones."""
    import os

    from trafficbigdatasearch_spark.operators import search

    path = _TEXT_APPEND_CACHE.get(sf)
    if path is None:
        path = os.path.join(_scratch("text_append", sf), "postings")
        docs = load_table(spark, sf, "documents")
        batch_pred = F.col("doc_id") % 10 == 7
        search.build_text_index(docs.filter(~batch_pred), path)
        search.text_index_append(docs.filter(batch_pred), path)
        _TEXT_APPEND_CACHE[sf] = path
    return search.bm25_indexed(spark, path, ["join", "merge", "query"], k=10)


@register(
    "text_vocab_encode",
    f"""WITH toks AS (SELECT doc_id, {_GUARDED_TOKS} AS t FROM documents),
       cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
               FROM (SELECT unnest(t) AS term FROM toks)
               WHERE term <> '' GROUP BY term HAVING count(*) >= 2),
       vocab AS (SELECT term,
                        CAST(row_number() OVER (ORDER BY freq DESC, term)
                             - 1 AS BIGINT) AS token_id
                 FROM cnt QUALIFY token_id <= 499),
       pos AS (SELECT doc_id, unnest(t) AS term,
                      generate_subscripts(t, 1) - 1 AS pos
               FROM toks WHERE doc_id % 20 = 0)
       SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos,
              COALESCE(v.token_id, -1) AS token_id
       FROM pos p LEFT JOIN vocab v USING (term)
       WHERE p.term <> ''""",
)
def text_vocab_encode_q(spark, sf):
    """Tokenizer-prep VOCABULARY build + corpus ENCODE (operators/
    vocab.py): frequency-ranked top-500 token vocabulary (min_freq=2,
    deterministic (freq DESC, token ASC) ids) over the WHOLE corpus, then
    a 1-in-20 doc slice encoded as a (doc_id, pos, token_id) stream with
    OOV as -1 — the id-ification step between raw text and sequence
    packing (pack_sequences consumes exactly these lengths).  Vocab build
    = one count + distributed TakeOrdered top-V; the dense-id window runs
    over the V surviving rows only; encode broadcasts the vocabulary so
    the corpus stream never shuffles."""
    from trafficbigdatasearch_spark.operators import vocab as VB

    docs = load_table(spark, sf, "documents")
    v = VB.build_vocab(docs, vocab_size=500, min_freq=2)
    sliced = docs.filter(F.col("doc_id") % 20 == 0)
    return VB.encode_docs(sliced, v)


@register(
    "text_vocab_oov",
    f"""WITH toks AS (SELECT doc_id, lang, {_GUARDED_TOKS} AS t FROM documents),
       cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
               FROM (SELECT unnest(t) AS term FROM toks)
               WHERE term <> '' GROUP BY term HAVING count(*) >= 2),
       vocab AS (SELECT term,
                        CAST(row_number() OVER (ORDER BY freq DESC, term)
                             - 1 AS BIGINT) AS token_id
                 FROM cnt QUALIFY token_id <= 499),
       stream AS (SELECT lang, unnest(t) AS term FROM toks),
       j AS (SELECT lang, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
             FROM stream s LEFT JOIN vocab v USING (term)
             WHERE s.term <> '')
       SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(sum(oov) AS BIGINT) AS n_oov,
              CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
       FROM j GROUP BY lang""",
)
def text_vocab_oov_q(spark, sf):
    """Per-language OOV rates against the same top-500/min_freq=2
    vocabulary text_vocab_encode builds (operators/vocab.py::oov_rates,
    r10) — the vocabulary-coverage report behind tokenizer-prep decisions:
    a high-OOV language is under-served by the vocabulary and fragments
    into unk/byte fallbacks downstream.  Two integer counts per language
    plus one closing IEEE division; the V-row vocabulary broadcasts, the
    corpus shuffles only per-language partials."""
    from trafficbigdatasearch_spark.operators import vocab as VB

    docs = load_table(spark, sf, "documents")
    v = VB.build_vocab(docs, vocab_size=500, min_freq=2)
    return VB.oov_rates(docs, v, group_col="lang")


#: Convex CCW districts on the same deterministic (x, y) in [0, 1000)²
#: lattice as the spatial_density points — a triangle, a square, and a
#: pentagon, overlapping so some points land in two zones.


_ZONES = [
    (1, [(0, 0), (500, 0), (250, 450)]),
    (2, [(300, 200), (800, 200), (800, 700), (300, 700)]),
    (3, [(550, 500), (950, 550), (990, 900), (700, 990), (500, 800)]),
]


def _zone_edges_sql() -> str:
    rows = []
    for pid, verts in _ZONES:
        for (ax, ay), (bx, by) in zip(verts, verts[1:] + verts[:1]):
            rows.append(f"({pid}, {ax}, {ay}, {bx}, {by})")
    return ", ".join(rows)


@register(
    "j_point_in_polygon",
    f"""WITH pts AS (SELECT c_custkey AS id,
                            ((c_custkey * 48271) % 99991) % 1000 AS x,
                            ((c_custkey * 16807) % 104729) % 1000 AS y
                     FROM customer),
       edges(pid, ax, ay, bx, by) AS (VALUES {_zone_edges_sql()}),
       tests AS (
         SELECT p.id, e.pid,
                (e.bx - e.ax) * (p.y - e.ay)
                  - (e.by - e.ay) * (p.x - e.ax) >= 0 AS inside_edge
         FROM pts p CROSS JOIN edges e)
       SELECT id, CAST(pid AS BIGINT) AS polygon_id
       FROM tests GROUP BY id, pid HAVING bool_and(inside_edge)""",
)
def j_point_in_polygon_q(spark, sf):
    """Point-in-convex-polygon GEOFENCE join (operators/spatial.py::
    point_in_convex_polygon_join): three literal CCW districts
    (triangle/square/pentagon, deliberately overlapping) against the
    deterministic customer lattice — the zone-assignment join the bbox
    predicate cannot express.  All-integer half-plane tests compiled to
    row-local codegen expressions: ZERO shuffle, the polygon "dim side"
    rides in the instruction stream.  The oracle factors the same edges
    into a VALUES table and bool_and's the half-plane tests."""
    from trafficbigdatasearch_spark.operators import spatial

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 48271) % 99991) % 1000).alias("x"),
        (((F.col("c_custkey") * 16807) % 104729) % 1000).alias("y"),
    )
    return spatial.point_in_convex_polygon_join(pts, _ZONES)


@register(
    "ts_interpolate",
    """WITH closes AS (
         SELECT user_id, date_trunc('hour', ts) AS bucket,
                arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS _close
         FROM events GROUP BY user_id, date_trunc('hour', ts)),
       spine AS (
         SELECT user_id,
                unnest(generate_series(min(bucket), max(bucket),
                                       INTERVAL 1 HOUR)) AS bucket
         FROM closes GROUP BY user_id),
       j AS (SELECT s.user_id, s.bucket, c._close
             FROM spine s LEFT JOIN closes c
               ON c.user_id = s.user_id AND c.bucket = s.bucket),
       w AS (SELECT user_id, bucket, _close,
               last_value(_close IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
               last_value(CASE WHEN _close IS NOT NULL
                               THEN epoch_ms(bucket) END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
               first_value(_close IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
               first_value(CASE WHEN _close IS NOT NULL
                                THEN epoch_ms(bucket) END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
             FROM j)
       SELECT user_id, bucket,
              CASE WHEN _close IS NOT NULL THEN _close
                   WHEN t1 IS NULL THEN v0
                   ELSE v0 + (v1 - v0) *
                        ((epoch_ms(bucket) - t0) / (t1 - t0)) END AS value,
              CAST(CASE WHEN _close IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
                AS is_observed
       FROM w""",
)
def ts_interpolate_q(spark, sf):
    """LINEAR-interpolated gap-fill (operators/timeseries.py::
    gapfill_interpolate) — the continuous-signal completion where ffill's
    step function is wrong.  Bracketing observations come from two window
    passes (last/first ignorenulls) over ONE (key, bucket) sort that
    Catalyst plans with a single exchange; the interpolation itself is a
    fixed IEEE op sequence over epoch-millis bigints, hash-identical
    across engines.  Same two-shuffles-per-key cost as ts_gapfill."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    ev = load_table(spark, sf, "events")
    return TS.gapfill_interpolate(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", bucket="hour",
    )


@register(
    "q19_disjunctive_join",
    """SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS DOUBLE) / 100 AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_lines
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 21)
          OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 30
              AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 45
              AND l_quantity BETWEEN 20 AND 40)""",
)
def q19_disjunctive_join_q(spark, sf):
    """TPC-H Q19's shape — a join whose predicate is an OR of conjunctive
    clauses spanning BOTH sides.  The Catalyst showcase: the optimizer
    factors side-local implications of the disjunction out of the join
    condition (every branch constrains p_brand/p_size and l_quantity), so
    both scans are pre-filtered BEFORE the equi join on partkey and the
    residual OR runs on the survivors — the reference's J3 workaround
    (union of per-branch joins, src/AverageSpeed.scala:139-160) is what
    this replaces with ONE join.  Exact cent arithmetic for the revenue
    sum."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    clause = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 45)
        & F.col("l_quantity").between(20, 40)
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return j.filter(clause).agg(
        (F.sum(rev_cents).cast("double") / 100).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "dedup_keep_best",
    f"""WITH RECURSIVE {_lsh_pairs_cte('documents')},
       eds AS (SELECT id_a AS u, id_b AS v FROM lsh_pairs
               UNION SELECT id_b, id_a FROM lsh_pairs),
       nds AS (SELECT DISTINCT u AS id FROM eds),
       walk(id, lab) AS (
         SELECT id, id FROM nds
         UNION
         SELECT w.id, e.v FROM walk w JOIN eds e ON e.u = w.lab
       ),
       comp AS (SELECT id, min(lab) AS component FROM walk GROUP BY id),
       allc AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
                FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       q AS (SELECT doc_id, CAST({_TOKCOUNT_SQL} AS BIGINT) AS quality
             FROM documents),
       best AS (SELECT component,
                       arg_max(a.doc_id, quality * 2147483648 - a.doc_id)
                         AS keep_id
                FROM allc a JOIN q USING (doc_id) GROUP BY component)
       SELECT a.doc_id, CAST(a.component AS BIGINT) AS component,
              CAST(b.keep_id AS BIGINT) AS keep_id,
              CAST(CASE WHEN a.doc_id = b.keep_id THEN 1 ELSE 0 END AS INTEGER)
                AS is_keeper
       FROM allc a JOIN best b USING (component)""",
)
def dedup_keep_best_q(spark, sf):
    """Quality-aware near-dup survivor selection — the CURATION refinement
    of dedup_clusters: instead of the min-id convention, each cluster keeps
    its highest-QUALITY member (token count here; any scalar score plugs
    in), ties to the smaller id via one composite max_by ordering key —
    still a total function of the corpus, no scan-order dependence.
    Isolated docs form singleton clusters and keep themselves.  Cost over
    dedup_clusters: one broadcast-size quality join + one map-side-combined
    arg-max per component — the keep-the-best policy every production
    dedup actually wants (drop the boilerplate copy, keep the full
    article)."""
    docs = load_table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, k=_MINHASH_K, bands=4, n=3)
    cc = graph.connected_components(pairs)
    quality = docs.select(
        "doc_id", T.token_count(F.col("text")).alias("quality")
    )
    allc = (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    best = (
        allc.join(quality, "doc_id")
        .groupBy("component")
        .agg(
            # bounds (quality < 2^32, doc_id < 2^31) enforced via the
            # amortized group-level guard — see graph._ARGMAX_PACK
            F.max_by(
                "doc_id",
                graph.quality_argmax_key(F.col("quality"), F.col("doc_id")),
            ).alias("_keep0"),
            graph.quality_argmax_bounds_ok(
                F.col("quality"), F.col("doc_id")
            ).alias("_ok"),
        )
        .select(
            "component",
            graph.quality_argmax_guard(F.col("_ok"), F.col("_keep0")).alias(
                "keep_id"
            ),
        )
    )
    return allc.join(best, "component").select(
        "doc_id",
        "component",
        "keep_id",
        (F.col("doc_id") == F.col("keep_id")).cast("int").alias("is_keeper"),
    )


@register(
    "stream_ohlc",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
              user_id,
              arg_min(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS open,
              max(value) AS high,
              min(value) AS low,
              arg_max(value, epoch_ms(ts)::HUGEINT * 10000000000 + event_id) AS close,
              CAST(count(*) AS BIGINT) AS volume
       FROM events GROUP BY 1, 2""",
)
def stream_ohlc_q(spark, sf):
    """STREAMING OHLC — ts_resample_ohlc's continuous twin: the same
    min_by/max_by-over-composite-key aggregate as a watermarkable windowed
    STREAMING aggregation (micro-batch planner + state store + sink
    commit), drained from a bounded file stream in complete mode so the
    batch SQL oracle applies hash-exactly (the stream_events_hourly
    verification shape).  This pins that ordered-argmin/argmax state —
    the continuous-rollup core of a live tick/sensor hypertable — survives
    the streaming aggregate path, not just the batch one.  At scale the
    identical plan runs unbounded with a watermark + append sink.
    Ordering key = the native struct (unix_millis, id) — timeseries.
    _ord_key's r11 contract, exact for every bigint id with no arithmetic;
    the oracle keeps the HUGEINT pack, order-isomorphic for id < 1e10
    (every testdata SF)."""
    src = _stream_events_source(spark, sf)
    ord_key = F.struct(
        F.unix_millis(F.col("ts")).alias("t"),
        F.col("event_id").cast("bigint").alias("i"),
    )
    agg = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.min_by(F.col("value"), ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("value"), ord_key).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("bucket"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )
    return _drain_to_memory(agg, "stream_ohlc")


@register(
    "a_anomaly_mad",
    """WITH c AS (SELECT event_type,
                         CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
       med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
               FROM c GROUP BY event_type),
       dev AS (SELECT c.event_type, c.cents, med.med,
                      abs(c.cents - med.med) AS d
               FROM c JOIN med USING (event_type)),
       mad AS (SELECT event_type, quantile_cont(d, 0.5) AS mad
               FROM dev GROUP BY event_type)
       SELECT dev.event_type,
              CAST(max(dev.med) AS DOUBLE) AS med_cents,
              CAST(max(mad.mad) AS DOUBLE) AS mad_cents,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM dev JOIN mad ON mad.event_type = dev.event_type
       GROUP BY dev.event_type""",
)
def a_anomaly_mad_q(spark, sf):
    """ROBUST anomaly detection via median absolute deviation — the
    outlier-resistant twin of a_anomaly_zscore (one extreme value drags a
    mean/stddev gate; it cannot drag the median).  Composition of the
    exact-percentile machinery: per-group median (one grouped sort-agg),
    BROADCAST the K group medians back (no row explosion — the fact
    stream is touched twice, shuffled on the same group key both times),
    per-group MAD (second percentile pass), then a 3-MAD outlier count.
    All arithmetic over integer cents with the same lo+(hi-lo)*frac
    interpolation both engines apply — bit-identical doubles.  At 100 TB
    this is the audit baseline for the KLL-sketch quantile gate (same
    argument as a_exact_percentiles)."""
    ev = load_table(spark, sf, "events")
    c = ev.select("event_type", _cents(F.col("value")).alias("cents"))
    med = c.groupBy("event_type").agg(
        F.percentile(F.col("cents"), F.lit(0.5)).alias("med")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("d"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med_cents"),
            F.max("mad").alias("mad_cents"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "quality_profile",
    """WITH a AS (SELECT COUNT(*) AS n,
                         COUNT(o_custkey) AS nn1,
                         COUNT(DISTINCT o_custkey) AS nd1,
                         COUNT(o_orderstatus) AS nn2,
                         COUNT(DISTINCT o_orderstatus) AS nd2,
                         COUNT(o_orderpriority) AS nn3,
                         COUNT(DISTINCT o_orderpriority) AS nd3
                  FROM orders)
       SELECT 'o_custkey' AS column_name, CAST(n AS BIGINT) AS n_rows,
              CAST(n - nn1 AS BIGINT) AS n_nulls,
              CAST(nd1 AS BIGINT) AS n_distinct FROM a
       UNION ALL
       SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(n - nn2 AS BIGINT),
              CAST(nd2 AS BIGINT) FROM a
       UNION ALL
       SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(n - nn3 AS BIGINT),
              CAST(nd3 AS BIGINT) FROM a""",
)
def quality_profile_q(spark, sf):
    """Data profiling (operators/validate.py profile): per-column
    null/distinct counts for an ingest, computed in ONE aggregate over one
    scan and unpivoted with stack() into the per-column report.  Exact
    count_distinct for the oracle hash; the 100 TB variant swaps in
    approx_count_distinct (mergeable HLL partials, one Expand-free pass) —
    documented in the operator."""
    from trafficbigdatasearch_spark.operators import validate as V

    orders = load_table(spark, sf, "orders")
    return V.profile(orders, ["o_custkey", "o_orderstatus", "o_orderpriority"])
