"""Round-8+ era: graph eval metrics, PQ distortion, hopping windows,
key-skew / drift / syndication quality audits, time-series screens,
streaming gates, cross-corpus dedup.

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
    multimodal,
    sampling,
    similarity,
)
from ._shared import _REGISTRY, _cents, register
from .std_textsim import (
    _GUARDED_TOKS,
    _MINHASH_K,
    _MINHASH_VALUES,
    _QVEC,
    _TOKCOUNT_SQL,
    _TOKS,
    _band_cte,
    _drain_to_memory,
    _lsh_pairs_cte,
    _stream_events_source,
)
from .std_tpch_sampling import _BUCKET_SQL, _PQ_M, _pq_d
from .std_retrieval import _stream_documents_source

_LCC_GRAPH_SQL = """n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
       raw AS (
         SELECT c_custkey AS u, (c_custkey % n.n) + 1 AS v FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey + 1) % n.n) + 1 FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey * c_custkey) % n.n) + 1
         FROM customer, n),
       e AS (
         SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
         FROM raw WHERE u <> v)"""


@register(
    "graph_clustering_coeff",
    f"""WITH {_LCC_GRAPH_SQL},
       adj AS (SELECT a AS nd, b AS m FROM e UNION ALL SELECT b, a FROM e),
       deg AS (SELECT nd AS id, CAST(count(*) AS BIGINT) AS d
               FROM adj GROUP BY 1),
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
       SELECT c.c_custkey AS id,
              COALESCE(d.d, 0) AS degree,
              COALESCE(cnt.n_triangles, 0) AS n_triangles,
              CAST(2 * COALESCE(cnt.n_triangles, 0) AS BIGINT) AS lcc_num,
              CAST(COALESCE(d.d, 0) * (COALESCE(d.d, 0) - 1) AS BIGINT)
                AS lcc_den,
              CASE WHEN COALESCE(d.d, 0) >= 2
                   THEN CAST(2 * COALESCE(cnt.n_triangles, 0) AS DOUBLE) /
                        CAST(COALESCE(d.d, 0) * (COALESCE(d.d, 0) - 1)
                             AS DOUBLE)
              END AS lcc
       FROM customer c
       LEFT JOIN deg d ON d.id = c.c_custkey
       LEFT JOIN cnt ON cnt.id = c.c_custkey""",
)
def graph_clustering_coeff_q(spark, sf):
    """Per-node LOCAL CLUSTERING COEFFICIENT (operators/graph.py::
    local_clustering) — the triangle engine's ratio form, lcc = 2*tri /
    (d*(d-1)), over an IRREGULAR test graph (the C_N{1,2} ring for
    guaranteed triangles plus a quadratic chord u -> u² mod N whose
    in-degree varies 0..4+, so degrees — and the coefficient — actually
    spread, unlike the vertex-transitive circulant where every node ties).
    Numerator and denominator ship as exact BIGINTs beside ONE closing
    IEEE division (NULL below degree 2), the degree-ordered wedge join
    bounds per-node out-degree by O(sqrt(|E|)) against hub skew, and the
    degree aggregate the orientation already computes is reused for the
    denominator — one extra node-partitioned join over triangle_counts,
    nothing collected."""
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
        cust.select(F.col("id"), ((F.col("id") * F.col("id")) % n) + 1)
    )
    return G.local_clustering(edges, nodes=cust)


@register(
    "graph_modularity",
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
       asg AS (SELECT c_custkey AS id,
                      CAST(((c_custkey - 1) * 8) // n.n AS BIGINT)
                        AS community
               FROM customer, n),
       lab AS (SELECT ea.community AS cu, eb.community AS cv
               FROM e
               JOIN asg ea ON ea.id = e.a
               JOIN asg eb ON eb.id = e.b),
       ein AS (SELECT cu AS community, CAST(count(*) AS BIGINT) AS e_in
               FROM lab WHERE cu = cv GROUP BY 1),
       ends AS (SELECT a AS id FROM e UNION ALL SELECT b FROM e),
       degc AS (SELECT community, CAST(count(*) AS BIGINT) AS deg_c
                FROM ends JOIN asg USING (id) GROUP BY 1),
       nn AS (SELECT community, CAST(count(*) AS BIGINT) AS n_nodes
              FROM asg GROUP BY 1),
       mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e)
       SELECT nn.community, nn.n_nodes,
              COALESCE(degc.deg_c, 0) AS deg_c,
              COALESCE(ein.e_in, 0) AS e_in,
              mm.m,
              CAST(4::HUGEINT * mm.m * COALESCE(ein.e_in, 0)
                   - COALESCE(degc.deg_c, 0)::HUGEINT
                     * COALESCE(degc.deg_c, 0) AS BIGINT) AS q_num,
              CAST(4::HUGEINT * mm.m * mm.m AS BIGINT) AS q_den,
              CAST(4::HUGEINT * mm.m * COALESCE(ein.e_in, 0)
                   - COALESCE(degc.deg_c, 0)::HUGEINT
                     * COALESCE(degc.deg_c, 0) AS DOUBLE) /
                CAST(4::HUGEINT * mm.m * mm.m AS DOUBLE) AS q_term
       FROM nn
       LEFT JOIN degc USING (community)
       LEFT JOIN ein USING (community)
       CROSS JOIN mm""",
)
def graph_modularity_q(spark, sf):
    """Newman MODULARITY of a community assignment (operators/graph.py::
    modularity_by_community) — the graph family's missing EVAL member
    (the measurement you run after every community-detection round, the
    way eval_cluster_purity scores the IVF cells): per community,
    Q_c = e_in/m − (deg_c/2m)², shipped as exact integer pieces (n_nodes,
    e_in, deg_c, m, the cross-multiplied q_num = 4·m·e_in − deg_c²
    against q_den = 4·m²) plus ONE closing IEEE division per row; the
    corpus-level Q = Σ q_term fold is left to the consumer per the
    no-float-SUM rule.  Exercised on the circulant C_N{1,2,3} under 8
    contiguous blocks — a deliberately GOOD partition (blocks cut only
    boundary edges), so the terms are non-degenerate at every SF.
    Internal products run on DECIMAL(38,0) (a 10⁹-edge graph cannot
    overflow the 4·m·e_in cross term); edges dedup once, two
    node-partitioned label joins, the global m broadcast from a
    single-row aggregate — one pass, nothing iterates, nothing
    collects."""
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
    assign = cust.select(
        "id", F.expr(f"((id - 1) * 8) div {n}").cast("bigint").alias("community")
    )
    return G.modularity_by_community(edges, assign)


def _pq_distortion_oracle() -> str:
    ds = ",\n              ".join(f"{_pq_d(j)} AS d{j}" for j in range(_PQ_M))
    ms = ", ".join(f"min(d{j}) AS m{j}" for j in range(_PQ_M))
    unp = "\n         UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS subspace, m{j} AS md FROM mins"
        for j in range(_PQ_M)
    )
    return f"""WITH c AS (SELECT vec_id, {_QVEC} AS v FROM embeddings),
       cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                       AS cell_id, v AS cv
                FROM c WHERE vec_id % 97 = 0),
       p AS (SELECT c.vec_id,
              {ds}
             FROM c CROSS JOIN cent),
       mins AS (SELECT vec_id, {ms} FROM p GROUP BY vec_id),
       l AS ({unp})
       SELECT subspace, CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(SUM(md) AS BIGINT) AS sse,
              CAST(CAST(SUM(md) AS BIGINT) AS DOUBLE) / count(*) AS mse
       FROM l GROUP BY subspace"""


@register("eval_pq_distortion", _pq_distortion_oracle())
def eval_pq_distortion_q(spark, sf):
    """PQ quantization DISTORTION per subspace (operators/similarity.py::
    pq_distortion) — the codebook's own quality metric beside the stack's
    recall rows (eval_ivf_recall / eval_lsh_recall measure WHERE the ANN
    fabric loses neighbors; this measures how much GEOMETRY the
    compression threw away and which subspace is responsible — the number
    you watch when choosing m or deciding to re-train).  Per vector, each
    of the 8 subvectors scores against its nearest codebook entry — the
    SAME per-subspace integer-lattice argmin pq_codes encodes, so this is
    the encode job's distances re-folded, not a new pass — and the
    squared residuals aggregate to (subspace, n_vecs, sse BIGINT, mse =
    one closing IEEE division).  One broadcast codebook, one corpus scan,
    m output rows: at 100 TB the distortion report piggybacks on encoding
    for free."""
    emb = load_table(spark, sf, "embeddings")
    return similarity.pq_distortion(emb, m=_PQ_M, centroid_stride=97)


@register(
    "a_hopping_window",
    """WITH e AS (SELECT event_type, ts,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL),
       x AS (SELECT event_type,
                    make_timestamp(((epoch_us(ts) // 900000000) - r.j)
                                   * 900000000) AS win_start,
                    c
             FROM e CROSS JOIN range(4) r(j))
       SELECT event_type AS key, win_start,
              win_start + INTERVAL 1 HOUR AS win_end,
              CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(c) AS BIGINT) AS sum_cents
       FROM x GROUP BY 1, 2""",
)
def a_hopping_window_q(spark, sf):
    """HOPPING (sliding) windows (operators/timeseries.py::
    hopping_window_agg): every event lands in the four overlapping
    1-hour/15-minute windows via Spark's NATIVE ``F.window(ts, '1 hour',
    '15 minutes')`` — the same construct Structured Streaming executes, so
    this batch row pins the exact window assignment a streaming deployment
    of the tumbling rows (stream_events_hourly) would use with a slide.
    Counts are BIGINTs, values fold on the exact cents lattice (no float
    SUM), windows are epoch-aligned start-inclusive/end-exclusive; the
    oracle reproduces the assignment with integer epoch-microsecond
    arithmetic.  Scale: the fan-out is row-local BEFORE the exchange and
    the aggregate map-side combines, so shuffle bytes are |keys| x
    |windows|, not 4x the input — with the overlap factor (window/slide)
    as the documented knob to keep coarse at 100 TB."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    return TS.hopping_window_agg(
        load_table(spark, sf, "events"),
        key_col="event_type", ts_col="ts", value_col="value",
        window="1 hour", slide="15 minutes",
    )


@register(
    "quality_key_skew",
    """WITH sizes AS (SELECT user_id, CAST(count(*) AS BIGINT) AS sz
                    FROM events GROUP BY 1),
       hist AS (SELECT sz, CAST(count(*) AS BIGINT) AS n
                FROM sizes GROUP BY 1),
       cum AS (SELECT sz, CAST(SUM(n) OVER (ORDER BY sz
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM hist),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(SUM(sz) AS BIGINT) AS n_rows,
                      CAST(max(sz) AS BIGINT) AS max_size
               FROM sizes)
       SELECT t.n_keys, t.n_rows, t.max_size,
              CAST(min(CASE WHEN c.cum * 100 >=
                     (50 * t.n_keys + 99) - ((50 * t.n_keys + 99) % 100)
                   THEN c.sz END) AS BIGINT) AS p50_size,
              CAST(min(CASE WHEN c.cum * 100 >=
                     (90 * t.n_keys + 99) - ((90 * t.n_keys + 99) % 100)
                   THEN c.sz END) AS BIGINT) AS p90_size,
              CAST(min(CASE WHEN c.cum * 100 >=
                     (99 * t.n_keys + 99) - ((99 * t.n_keys + 99) % 100)
                   THEN c.sz END) AS BIGINT) AS p99_size,
              CAST(1000000 * t.max_size // t.n_rows AS BIGINT)
                AS max_share_ppm
       FROM cum c CROSS JOIN tot t
       GROUP BY t.n_keys, t.n_rows, t.max_size""",
)
def quality_key_skew_q(spark, sf):
    """Partition-key SKEW profile (operators/validate.py::
    key_skew_profile) — the one-row diagnostic behind this repo's own
    salting / AQE-skew decisions, promoted to an operator: before
    committing a 100 TB join or aggregate to a key, measure it.  Emits
    n_keys, n_rows, max group size, EXACT p50/p90/p99 group-size
    percentiles (smallest size whose cumulative key count reaches
    ceil(pct·n_keys/100) — pure integer threshold arithmetic, no
    interpolation, no float rank) and the heaviest key's row share in
    parts-per-million (integer div).  ONE map-side-combined shuffle (the
    per-key count); the size HISTOGRAM that follows is |distinct sizes|
    rows — thousands even at a billion keys — folding through one tiny
    window and a one-row reduce.  Never sorts rows, never collects keys:
    O(|keys|) shuffle bytes, safe to run on every candidate key."""
    from trafficbigdatasearch_spark.operators import validate as V

    return V.key_skew_profile(load_table(spark, sf, "events"), "user_id")


@register("stream_gopher_gate", _REGISTRY["quality_gopher"][1])
def stream_gopher_gate_q(spark, sf):
    """The Gopher quality battery ON A STREAM — the production arrangement
    of quality_gopher (the stream_semantic_gate pattern applied to the
    text-quality member): the battery is row-local codegen'd expressions
    end to end (token split, replace-occurrence counts, higher-order
    filter lambdas — zero shuffles, zero state, zero watermark), so the
    batch operator runs UNCHANGED on the document stream in append mode
    and every arriving document emits its per-rule flags immediately.
    One oracle pins the batch row and this streaming twin to the same
    bits: gate at ingest forever, rescore never — the shape that matters
    when the corpus is a firehose and quality filtering must not add a
    shuffle."""
    from trafficbigdatasearch_spark.operators import validate as V

    flags = V.gopher_quality_flags(
        _stream_documents_source(spark, sf), min_words=30
    )
    return _drain_to_memory(flags, "stream_gopher_gate", "append")


@register(
    "ts_seasonality",
    """WITH e AS (SELECT event_type AS key, CAST(hour(ts) AS INTEGER) AS hod,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL),
       hodt AS (SELECT key, hod, CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(c) AS BIGINT) AS sum_cents
                FROM e GROUP BY 1, 2),
       tot AS (SELECT key, CAST(SUM(n) AS BIGINT) AS n_key,
                      CAST(SUM(sum_cents) AS BIGINT) AS sum_key
               FROM hodt GROUP BY 1)
       SELECT h.key, h.hod, h.n, h.sum_cents,
              CAST(h.sum_cents AS DOUBLE) / h.n AS mean_cents,
              CAST(h.sum_cents::HUGEINT * t.n_key AS BIGINT) AS ratio_num,
              CAST(h.n::HUGEINT * t.sum_key AS BIGINT) AS ratio_den,
              CASE WHEN t.sum_key <> 0
                   THEN CAST(h.sum_cents::HUGEINT * t.n_key AS DOUBLE) /
                        CAST(h.n::HUGEINT * t.sum_key AS DOUBLE)
              END AS seasonal_ratio
       FROM hodt h JOIN tot t USING (key)""",
)
def ts_seasonality_q(spark, sf):
    """HOUR-OF-DAY seasonal profile per key (operators/timeseries.py::
    seasonal_profile) — the diurnal-shape report behind capacity planning
    and seasonal-naive forecasting, and the generalization of the
    reference's avg-speed-by-time_period query
    (src/AvgSpeedCal.scala's hourly buckets) to a first-class operator:
    per (event_type, hour), n / cents-lattice sum / mean, plus
    seasonal_ratio = hour mean over the key's all-day mean as
    cross-multiplied exact integers (ratio_num = sum_hod·n_key, ratio_den
    = n_hod·sum_key on DECIMAL(38,0)) with ONE closing IEEE division
    (NULL-guarded on a zero key total in both engines).  ONE
    map-side-combined aggregate to 24 rows per key; the per-key totals
    REAGGREGATE those partials — the corpus is scanned once, and shuffle
    bytes are 24x|keys| at any SF."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    return TS.seasonal_profile(load_table(spark, sf, "events"))


@register("stream_hopping", _REGISTRY["a_hopping_window"][1])
def stream_hopping_q(spark, sf):
    """Hopping windows ON A STREAM — the sliding-window twin of
    stream_events_hourly's tumbling grid, and the streaming arrangement of
    a_hopping_window: the SAME batch operator (native ``F.window(ts, '1
    hour', '15 minutes')`` + cents-lattice sums) runs unchanged on the
    bounded event stream in complete mode, because a complete-mode
    windowed aggregate over a fully-drained bounded stream is exactly the
    batch groupBy.  One oracle pins the batch row and this twin to the
    same bits, certifying the micro-batch planner/state-store/sink path
    for OVERLAPPING window assignment — at scale the identical plan runs
    unbounded with a watermark + append sink, where each event still
    fans out row-locally to its 4 windows before the exchange."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    agg = TS.hopping_window_agg(
        _stream_events_source(spark, sf),
        key_col="event_type", ts_col="ts", value_col="value",
        window="1 hour", slide="15 minutes",
    )
    return _drain_to_memory(agg, "stream_hopping")


@register(
    "graph_assortativity",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
       raw AS (
         SELECT c_custkey AS u, (c_custkey % n.n) + 1 AS v FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey + 1) % n.n) + 1 FROM customer, n
         UNION ALL
         SELECT c_custkey, ((c_custkey * c_custkey) % n.n) + 1
         FROM customer, n),
       e AS (
         SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
         FROM raw WHERE u <> v),
       adj AS (SELECT a AS nd, b AS m FROM e UNION ALL SELECT b, a FROM e),
       deg AS (SELECT nd AS id, CAST(count(*) AS BIGINT) AS d
               FROM adj GROUP BY 1),
       p AS (SELECT da.d AS du, db.d AS dv
             FROM e
             JOIN deg da ON da.id = e.a
             JOIN deg db ON db.id = e.b),
       s AS (SELECT CAST(2 * count(*) AS BIGINT) AS n,
                    CAST(SUM(du + dv) AS BIGINT) AS sum_x,
                    CAST(SUM(du * du + dv * dv) AS BIGINT) AS sum_xx,
                    CAST(SUM(2 * du * dv) AS BIGINT) AS sum_xy
             FROM p)
       SELECT n, sum_x, sum_xx, sum_xy,
              CASE WHEN n::HUGEINT * sum_xx - sum_x::HUGEINT * sum_x <> 0
                   THEN CAST(n::HUGEINT * sum_xy - sum_x::HUGEINT * sum_x
                             AS DOUBLE) /
                        CAST(n::HUGEINT * sum_xx - sum_x::HUGEINT * sum_x
                             AS DOUBLE)
              END AS assortativity
       FROM s""",
)
def graph_assortativity_q(spark, sf):
    """DEGREE ASSORTATIVITY (operators/graph.py::degree_assortativity) —
    Newman's r over the irregular quadratic-chord graph (the
    clustering-coefficient row's graph: a degree-regular circulant would
    hit the 0/0 zero-variance case this operator NULL-guards): the Pearson
    correlation of endpoint degrees across both edge orientations, shipped
    as exact integer sufficient statistics (n = 2m, Σx, Σx², Σxy — the
    a_corr_stats mergeable shape specialized to symmetry, folded per canon
    edge WITHOUT materializing the 2m-row union) and ONE closing IEEE
    division from DECIMAL(38,0) cross-multiplies.  The third graph-eval
    member beside lcc (local cohesion) and modularity (partition quality):
    a one-number structural fingerprint, one pass, one row out."""
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
        cust.select(F.col("id"), ((F.col("id") * F.col("id")) % n) + 1)
    )
    return G.degree_assortativity(edges)


@register(
    "eval_rec_coverage",
    f"""WITH recs AS ({_REGISTRY["rec_user_topn"][1]}),
       cat AS (SELECT CAST(count(DISTINCT TRY_CAST(
                      json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS n_catalog
               FROM events
               WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                     IS NOT NULL),
       per AS (SELECT item_id, CAST(count(*) AS BIGINT) AS ns
               FROM recs GROUP BY 1),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n_rec_items,
                     CAST(SUM(ns) AS BIGINT) AS n_slots,
                     CAST(max(ns) AS BIGINT) AS mx
              FROM per),
       us AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM recs)
       SELECT n_users, n_slots, n_rec_items, n_catalog,
              CAST(n_rec_items AS DOUBLE) / n_catalog AS coverage,
              CAST(1000000 * mx // n_slots AS BIGINT) AS max_item_share_ppm
       FROM us CROSS JOIN st CROSS JOIN cat""",
)
def eval_rec_coverage_q(spark, sf):
    """Recommendation CATALOG COVERAGE + exposure concentration
    (operators/evalrank.py::recommendation_coverage) — the recsys family's
    aggregate eval beside the per-user quality rows (eval_rec_hdcg scores
    each list; this says whether the recommender serves the catalog or
    just its popular head): one row of n_users / n_slots / distinct
    recommended items / catalog size, coverage as ONE closing IEEE
    division, and the most-exposed item's slot share in ppm (exact integer
    div).  Runs over the registered rec_user_topn configuration (its
    oracle embeds verbatim as the recs CTE, so this row also re-certifies
    that chain end-to-end).  One map-side-combined per-item count folded
    to a one-row reduce — no user join, no sort, no collect: the
    popularity-bias smell test you run after every recommendation batch
    at any scale."""
    from trafficbigdatasearch_spark.operators import evalrank as EV
    from trafficbigdatasearch_spark.operators import recsys

    ui = recsys.user_item(load_table(spark, sf, "events"))
    recs = recsys.recommend_topn(ui, n=5, min_co=2)
    return EV.recommendation_coverage(recs, ui)


@register(
    "eval_minhash_error",
    f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
       idx AS (SELECT doc_id, t,
                      unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS i
               FROM toks),
       sh AS (SELECT DISTINCT doc_id,
                     array_to_string(t[i + 1 : i + 3], ' ') AS s
              FROM idx),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b
         FROM shared
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.2),
       h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS hv
             FROM sh),
       params(h_idx, a, b) AS (VALUES {_MINHASH_VALUES}),
       sig AS (SELECT doc_id AS id, h_idx,
                      min((a * hv + b) % 2147483647) AS minhash
               FROM h CROSS JOIN params GROUP BY doc_id, h_idx),
       m AS (SELECT p.id_a, p.id_b, p.shared, p.size_a, p.size_b,
                    CAST(count_if(sa.minhash = sb.minhash) AS BIGINT)
                      AS n_match
             FROM pairs p
             JOIN sig sa ON sa.id = p.id_a
             JOIN sig sb ON sb.id = p.id_b AND sb.h_idx = sa.h_idx
             GROUP BY 1, 2, 3, 4, 5)
       SELECT id_a, id_b, CAST({_MINHASH_K} AS BIGINT) AS k, n_match,
              CAST(shared AS BIGINT) AS shared,
              CAST(size_a + size_b - shared AS BIGINT) AS union_size,
              CAST(n_match AS DOUBLE) / {_MINHASH_K} AS est_jaccard,
              CAST(shared AS DOUBLE) / (size_a + size_b - shared)
                AS exact_jaccard,
              abs(CAST(n_match AS DOUBLE) / {_MINHASH_K} -
                  CAST(shared AS DOUBLE) / (size_a + size_b - shared))
                AS abs_err
       FROM m""",
)
def eval_minhash_error_q(spark, sf):
    """MinHash ESTIMATION ERROR per near-dup pair (operators/evalrank.py::
    minhash_estimate_error) — the accuracy half of the MinHash eval story,
    completing the fabric's measurement loop: eval_lsh_recall scores the
    BAND fabric's candidate generation, this scores the SIGNATURES as a
    Jaccard estimator (E[est] = J, Var = J(1-J)/k — the k-sizing law made
    measurable).  For every exact-Jaccard >= 0.2 pair: n_match of the k=8
    registered signature components, the exact shingle-set legs
    (shared/union), both closing IEEE divisions and their fixed-order
    |difference| — integers beside them, hash-exact.  The pair set is the
    registered inverted-index join (never all-pairs), signatures are the
    registered k-row-per-doc layout, and the match count is a
    pair-restricted join folded map-side — the audit runs beside the
    dedup job at any corpus size."""
    from trafficbigdatasearch_spark.operators import evalrank as EV

    return EV.minhash_estimate_error(
        load_table(spark, sf, "documents"),
        k=_MINHASH_K, n=3, threshold=0.2, max_shingle_freq=None,
    )


@register(
    "ts_acf",
    """WITH e AS (SELECT event_type AS key, ts, event_id,
                         CAST(round(value * 100) AS BIGINT) AS x
                  FROM events WHERE value IS NOT NULL),
       p AS (SELECT key, x,
                    lead(x, 1) OVER (PARTITION BY key
                                     ORDER BY ts, event_id) AS y
             FROM e),
       s AS (SELECT key,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(SUM(x) AS BIGINT) AS sum_x,
                    CAST(SUM(y) AS BIGINT) AS sum_y,
                    CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                    CAST(SUM(y * y) AS BIGINT) AS sum_yy,
                    CAST(SUM(x * y) AS BIGINT) AS sum_xy
             FROM p WHERE y IS NOT NULL GROUP BY key)
       SELECT key, CAST(1 AS INTEGER) AS lag, n_pairs,
              sum_x, sum_y, sum_xx, sum_yy, sum_xy,
              CASE WHEN n_pairs::HUGEINT * sum_xx - sum_x::HUGEINT * sum_x
                        <> 0
                    AND n_pairs::HUGEINT * sum_yy - sum_y::HUGEINT * sum_y
                        <> 0
                   THEN CAST(n_pairs::HUGEINT * sum_xy
                             - sum_x::HUGEINT * sum_y AS DOUBLE) /
                        sqrt(CAST(n_pairs::HUGEINT * sum_xx
                                  - sum_x::HUGEINT * sum_x AS DOUBLE) *
                             CAST(n_pairs::HUGEINT * sum_yy
                                  - sum_y::HUGEINT * sum_y AS DOUBLE))
              END AS acf
       FROM s""",
)
def ts_acf_q(spark, sf):
    """Lag-1 AUTOCORRELATION per key (operators/timeseries.py::
    acf_per_key) — the persistence detector completing the time-series
    monitoring trio: a_drift_chi2 says the distribution changed, ts_cusum
    says WHEN the level shifted, the ACF says whether the series is
    self-correlated at all (the pre-check for forecasting and for
    ts_interpolate's gap-fill choice).  Each key's series pairs with
    itself one step ahead via ONE lead window over the deterministic
    (ts, event_id) order; Pearson r over the pairs ships as exact integer
    sufficient statistics on the cents lattice with ONE closing IEEE
    chain from DECIMAL(38,0) cross-multiplies, NULL-guarded on constant
    series.  Single exchange on the key (the window), map-side-combined
    aggregate after — cusum_per_key's posture."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    return TS.acf_per_key(load_table(spark, sf, "events"), lag=1)


@register(
    "pipeline_curriculum",
    """WITH s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
                  FROM documents),
       n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM s),
       h AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM s
             GROUP BY n_chars),
       b AS (SELECT n_chars,
                    CAST(SUM(c) OVER (ORDER BY n_chars) AS BIGINT) AS cum
             FROM h),
       ph AS (SELECT doc_id, s.n_chars,
                     CAST((10 * cum + nn - 1) // nn AS BIGINT) AS phase,
                     md5(CAST(doc_id AS VARCHAR)) AS mh
              FROM s JOIN b USING (n_chars) CROSS JOIN n)
       SELECT doc_id, n_chars, phase,
              CAST(row_number() OVER (ORDER BY phase, mh, doc_id) - 1
                   AS BIGINT) AS position
       FROM ph""",
)
def pipeline_curriculum_q(spark, sf):
    """CURRICULUM ordering export (operators/sampling.py::
    curriculum_order) — the data-ORDERING member of the training-data
    pipeline family (training_mix decides WHAT goes in, pack_sequences
    how it is laid out in packs; this decides WHEN each document is seen):
    corpus-wide length deciles as phases, short/easy first, md5-shuffled
    within each phase, and a deterministic 0-based global ``position``
    over (phase, md5, id).  The oracle is the naive global row_number; the
    Spark plan NEVER sorts the corpus into one task — phases ride the
    exact histogram-CDF broadcast (w_quality_deciles_global's machinery),
    positions ride pack_sequences' two-level prefix construction keyed on
    256 md5-prefix buckets per phase (cross-bucket prefix order agrees
    with the full md5 order by construction; the only single-partition
    window is the n_phases x 256-row summary).  Every corpus-sized stage
    is partition-parallel — the export a sequential trainer consumes at
    100 TB."""
    from trafficbigdatasearch_spark.operators import sampling

    return sampling.curriculum_order(load_table(spark, sf, "documents"))


@register(
    "j_spatial_knn",
    """WITH pts AS (SELECT c_custkey AS id,
                           ((c_custkey * 48271) % 99991) % 1000 AS x,
                           ((c_custkey * 16807) % 104729) % 1000 AS y
                    FROM customer),
       pairs AS (
         SELECT a.id AS ia, b.id AS ib,
                (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS d2
         FROM pts a JOIN pts b
           ON a.id < b.id
          AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 225),
       sym AS (SELECT ia AS id, ib AS neighbor_id, d2 FROM pairs
               UNION ALL
               SELECT ib, ia, d2 FROM pairs)
       SELECT id, neighbor_id, CAST(d2 AS BIGINT) AS dist2,
              CAST(row_number() OVER (PARTITION BY id
                     ORDER BY d2, neighbor_id) AS BIGINT) AS rank
       FROM sym QUALIFY rank <= 3""",
)
def j_spatial_knn_q(spark, sf):
    """Spatial kNN JOIN bounded by a radius (operators/spatial.py::
    knn_within_radius) — "the 3 nearest neighbors within distance 15" over
    the deterministic integer point cloud the spatial family shares: the
    grid-blocked radius join generates candidates (one 9-cell explode +
    one equi-join on the cell key — never all-pairs), the pair set
    symmetrizes row-locally, and ONE window per source point ranks by the
    exact integer squared distance with the (dist2, neighbor_id) tie
    order.  The radius bound is the honest scale formulation (unbounded
    exact kNN needs per-point grid-ring fixpoints; production "k nearest
    stations/accidents" queries carry a relevance horizon anyway —
    documented in the operator with the isolated-point contract)."""
    from trafficbigdatasearch_spark.operators import spatial

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 48271) % 99991) % 1000).alias("x"),
        (((F.col("c_custkey") * 16807) % 104729) % 1000).alias("y"),
    )
    return spatial.knn_within_radius(pts, "id", "x", "y", radius=15, k=3)


@register(
    "quality_profile_drift",
    """WITH o AS (SELECT * FROM events WHERE day(ts) <= 15),
       nw AS (SELECT * FROM events WHERE day(ts) > 15),
       a AS (SELECT COUNT(*) AS n,
                    COUNT(value) AS nn1, COUNT(DISTINCT value) AS nd1,
                    COUNT(props) AS nn2, COUNT(DISTINCT props) AS nd2,
                    COUNT(event_type) AS nn3,
                    COUNT(DISTINCT event_type) AS nd3
             FROM o),
       b AS (SELECT COUNT(*) AS n,
                    COUNT(value) AS nn1, COUNT(DISTINCT value) AS nd1,
                    COUNT(props) AS nn2, COUNT(DISTINCT props) AS nd2,
                    COUNT(event_type) AS nn3,
                    COUNT(DISTINCT event_type) AS nd3
             FROM nw),
       po AS (
         SELECT 'value' AS column_name, CAST(n AS BIGINT) AS n_rows_old,
                CAST(n - nn1 AS BIGINT) AS n_nulls_old,
                CAST(nd1 AS BIGINT) AS n_distinct_old FROM a
         UNION ALL
         SELECT 'props', CAST(n AS BIGINT), CAST(n - nn2 AS BIGINT),
                CAST(nd2 AS BIGINT) FROM a
         UNION ALL
         SELECT 'event_type', CAST(n AS BIGINT), CAST(n - nn3 AS BIGINT),
                CAST(nd3 AS BIGINT) FROM a),
       pn AS (
         SELECT 'value' AS column_name, CAST(n AS BIGINT) AS n_rows_new,
                CAST(n - nn1 AS BIGINT) AS n_nulls_new,
                CAST(nd1 AS BIGINT) AS n_distinct_new FROM b
         UNION ALL
         SELECT 'props', CAST(n AS BIGINT), CAST(n - nn2 AS BIGINT),
                CAST(nd2 AS BIGINT) FROM b
         UNION ALL
         SELECT 'event_type', CAST(n AS BIGINT), CAST(n - nn3 AS BIGINT),
                CAST(nd3 AS BIGINT) FROM b)
       SELECT column_name, n_rows_old, n_nulls_old, n_distinct_old,
              n_rows_new, n_nulls_new, n_distinct_new,
              CAST(n_nulls_new::HUGEINT * n_rows_old
                   - n_nulls_old::HUGEINT * n_rows_new AS BIGINT)
                AS null_delta_num,
              CAST(n_rows_new::HUGEINT * n_rows_old AS BIGINT)
                AS null_delta_den,
              CASE WHEN n_rows_new::HUGEINT * n_rows_old <> 0
                   THEN CAST(n_nulls_new::HUGEINT * n_rows_old
                             - n_nulls_old::HUGEINT * n_rows_new AS DOUBLE) /
                        CAST(n_rows_new::HUGEINT * n_rows_old AS DOUBLE)
              END AS null_rate_delta
       FROM po JOIN pn USING (column_name)""",
)
def quality_profile_drift_q(spark, sf):
    """PROFILE DRIFT between two snapshots (operators/validate.py::
    profile_drift) — the schema-health monitor completing the drift pair:
    a_drift_chi2 compares VALUE distributions, this compares the
    PROFILES (null rates, distinct cardinalities) on the same
    first-half/second-half snapshot split, per column.  The null-rate
    delta ships as cross-multiplied exact integers on DECIMAL(38,0)
    (positive = the feed got nullier, the silently-broken-upstream-join
    smell) with ONE closing IEEE division; distinct drift ships as raw
    integers.  Each snapshot is ONE aggregate over one scan (the
    profile() posture — never a job per column); the join is
    |cols| x |cols| rows."""
    from trafficbigdatasearch_spark.operators import validate as V

    ev = load_table(spark, sf, "events")
    return V.profile_drift(
        ev.filter(F.dayofmonth("ts") <= 15),
        ev.filter(F.dayofmonth("ts") > 15),
        ["value", "props", "event_type"],
    )


@register(
    "graph_component_stats",
    f"""WITH RECURSIVE {_lsh_pairs_cte('documents')},
       eds AS (SELECT id_a AS u, id_b AS v FROM lsh_pairs
               UNION SELECT id_b, id_a FROM lsh_pairs),
       nds AS (SELECT DISTINCT u AS id FROM eds),
       walk(id, lab) AS (
         SELECT id, id FROM nds
         UNION
         SELECT w.id, e.v FROM walk w JOIN eds e ON e.u = w.lab
       ),
       labels AS (SELECT id, CAST(min(lab) AS BIGINT) AS component
                  FROM walk GROUP BY id),
       sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
                 FROM labels GROUP BY 1),
       tot AS (SELECT CAST(SUM(size) AS BIGINT) AS n_clustered FROM sizes)
       SELECT component, size, n_clustered,
              CAST(1000000 * size // n_clustered AS BIGINT) AS share_ppm
       FROM sizes CROSS JOIN tot""",
)
def graph_component_stats_q(spark, sf):
    """Component-SIZE distribution of the dedup graph (operators/graph.py::
    component_size_stats) — the giant-component / percolation alarm you
    check BEFORE trusting any cluster survivor: near-dup fabrics fail by
    one boilerplate band chaining half the corpus into a single cluster,
    and that failure is visible only in the size distribution, never in
    per-pair scores.  Runs over the registered LSH fabric's components
    (dedup_clusters' exact pair set and labeling — the oracle reuses its
    recursive closure verbatim), emitting per-component size and its share
    of clustered docs in exact ppm.  ONE map-side-combined count on the
    label + a broadcast one-row total; the labeling is scanned once."""
    from trafficbigdatasearch_spark.operators import graph as G

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf, "documents"), k=_MINHASH_K, bands=4, n=3
    )
    labels = G.connected_components(pairs, "id_a", "id_b")
    return G.component_size_stats(labels)


@register(
    "sample_triplets",
    f"""WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
       idx AS (SELECT doc_id, t,
                      unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS i
               FROM toks),
       sh AS (SELECT DISTINCT doc_id,
                     array_to_string(t[i + 1 : i + 3], ' ') AS s
              FROM idx),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b
         FROM shared
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.2),
       sym AS (
         SELECT id_a AS anchor_id, id_b AS cand_id, shared,
                size_a + size_b - shared AS pos_union FROM pairs
         UNION ALL
         SELECT id_b, id_a, shared, size_a + size_b - shared FROM pairs),
       best AS (
         SELECT anchor_id, cand_id AS positive_id,
                CAST(shared AS BIGINT) AS pos_shared,
                CAST(pos_union AS BIGINT) AS pos_union
         FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                 ORDER BY CAST(shared AS DOUBLE) / pos_union DESC,
                          cand_id ASC) AS r
               FROM sym) t
         WHERE r = 1),
       nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
              FROM documents),
       trip AS (
         SELECT anchor_id, positive_id, pos_shared, pos_union,
                CASE WHEN c0 <> anchor_id AND c0 <> positive_id THEN c0
                     WHEN c1 <> anchor_id AND c1 <> positive_id THEN c1
                     ELSE c2 END AS negative_id
         FROM (SELECT b.*,
                      (anchor_id * 2654435761) % nn.n AS c0,
                      ((anchor_id * 2654435761) % nn.n + 1) % nn.n AS c1,
                      ((anchor_id * 2654435761) % nn.n + 2) % nn.n AS c2
               FROM best b CROSS JOIN nn) x),
       known AS (SELECT DISTINCT anchor_id, cand_id FROM sym)
       SELECT t.anchor_id, t.positive_id,
              CAST(t.negative_id AS BIGINT) AS negative_id,
              t.pos_shared, t.pos_union,
              (k.cand_id IS NOT NULL) AS neg_is_known_dup
       FROM trip t
       LEFT JOIN known k
         ON k.anchor_id = t.anchor_id AND k.cand_id = t.negative_id""",
)
def sample_triplets_q(spark, sf):
    """CONTRASTIVE TRIPLET mining (operators/sampling.py::
    contrastive_triplets) — (anchor, positive, negative) training examples
    from the corpus's own near-dup structure, the standard self-supervised
    curation step for embedding/retrieval models: positives are each
    anchor's highest-Jaccard partner from the registered exact >= 0.2 pair
    set (deterministic score-desc/id-asc pick), negatives a Knuth-hash
    pseudo-random document stepping past anchor/positive collisions
    through a fixed 3-candidate CASE chain, and ``neg_is_known_dup`` flags
    the classic random-negative false-negative collision via a
    pair-restricted lookup so the trainer can drop or down-weight those
    rows.  Pair generation is the inverted-index join (never all-pairs);
    positive selection is ONE window over the symmetrized pairs; the
    negative is row-local — the export runs beside the dedup job at any
    corpus size."""
    from trafficbigdatasearch_spark.operators import sampling

    return sampling.contrastive_triplets(
        load_table(spark, sf, "documents"),
        n=3, threshold=0.2, max_shingle_freq=None,
    )


@register(
    "mm_phash_incremental",
    """WITH fp AS (SELECT doc_id AS id,
                          CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) AS h
            FROM documents),
       c AS (SELECT * FROM fp WHERE id % 11 <> 5),
       nw AS (SELECT * FROM fp WHERE id % 11 = 5)
       SELECT nw.id AS new_id, c.id AS corpus_id,
              CAST(bit_count(xor(nw.h, c.h)) AS BIGINT) AS hamming
       FROM nw JOIN c ON bit_count(xor(nw.h, c.h)) <= 3""",
)
def mm_phash_incremental_q(spark, sf):
    """INCREMENTAL multimodal near-dup (operators/dedup.py::
    hamming_pairs_incremental): a new asset batch (every 11th document's
    payload) screened against the standing corpus's perceptual hashes —
    the daily-delivery shape for the bit-fingerprint families, completing
    the incremental story across all three representations (shingles:
    dedup_incremental; embeddings: dedup_semantic_incremental; bits:
    this).  Cross pairs only, COMPLETE by the same pigeonhole bound as
    the batch engine; join directions follow the 100 TB asymmetry — the
    corpus band expansion streams (or persists as an index) while the
    increment's banded rows broadcast onto it, so corpus bytes never
    shuffle.  Verify is the row-local bit_count on candidates; the
    oracle is the all-cross-pairs filter the banding provably equals."""
    from trafficbigdatasearch_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    assets = multimodal.assets_from_documents(docs)
    fps = multimodal.phash_stub(assets).select(
        F.col("asset_id").alias("id"), F.col("phash").alias("simhash")
    )
    return dedup.hamming_pairs_incremental(
        fps.filter(F.col("id") % 11 != 5),
        fps.filter(F.col("id") % 11 == 5),
        n_bits=16, band_bits=4, max_hamming=3,
    )


@register(
    "w_streaks",
    """WITH seq AS (
         SELECT user_id, event_type, ts, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn,
                row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rt
         FROM events),
       isl AS (SELECT user_id, event_type, rn - rt AS island,
                      CAST(count(*) AS BIGINT) AS len
               FROM seq GROUP BY 1, 2, 3)
       SELECT user_id, event_type,
              CAST(count(*) AS BIGINT) AS n_streaks,
              CAST(max(len) AS BIGINT) AS max_len
       FROM isl GROUP BY 1, 2""",
)
def w_streaks_q(spark, sf):
    """STREAK LENGTHS (gaps-and-islands): per (user, event_type), how many
    maximal runs of consecutive same-type events and the longest run —
    the classic sessionless behavioral feature (retry storms, binge
    patterns, sensor flatlines).  The Spark side uses the single-exchange
    formulation: ONE window partitioning on user_id carries both the lag
    change detector and the running island id (two specs, same sort),
    then two map-side-combined aggregates — never the two-partitioning
    row_number-difference form, whose second exchange on (user, type) the
    oracle happily pays because DuckDB's sort is free at oracle scale.
    Deterministic (ts, event_id) order end to end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.coalesce(
        F.col("event_type") != F.lag("event_type").over(w), F.lit(True)
    ).cast("int")
    seq = ev.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("_chg")
    ).select(
        "user_id",
        "event_type",
        F.sum("_chg")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("_island"),
    )
    isl = seq.groupBy("user_id", "event_type", "_island").agg(
        F.count(F.lit(1)).cast("bigint").alias("_len")
    )
    return isl.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("_len").cast("bigint").alias("max_len"),
    )


@register(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                AS revenue_e4,
              CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                / 10000 AS revenue
       FROM lineitem
       WHERE l_shipdate >= DATE '1996-01-01'
         AND l_shipdate < DATE '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def q6_forecast_revenue_q(spark, sf):
    """TPC-H Q6 (forecast revenue change): the pure scan-bound query — every
    predicate pushes to the parquet scan (date range, discount band,
    quantity cap), the aggregate is one map-side-combined fold, and the
    revenue product runs EXACTLY on the integer lattice (cents x
    discount-percent = 1e-4 units summed as BIGINT, one closing division
    to money) so the double hash-compares.  The canonical measure of raw
    scan throughput: at 100 TB this is the query whose cost IS the
    column-pruned, predicate-pushed IO — any plan regression here is a
    storage/pushdown regression, pinned by the bench row."""
    li = load_table(spark, sf, "lineitem")
    pe4 = _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount"))
    f = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(pe4).cast("bigint").alias("revenue_e4"),
        (F.sum(pe4).cast("double") / 10000).alias("revenue"),
    )


@register(
    "q10_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                AS revenue_cents
       FROM customer c
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON n.n_nationkey = c.c_nationkey
       WHERE o.o_orderdate >= DATE '1996-10-01'
         AND o.o_orderdate < DATE '1997-01-01'
         AND l.l_returnflag = 'R'
       GROUP BY 1, 2, 3
       ORDER BY revenue_cents DESC, c.c_custkey ASC
       LIMIT 20""",
)
def q10_returned_items_q(spark, sf):
    """TPC-H Q10 (returned-item losses): the 4-table join + grouped revenue
    + top-20 composition — lineitem filters on the return flag at the
    scan, orders prunes to one quarter, the 25-row nation dim always
    broadcasts while customer — which GROWS with SF — is deliberately
    left unhinted (AQE broadcasts it at small SF, hash-joins at scale),
    revenue folds on exact cents, and the top-20 is a TakeOrderedAndProject with the
    deterministic (revenue desc, custkey) tie order — no global sort.
    Together with Q3/Q5/Q14/Q18/Q19 this pins the join-ordering and
    broadcast-selection behavior Catalyst must keep exhibiting as the
    fact tables scale."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    # customer GROWS with SF (150k x SF rows) — never hint it broadcast;
    # AQE picks broadcast at small SF and hash at scale.  nation is a
    # 25-row constant dim: always broadcast.
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("bigint")
             .alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "sample_poisson_bootstrap",
    f"""WITH t AS (SELECT doc_id, CAST({_TOKCOUNT_SQL} AS BIGINT) AS v
                  FROM documents),
       x AS (SELECT doc_id, v, CAST(r.j AS INTEGER) AS replicate,
                    ('0x' || substr(md5('boot' || CAST(r.j AS VARCHAR)
                                        || CAST(doc_id AS VARCHAR)), 1, 7)
                    )::BIGINT % 10000 AS b
             FROM t CROSS JOIN range(10) r(j)),
       c AS (SELECT replicate, v,
                    CASE WHEN b < 3679 THEN 0
                         WHEN b < 7358 THEN 1
                         WHEN b < 9197 THEN 2
                         WHEN b < 9810 THEN 3
                         WHEN b < 9963 THEN 4
                         WHEN b < 9994 THEN 5
                         ELSE 6 END AS k
             FROM x)
       SELECT replicate, CAST(SUM(k) AS BIGINT) AS n_rows_resampled,
              CAST(SUM(k * v) AS BIGINT) AS value_resampled
       FROM c GROUP BY 1""",
)
def sample_poisson_bootstrap_q(spark, sf):
    """POISSON BOOTSTRAP of the corpus token count (operators/sampling.py::
    poisson_bootstrap) — the distributed bootstrap (Chamandy et al. 2012):
    each document contributes k ~ Poisson(1) copies to each of 10
    replicates, row-locally and with no global n, so the replicate totals
    ARE the bootstrap distribution a consumer reads a confidence interval
    from — the only coordination is a 10-row reduce.  Draws come from the
    md5-uniform lattice with per-replicate salts through the
    integer-quantized Poisson(1) CDF (< 1e-4 per-bucket distortion, the
    importance_sample rate-lattice policy), so membership is exact,
    retry/rerun-stable, and oracle-reproducible.  The replicate fan-out is
    a row-local array explode into ONE map-side-combined aggregate — the
    hopping-window posture: shuffle bytes are replicates x partials, not
    10x the corpus."""
    from trafficbigdatasearch_spark.functions import text as T
    from trafficbigdatasearch_spark.operators import sampling

    docs = load_table(spark, sf, "documents")
    return sampling.poisson_bootstrap(
        docs, "doc_id", T.token_count(F.col("text")), n_replicates=10
    )


@register(
    "quality_dedup_report",
    f"""WITH b AS (SELECT source AS grp, doc_id,
                       md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                         AS f,
                       CAST({_TOKCOUNT_SQL} AS BIGINT) AS t
                FROM documents),
       p AS (SELECT grp, f, CAST(count(*) AS BIGINT) AS n,
                    CAST(SUM(t) AS BIGINT) AS sum_t,
                    arg_min(t, doc_id) AS keeper_t
             FROM b GROUP BY 1, 2)
       SELECT grp AS source, CAST(SUM(n) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_unique,
              CAST(SUM(n) - count(*) AS BIGINT) AS surplus_docs,
              CAST(SUM(sum_t - keeper_t) AS BIGINT) AS surplus_tokens
       FROM p GROUP BY 1""",
)
def quality_dedup_report_q(spark, sf):
    """EXACT-DEDUP impact report per source (operators/validate.py::
    dedup_report) — the per-feed copy-paste audit published with every
    corpus delivery before the expensive near-dup fabrics run: distinct
    content fingerprints vs raw docs, and the token mass carried by
    non-keeper duplicates (keeper = min id per fingerprint group — the
    dedup_exact survivor convention, its token count via one arg-min, so
    the report states exactly what the dedup job would delete).  ONE
    fingerprint pass, one map-side-combined (source, fingerprint)
    aggregate, totals from a reaggregation of those partials — the corpus
    scans once at any SF."""
    from trafficbigdatasearch_spark.operators import validate as V

    return V.dedup_report(load_table(spark, sf, "documents"))


_JACCARD_PAIRS_SQL = """toks AS (SELECT doc_id, {toks} AS t FROM documents),
       idx AS (SELECT doc_id, t,
                      unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS i
               FROM toks),
       sh AS (SELECT DISTINCT doc_id,
                     array_to_string(t[i + 1 : i + 3], ' ') AS s
              FROM idx),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       shared AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT id_a, id_b, shared, sa.sz AS size_a, sb.sz AS size_b
         FROM shared
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared)
               >= {threshold})"""


@register(
    "text_vocab_curve",
    f"""WITH toks AS (SELECT doc_id, {_GUARDED_TOKS} AS t FROM documents),
       cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
               FROM (SELECT unnest(t) AS term FROM toks)
               WHERE term <> '' GROUP BY term),
       ranked AS (SELECT freq,
                         row_number() OVER (ORDER BY freq DESC, term) AS rnk
                  FROM cnt),
       agg AS (SELECT CAST(SUM(freq) AS BIGINT) AS total,
                      CAST(COALESCE(SUM(CASE WHEN rnk <= 100 THEN freq END),
                                    0) AS BIGINT) AS c100,
                      CAST(COALESCE(SUM(CASE WHEN rnk <= 250 THEN freq END),
                                    0) AS BIGINT) AS c250,
                      CAST(COALESCE(SUM(CASE WHEN rnk <= 500 THEN freq END),
                                    0) AS BIGINT) AS c500,
                      CAST(COALESCE(SUM(CASE WHEN rnk <= 1000 THEN freq END),
                                    0) AS BIGINT) AS c1000,
                      CAST(COALESCE(SUM(CASE WHEN rnk <= 2000 THEN freq END),
                                    0) AS BIGINT) AS c2000
               FROM ranked)
       SELECT CAST(100 AS BIGINT) AS v, c100 AS covered_tokens,
              total AS total_tokens,
              CAST(c100 AS DOUBLE) / total AS coverage FROM agg
       UNION ALL SELECT 250, c250, total, CAST(c250 AS DOUBLE) / total FROM agg
       UNION ALL SELECT 500, c500, total, CAST(c500 AS DOUBLE) / total FROM agg
       UNION ALL SELECT 1000, c1000, total,
                 CAST(c1000 AS DOUBLE) / total FROM agg
       UNION ALL SELECT 2000, c2000, total,
                 CAST(c2000 AS DOUBLE) / total FROM agg""",
)
def text_vocab_curve_q(spark, sf):
    """VOCABULARY COVERAGE CURVE (operators/vocab.py::coverage_curve) —
    cumulative token share captured by the top-V vocabulary at V in
    {{100, 250, 500, 1000, 2000}}: the measured Zipf head behind every
    build_vocab / BPE-size decision, in the vocabulary's own
    deterministic (freq DESC, token ASC) order so the curve states
    exactly what build_vocab(V) captures.  Exact BIGINT covered/total
    legs + one closing division per row.  The frequency pass is the one
    every text op already pays; the rank window and checkpoint sums run
    over the FREQUENCY TABLE only (the vocab.py bounded-window pattern)
    — 5 rows out at any SF."""
    from trafficbigdatasearch_spark.operators import vocab

    return vocab.coverage_curve(load_table(spark, sf, "documents"))


@register(
    "quality_syndication",
    f"""WITH {_JACCARD_PAIRS_SQL.format(toks=_TOKS, threshold=0.2)},
       src AS (SELECT doc_id, source FROM documents),
       lab AS (SELECT least(a.source, b.source) AS source_a,
                      greatest(a.source, b.source) AS source_b
               FROM pairs
               JOIN src a ON a.doc_id = pairs.id_a
               JOIN src b ON b.doc_id = pairs.id_b
               WHERE a.source <> b.source)
       SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
       FROM lab GROUP BY 1, 2""",
)
def quality_syndication_q(spark, sf):
    """CROSS-SOURCE syndication matrix (operators/dedup.py::
    syndication_matrix) — which feeds republish each other: the exact
    >= 0.2 near-dup pair set restricted to pairs straddling two sources,
    counted per unordered source pair.  The curation decision it feeds:
    a heavy cell is one content wire ingested twice — drop a feed at the
    source instead of paying pair-level dedup forever.  Rides the
    inverted-index pair generator (never all-pairs); the (id, source)
    projection joins are broadcast-scale at any corpus size; output is
    bounded by |sources|²."""
    from trafficbigdatasearch_spark.operators import dedup as D

    return D.syndication_matrix(
        load_table(spark, sf, "documents"), threshold=0.2,
        max_shingle_freq=None,
    )


@register(
    "eval_jaccard_histogram",
    f"""WITH {_JACCARD_PAIRS_SQL.format(toks=_TOKS, threshold=0.0)}
       SELECT CAST((10 * shared) // (size_a + size_b - shared) AS INTEGER)
                AS bucket,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM pairs GROUP BY 1""",
)
def eval_jaccard_histogram_q(spark, sf):
    """SIMILARITY HISTOGRAM of the near-dup pair set (operators/
    evalrank.py::jaccard_pair_histogram) — pair counts per exact-Jaccard
    decile over the FULL candidate relation (floor 0: every
    shingle-sharing pair): the threshold-TUNING report that turns the
    dedup cutoff from a guess into a measured choice — on this corpus it
    exhibits the clean bimodal split (noise mass in decile 0, true
    near-dups in decile 9) that justifies the registered 0.2+ cutoffs.
    Buckets are exact integers — (10·shared) div union, bucket 10 =
    exact duplicates — so no float enters the binning.  Candidate volume
    at the lower threshold is the documented cost knob: at 100 TB this
    runs on a hash-sampled doc slice, the histogram SHAPE being the
    deliverable; 11 rows out."""
    from trafficbigdatasearch_spark.operators import evalrank as EV

    return EV.jaccard_pair_histogram(
        load_table(spark, sf, "documents"), threshold=0.0,
        max_shingle_freq=None,
    )


@register(
    "ts_peaks",
    """WITH e AS (SELECT event_type AS key, ts, event_id AS id,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events WHERE value IS NOT NULL),
       x AS (SELECT key, id, cents,
                    lag(cents) OVER (PARTITION BY key
                                     ORDER BY ts, id) AS p,
                    lead(cents) OVER (PARTITION BY key
                                      ORDER BY ts, id) AS nx
             FROM e)
       SELECT key, id, cents FROM x
       WHERE p IS NOT NULL AND nx IS NOT NULL
         AND cents > p AND cents > nx""",
)
def ts_peaks_q(spark, sf):
    """LOCAL PEAK detection per key (operators/timeseries.py::
    local_peaks): rows strictly greater than BOTH ordered neighbors on
    the exact cents lattice — strict on both sides (plateaus are not
    peaks, endpoints excluded), the deterministic contract that makes
    spike marking retry/engine-stable.  The congestion/load-spike marker
    beside ts_cusum's level-shift localizer.  ONE exchange on the key
    (lag and lead share the (ts, id) sort), then a row-local three-way
    integer comparison — no aggregation, output ∝ peaks."""
    from trafficbigdatasearch_spark.operators import timeseries as TS

    return TS.local_peaks(load_table(spark, sf, "events"))


@register(
    "mm_scene_changes",
    """WITH a AS (SELECT doc_id AS asset_id, text FROM documents
                  WHERE doc_id % 3 = 2 AND length(text) > 0),
       f AS (SELECT asset_id, text,
                    CAST(unnest(range(0, ((length(text) - 1) // 200) + 1))
                         AS BIGINT) AS frame_idx
             FROM a),
       fr AS (SELECT asset_id, frame_idx,
                     substr(text, CAST(frame_idx * 200 + 1 AS INT), 200) AS fr
              FROM f),
       h AS (SELECT asset_id, frame_idx,
                    ('0x' || substr(md5(fr), 1, 4))::BIGINT AS ph
             FROM fr),
       x AS (SELECT asset_id, frame_idx, ph,
                    lag(ph) OVER (PARTITION BY asset_id
                                  ORDER BY frame_idx) AS prev
             FROM h)
       SELECT asset_id, frame_idx,
              CAST(bit_count(xor(ph, prev)) AS BIGINT) AS hamming,
              bit_count(xor(ph, prev)) > 4 AS is_boundary
       FROM x WHERE prev IS NOT NULL""",
)
def mm_scene_changes_q(spark, sf):
    """SCENE-CHANGE detection over the video assets (operators/
    multimodal.py::scene_changes) — the shot-boundary primitive behind
    keyframe extraction and per-scene dedup budgets: consecutive frames
    fingerprinted, transitions marked where the perceptual-hash Hamming
    distance exceeds the threshold.  Frames follow the module's stub
    policy (fixed-width payload windows + the md5 pHash stub — no codecs
    in this container), so the WHOLE chain is oracle-reproducible while a
    real deployment swaps exactly one stage (decoder-backed frame hashes
    via the phash_decoded hook) and keeps the framing/lag/boundary logic
    unchanged.  Row-local frame fan-out; the only exchange is the
    per-asset lag window, bounded by each asset's own length."""
    from trafficbigdatasearch_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    assets = multimodal.assets_from_documents(docs).filter(
        F.col("media_type") == "video"
    )
    return multimodal.scene_changes(assets, frame_chars=200, threshold=4)


@register(
    "eval_langid_confusion",
    f"""WITH p AS ({_REGISTRY["text_lang_id"][1]})
       SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2""",
)
def eval_langid_confusion_q(spark, sf):
    """Language-ID CONFUSION MATRIX (the text_lang_id chain's own eval,
    closing the measurement loop the way eval_ivf_recall does for the ANN
    stack): predicted vs labeled language counts per cell, over the
    registered lang-id configuration verbatim (its oracle embeds as the
    CTE, so this row also re-certifies the prediction chain end to end).
    The matrix is what a curation run reads before trusting per-language
    mixture/sampling decisions downstream — off-diagonal mass on a
    language pair means the stopword tables confuse them and the
    per-language temperature/quota math inherits that bias.  One
    map-side-combined count, |langs|² rows out."""
    from trafficbigdatasearch_spark.functions import text as T

    d = load_table(spark, sf, "documents")
    pred = T.lang_id_table(d).join(d.select("doc_id", "lang"), "doc_id")
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


_GOPHER_RULES = [
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_alpha_words", "ok_stopwords", "passes",
]


_GOPHER_RATE_LEGS = "\n       UNION ALL ".join(
    f"""SELECT '{r}' AS rule, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count_if({r}) AS BIGINT) AS n_pass,
              CAST(1000000 * count_if({r}) // count(*) AS BIGINT) AS pass_ppm
       FROM g"""
    for r in _GOPHER_RULES
)


@register(
    "quality_gopher_rates",
    f"""WITH g AS ({{gopher}})
       {_GOPHER_RATE_LEGS}""".format(gopher=_REGISTRY["quality_gopher"][1]),
)
def quality_gopher_rates_q(spark, sf):
    """Per-rule PASS RATES of the Gopher battery (operators/validate.py::
    gopher_rule_rates) — the aggregation quality_gopher's own docstring
    promises ("measure every rule's kill rate before committing to the
    filter"), now a first-class measured row instead of a consumer
    exercise: one row per rule plus the conjunction, with exact-ppm pass
    rates over the registered battery verbatim (its oracle embeds as the
    CTE).  The operator works over ANY boolean-flag frame, so custom
    batteries get the same report.  ONE aggregate pass, one conditional
    count per rule, unpivoted from the single wide row — never a job per
    rule."""
    from trafficbigdatasearch_spark.operators import validate as V

    flags = V.gopher_quality_flags(
        load_table(spark, sf, "documents"), min_words=30
    )
    return V.gopher_rule_rates(flags.drop("doc_id", "n_words"))


@register(
    "eval_split_leakage",
    f"""WITH RECURSIVE {_lsh_pairs_cte('documents')},
       eds AS (SELECT id_a AS u, id_b AS v FROM lsh_pairs
               UNION SELECT id_b, id_a FROM lsh_pairs),
       nds AS (SELECT DISTINCT u AS id FROM eds),
       walk(id, lab) AS (
         SELECT id, id FROM nds
         UNION
         SELECT w.id, e.v FROM walk w JOIN eds e ON e.u = w.lab
       ),
       comp AS (SELECT id, CAST(min(lab) AS BIGINT) AS component
                FROM walk GROUP BY id),
       labl AS (SELECT d.doc_id,
                       COALESCE(c.component, d.doc_id) AS component
                FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       naive AS (SELECT doc_id,
                        CASE WHEN {_BUCKET_SQL.format(salt='split')} < 9000
                             THEN 'train' ELSE 'test' END AS split
                 FROM documents),
       safe AS (SELECT doc_id,
                       CASE WHEN ('0x' || substr(md5('split' ||
                                  CAST(component AS VARCHAR)), 1, 7))::BIGINT
                                 % {sampling.BUCKETS} < 9000
                            THEN 'train' ELSE 'test' END AS split
                FROM labl),
       m AS (
         SELECT 'naive_hash' AS method, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count_if(a.split <> b.split) AS BIGINT) AS n_straddling
         FROM lsh_pairs p
         JOIN naive a ON a.doc_id = p.id_a
         JOIN naive b ON b.doc_id = p.id_b
         UNION ALL
         SELECT 'leakage_free', CAST(count(*) AS BIGINT),
                CAST(count_if(a.split <> b.split) AS BIGINT)
         FROM lsh_pairs p
         JOIN safe a ON a.doc_id = p.id_a
         JOIN safe b ON b.doc_id = p.id_b)
       SELECT method, n_pairs, n_straddling,
              CAST(1000000 * n_straddling // n_pairs AS BIGINT) AS leak_ppm
       FROM m""",
)
def eval_split_leakage_q(spark, sf):
    """SPLIT LEAKAGE audit (operators/evalrank.py::split_leakage) — the
    measurement that JUSTIFIES sample_split_leakage_free: for the
    registered LSH near-dup pair set, how many pairs straddle the
    train/test boundary under (a) the naive per-document hash split and
    (b) the cluster-keyed leakage-free split.  The leakage-free row
    reading n_straddling = 0 is that operator's guarantee MEASURED in the
    driver's own artifact (by construction both members of a pair share a
    component, hence a split); the naive row's nonzero straddle count
    (E = 2·p·(1−p) ≈ 18% of pairs for a 90/10 split; the small sf0.01
    pair set realizes 1/30) is the contamination a per-doc split
    silently ships to eval.  Per
    method: two thin membership joins on the pair ids + one map-side
    fold; exact-ppm output, 2 rows."""
    from trafficbigdatasearch_spark.operators import evalrank as EV

    docs = load_table(spark, sf, "documents")
    # THREE consumers read the pair set (the CC fixpoint inside
    # leakage_free_split + one membership join per audited method), so the
    # shingle->minhash->band pipeline is checkpointed once instead of
    # evaluated three times — the SURVEY §4 multi-consumer convention;
    # measured 5.68 -> 3.69 s (1.54x) at sf0.1 (SCALING.md r12).  Lazy:
    # the first consumer's action materializes it.
    pairs = dedup.minhash_lsh_pairs(
        docs, k=_MINHASH_K, bands=4, n=3
    ).localCheckpoint(eager=False)
    naive = sampling.hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    safe = sampling.leakage_free_split(
        docs, pairs, {"train": 0.9, "test": 0.1}
    )
    return EV.split_leakage(
        pairs,
        {"naive_hash": naive.select("doc_id", "split"),
         "leakage_free": safe.select("doc_id", "split")},
    )


@register(
    "dedup_cross_corpus",
    f"""WITH {_band_cte('documents', 'X')},
       ca AS (SELECT * FROM bandX WHERE doc_id % 2 = 0),
       cb AS (SELECT * FROM bandX WHERE doc_id % 2 = 1)
       SELECT DISTINCT ca.doc_id AS id_a, cb.doc_id AS id_b
       FROM ca JOIN cb
         ON ca.band = cb.band AND ca.bucket = cb.bucket""",
)
def dedup_cross_corpus_q(spark, sf):
    """SYMMETRIC cross-corpus near-dup candidates (operators/dedup.py::
    cross_corpus_pairs) — the corpus-MERGER shape completing the dedup
    deployment matrix: within-corpus (dedup_minhash_lsh), small-increment
    vs corpus (dedup_incremental, increment broadcasts), corpus vs small
    benchmark (decontaminate, benchmark broadcasts), and now LARGE vs
    LARGE, where no side fits a broadcast and the only scaling plan is
    both sides banding independently and meeting in ONE equi-join on the
    (band, bucket) key.  Even/odd doc ids stand in for the two crawls;
    cross pairs only (each side's internal dedup is its own batch job);
    the per-side bucket cap bounds any boilerplate band value's fan-out
    BEFORE the join.  Same candidate semantics as the registered LSH
    fabric, so the oracle is the band chain restricted to cross pairs."""
    docs = load_table(spark, sf, "documents")
    return dedup.cross_corpus_pairs(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        k=_MINHASH_K, bands=4, n=3,
    )
