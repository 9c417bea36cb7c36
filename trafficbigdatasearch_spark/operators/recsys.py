"""Item-item collaborative filtering over an interaction stream.

The reference aggregates per-entity traffic statistics
(`/root/reference/src/OverSpeedCount.scala:18-139` counts per vehicle); the
analytics-engine generalization is the co-occurrence family: which ITEMS
travel together across users, and what does that imply for ranking unseen
items per user.  Classic item-based CF (Sarwar et al., WWW'01) —
deliberately neighborhood-based, not matrix factorization: co-occurrence
counts and cosine-normalized neighbor lists are exact, shuffle-bounded
DataFrame aggregates, where ALS-style factorization is an iterative solver
with different infrastructure needs.

Shapes (the 100 TB posture):

- Everything runs on the DISTINCT (user, item) matrix — the same guard as
  a_basket_pairs: the raw event stream collapses first (one shuffle), so
  per-user fan-out in the pair join is items-per-user choose 2, never
  events choose 2.
- The co-occurrence table is bounded by item-pair support, not data volume;
  ``min_co`` cuts the long tail exactly like lm.py's ``min_count``.  The
  per-user recommend join ships it broadcast when small (``hint=
  "broadcast"``) or AQE-sized otherwise.
- Determinism for the registry oracle: co-counts and per-item counts are
  integers; the cosine ``n_co / (sqrt(n_a) * sqrt(n_b))`` is one fixed
  IEEE op sequence (vectors.py's policy); the user-level recommendation
  score is an INTEGER sum of co-counts (order-independent), never a float
  SUM — rank ties break on item id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import partitioning as P


def user_item(
    events: DataFrame,
    user_col: str = "user_id",
    item_expr: Column | None = None,
) -> DataFrame:
    """Distinct (user_id, item_id) interaction matrix.  ``item_expr``
    defaults to the ``k`` field of the events ``props`` JSON (the testdata
    item id); pass any Column for real schemas.  NULL items (malformed
    props) are dropped — they would otherwise form a phantom mega-item."""
    if item_expr is None:
        # try_cast, not cast: a malformed props value must drop the row
        # (NULL filter below), not fail the job under Spark 4's ANSI default
        item_expr = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    # conditional spread before the per-row JSON parse: the parse otherwise
    # fuses into the scan stage, and a low-split local source runs it on
    # one core (identity at scale — partitioning.py); the distinct's
    # exchange comes AFTER the parse, too late to help
    events = P.ensure_compute_width(events, user_col)
    return (
        events.select(
            F.col(user_col).alias("user_id"), item_expr.alias("item_id")
        )
        .filter(F.col("item_id").isNotNull())
        .distinct()
    )


def item_counts(ui: DataFrame) -> DataFrame:
    """(item_id, n_users) — each item's interaction-set size."""
    return ui.groupBy("item_id").agg(F.count(F.lit(1)).alias("n_users"))


def cap_hot_users(ui: DataFrame, max_user_items: int | None) -> DataFrame:
    """Drop users whose distinct-item count exceeds ``max_user_items``
    BEFORE any pair join — the co-occurrence twin of
    ``jaccard_link_prediction``'s ``max_degree`` hub guard
    (graph.py): the user self-join fans out quadratically in each
    user's item count, so one crawler / power user with 10⁵ items
    yields ~5×10⁹ pairs from a single shuffle key.  ``min_co`` prunes
    AFTER that explosion; this guard prevents it.

    Whole-user drop, not head-sampling: the same explicit recall trade
    the LSH bucket cap and the wedge-join hub guard make — co-counts
    witnessed ONLY through a user this promiscuous are near-uniform
    noise (such a user co-occurs with most of the catalog), so the
    dropped signal is uninformative, and the drop keeps every surviving
    co-count EXACT (a sampled user would bias counts unpredictably).
    Hot users are few by construction, so the over-cap id list ships
    broadcast to a left-anti join.  ``None`` = no cap (identity)."""
    if max_user_items is None:
        return ui
    if max_user_items <= 0:
        raise ValueError(
            f"max_user_items must be positive, got {max_user_items}"
        )
    # count_distinct, not count: the documented threshold is the user's
    # DISTINCT-item fan-out (what the pair join squares).  On the collapsed
    # user_item() matrix the two agree; as a public standalone guard this
    # must not whole-drop a 3-item user who merely has 100 repeat
    # interaction rows (review r8).
    hot = (
        ui.groupBy("user_id")
        .agg(F.count_distinct("item_id").alias("_n_items"))
        .filter(F.col("_n_items") > max_user_items)
        .select("user_id")
    )
    return ui.join(F.broadcast(hot), "user_id", "left_anti")


def item_cooccurrence(
    ui: DataFrame, min_co: int = 1, max_user_items: int | None = None
) -> DataFrame:
    """Ordered co-occurrence pairs: (item_a < item_b, n_co) = number of
    users who interacted with both.  Self-join on user over the collapsed
    matrix + one map-side-combined count; ``min_co`` prunes the tail.
    ``max_user_items`` (see ``cap_hot_users``) drops over-degree users
    BEFORE the self-join — the pre-explosion skew guard ``min_co``
    cannot provide."""
    ui = cap_hot_users(ui, max_user_items)
    a = ui.alias("a")
    b = ui.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item_id") < F.col("b.item_id")),
        )
        .groupBy(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= min_co)
    )


def _symmetric(co: DataFrame) -> DataFrame:
    """Both orientations of the ordered pair table: (item_id, neighbor_id,
    n_co).  Union, not a second join — the count is symmetric."""
    return co.select(
        F.col("item_a").alias("item_id"),
        F.col("item_b").alias("neighbor_id"),
        "n_co",
    ).unionByName(
        co.select(
            F.col("item_b").alias("item_id"),
            F.col("item_a").alias("neighbor_id"),
            "n_co",
        )
    )


def item_cosine_neighbors(
    ui: DataFrame,
    n: int = 10,
    min_co: int = 1,
    max_user_items: int | None = None,
) -> DataFrame:
    """Per-item top-``n`` neighbor list under co-occurrence cosine:
    (item_id, neighbor_id, n_co, score, rank) with
    ``score = n_co / (sqrt(n_users_a) * sqrt(n_users_b))`` — the
    similarity index an item-based recommender serves from.

    Plan: pair counts (one self-join + count), symmetrize (union), two
    broadcast joins to the tiny per-item count table, per-item top-n
    window.  The window partitions by item_id, so no global exchange; the
    scored set is the pruned co-table, already support-bounded.

    The interaction matrix feeds FOUR plan branches (both co-join sides +
    both count lookups); without materialization Spark recomputes the
    distinct collapse — and the event scan under it — once per branch
    (measured: 6 scans, 0 reused exchanges).  One lazy localCheckpoint
    pins it to a single computation, the graph.py fixpoint pattern.

    ``max_user_items`` applies ``cap_hot_users`` to the WHOLE
    computation (co-counts AND the n_users denominators) so the cosine
    stays internally consistent — capping only the pair join would
    inflate denominators with users whose co-counts were excluded."""
    ui = cap_hot_users(ui, max_user_items).localCheckpoint(eager=False)
    counts = item_counts(ui)
    sym = _symmetric(item_cooccurrence(ui, min_co))
    na = counts.select(
        F.col("item_id"), F.col("n_users").alias("_na")
    )
    nb = counts.select(
        F.col("item_id").alias("neighbor_id"), F.col("n_users").alias("_nb")
    )
    scored = (
        sym.join(F.broadcast(na), "item_id")
        .join(F.broadcast(nb), "neighbor_id")
        .select(
            "item_id",
            "neighbor_id",
            "n_co",
            (
                F.col("n_co").cast("double")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("item_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= n)
    )


def recommend_topn(
    ui: DataFrame,
    n: int = 5,
    min_co: int = 1,
    hint: str = "broadcast",
    max_user_items: int | None = None,
) -> DataFrame:
    """Per-user top-``n`` unseen-item recommendations: (user_id, item_id,
    score, rank) where score = SUM of co-counts between the candidate and
    the user's items — item-based CF with count weights.

    The score is an INTEGER sum (order-independent — this is what makes
    the row oracle-hashable; a float-weighted variant would need the
    fixed-order-add treatment fusion.py uses).  Candidates already seen by
    the user are removed with a LEFT ANTI join on the interaction matrix.
    Plan: ui ⋈ co-table (broadcast under the default hint) -> one
    map-side-combined (user, candidate) sum -> anti join -> per-user top-n
    window (partitioned by user, no global exchange).

    ``max_user_items`` caps ONLY the co-occurrence input (the quadratic
    stage — see ``cap_hot_users``); the candidate and anti joins keep the
    FULL matrix, so an over-cap user still receives recommendations —
    scored by the co-counts the normal population produced — and still
    has every seen item excluded.  Those two stages are linear in the
    user's item count, so the hot user is harmless there."""
    if hint not in ("broadcast", "auto"):
        raise ValueError(f"hint must be 'broadcast' or 'auto', got {hint!r}")
    # same multi-consumer materialization as item_cosine_neighbors: the
    # matrix feeds the co-join (twice), the candidate join, and the anti
    # join — checkpoint once instead of four event-scan recomputes
    ui = ui.localCheckpoint(eager=False)
    sym = _symmetric(item_cooccurrence(ui, min_co, max_user_items))
    if hint == "broadcast":
        sym = F.broadcast(sym)
    cand = (
        ui.join(sym, "item_id")
        .groupBy("user_id", F.col("neighbor_id").alias("item_id"))
        .agg(F.sum("n_co").alias("score"))
    )
    # anti join needs matching names on both sides; ui is (user_id, item_id)
    unseen = cand.join(ui, ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        unseen.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= n)
        .select("user_id", "item_id", "score", "rank")
    )


def sample_negatives(
    ui: DataFrame,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic NEGATIVE sampling over the interaction matrix — the
    training-data generator for contrastive recommenders (BPR, two-tower):
    for every positive (user, item) pair, ``k`` candidate negatives drawn
    uniformly from the item catalog by md5 of (salt, user:item:slot), with
    candidates that collide with ANY of the user's positives dropped.

    Determinism contract (the sampling.py recipe, extended to drawing from
    a catalog): the draw index is a pure row-local md5 expression, so the
    sample is identical under retries, repartitioning, and in the DuckDB
    oracle — never rand().  Dropped collisions mean a positive-heavy user
    gets slightly fewer than ``k`` negatives per positive rather than a
    re-draw loop; at real catalog sizes (collision rate = positives /
    catalog) the deficit is negligible, and the fixed-slot shape keeps the
    operator one-pass.

    Plan: the catalog gets a dense 0-based index with ONE bounded global
    window (catalog-sized, the vocab top-V posture — items, not events),
    ships broadcast to the slot-exploded positives (one row-local explode
    of width k), and the collision filter is one anti join on
    (user, item).  Returns (user_id, pos_item_id, slot, neg_item_id)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # the matrix feeds three branches (catalog, slot-exploded positives,
    # collision anti join) — same one-computation materialization as the
    # sibling operators
    ui = ui.localCheckpoint(eager=False)
    cat = (
        ui.select("item_id")
        .distinct()
        .withColumn(
            "_idx",
            F.row_number().over(Window.orderBy(F.col("item_id"))).cast(
                "bigint"
            )
            - 1,
        )
    )
    n_items = cat.count()
    if n_items == 0:
        raise ValueError("interaction matrix has no items")
    key = F.concat(
        F.lit(salt),
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.col("item_id").cast("string"),
        F.lit(":"),
        F.col("slot").cast("string"),
    )
    draw = (
        F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("bigint")
        % n_items
    )
    cand = (
        ui.select("user_id", "item_id")
        .withColumn(
            "slot", F.explode(F.array(*[F.lit(i) for i in range(k)]))
        )
        .withColumn("_idx", draw)
        .withColumnRenamed("item_id", "pos_item_id")
        .join(
            F.broadcast(cat.withColumnRenamed("item_id", "neg_item_id")),
            "_idx",
        )
    )
    pos = ui.select(
        "user_id", F.col("item_id").alias("neg_item_id")
    )
    return (
        cand.join(pos, ["user_id", "neg_item_id"], "left_anti")
        .select(
            "user_id",
            "pos_item_id",
            F.col("slot").cast("bigint").alias("slot"),
            "neg_item_id",
        )
    )
