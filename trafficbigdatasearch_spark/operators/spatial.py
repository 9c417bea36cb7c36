"""Grid-bucketed spatial joins (radius / k-nearest-cell neighborhood).

The reference's only spatial operator is the rectangular bbox predicate (P1,
src/AccidentStatistics.scala:102, src/OverSpeedCount.scala:36) — a plain
2-D BETWEEN.  This module adds the spatial JOIN the reference cannot
express: "all pairs of points within radius r" — the accident-hotspot /
station-proximity question — in the shuffle-native grid formulation every
distributed spatial engine uses (GeoSpark/Sedona-style uniform grid
partition join).

Why not a cross join + distance filter: that is O(n²) rows through the
cluster regardless of selectivity.  The grid form is O(n · 9) candidate
rows and ONE hash shuffle on the cell key:

1. cell(p) = (floor(x / r), floor(y / r)) — with cell size exactly r, any
   two points within distance r are in the same or 8-adjacent cells.
2. LEFT side explodes to its 3×3 cell neighborhood (9 rows / point);
   RIGHT side stays on its single home cell.  A qualifying pair (a, b) is
   then matched at exactly ONE join key — b's home cell — so no
   post-join dedup is needed.
3. equi join on the cell key → candidates; the exact distance predicate
   runs as a residual on the candidate set only.

At 100 TB: the shuffle is on the uniform grid key, so skew only appears
when the DATA is spatially skewed (urban hotspots).  The standard fix
composes with this operator unchanged: recurse — re-grid dense cells at a
finer pitch — or salt the hot cells; both stay equi joins.  AQE's skew
split handles moderate hotspots without either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grid_cells_3x3(x, y, cell: int):
    """Array of the 9 (cx, cy) cells adjacent to (and including) the home
    cell of integer point (x, y) at grid pitch ``cell``.  Encoded as a
    single bigint key ``cx * 2^21 + cy`` (cells are non-negative after the
    +1 offset guard; callers keep coordinates >= 0)."""
    cx = F.floor(x / cell)
    cy = F.floor(y / cell)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    return F.array(
        *[((cx + dx + 1) * (1 << 21) + (cy + dy + 1)) for dx, dy in offs]
    )


def grid_cell_home(x, y, cell: int):
    """The single home-cell key of (x, y) — same encoding as
    :func:`grid_cells_3x3`."""
    return (F.floor(x / cell) + 1) * (1 << 21) + (F.floor(y / cell) + 1)


def radius_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs of points within ``radius``, exact and
    duplicate-free: (id_a, id_b, dist2) with id_a < id_b and
    dist2 = (xa-xb)² + (ya-yb)² <= radius².

    Coordinates must be non-negative integers (cast them; integer dist2
    keeps the operator exactly reproducible in any engine — no floating
    point).  One explode (9×, left side only), one equi-join shuffle on the
    cell key, residual distance filter on candidates only.  Completeness
    is fuzz-pinned vs brute-force distance for random radii with clusters
    astride cell boundaries (tests/test_oracle_fuzz.py).
    """
    p = points.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    left = p.select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        F.explode(grid_cells_3x3(F.col("_x"), F.col("_y"), radius)).alias("_cell"),
    )
    right = p.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        grid_cell_home(F.col("_x"), F.col("_y"), radius).alias("_cell"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist2 = dx * dx + dy * dy  # bigint arithmetic — pow() would go double
    return (
        left.join(right, "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dist2.cast("bigint"))
        .filter(F.col("dist2") <= radius * radius)
        .select("id_a", "id_b", "dist2")
    )


def dbscan(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    min_pts: int,
) -> DataFrame:
    """Distributed DBSCAN over integer points: (id, cluster, role) with
    role in {'core', 'border', 'noise'} and cluster = the minimum core-point
    id of the cluster (-1 for noise) — the standard density-clustering
    composition, built ENTIRELY from the already-verified pieces:

    1. neighbor pairs within eps     -> :func:`radius_pairs` (grid join)
    2. density (core-point test)     -> pair-count per point;
       ``n_neighbors >= min_pts``, self EXCLUDED (document your convention;
       the classic |N_eps(p)| >= minPts includes p — subtract 1)
    3. core connectivity             -> connected components over the
       core-core edge subset (operators/graph.py, alternating star)
    4. border attachment             -> non-core points adopt the MINIMUM
       cluster id among their core neighbors (deterministic where classic
       DBSCAN is scan-order-dependent); everything else is noise

    Every stage is a hash-partitioned join/aggregate — no region growing,
    no scan order, no driver-side frontier; the O(log² n) CC fixpoint
    replaces the sequential flood fill.  Deterministic output (min-id
    labels) regardless of partitioning, unlike textbook DBSCAN whose
    border assignment depends on visit order.
    """
    from trafficbigdatasearch_spark.operators import graph as G

    p = points.select(F.col(id_col).cast("bigint").alias("id"), x_col, y_col)
    # the grid join feeds FIVE downstream consumers (counts, core filter,
    # core-core subset, the CC loop via it, and border attachment) —
    # checkpoint it once (lazily: materialized by the first job, block
    # storage after) instead of re-running the explode+join per consumer
    pairs = radius_pairs(points, id_col, x_col, y_col, radius).localCheckpoint(
        eager=False
    )
    sides = pairs.select(F.col("id_a").alias("id")).union(
        pairs.select(F.col("id_b").alias("id"))
    )
    counts = sides.groupBy("id").agg(F.count("*").alias("n"))
    # core is probed by three semi/anti joins below — reuse, don't re-agg
    core = (
        counts.filter(F.col("n") >= min_pts).select("id").localCheckpoint(eager=False)
    )

    core_pairs = (
        pairs.join(core.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
    )
    cc = G.connected_components(core_pairs, "id_a", "id_b", nodes=core)

    sym = pairs.select("id_a", "id_b").union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    border = (
        sym.join(core.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), "id_b", "left_anti")
        .join(cc.withColumnRenamed("id", "id_a"), "id_a")
        .groupBy(F.col("id_b").alias("id"))
        .agg(F.min("component").alias("cluster"))
    )

    core_out = cc.select("id", F.col("component").alias("cluster"), F.lit("core").alias("role"))
    border_out = border.select("id", "cluster", F.lit("border").alias("role"))
    labeled = core_out.union(border_out)
    noise = p.select("id").join(labeled.select("id"), "id", "left_anti").select(
        "id", F.lit(-1).cast("bigint").alias("cluster"), F.lit("noise").alias("role")
    )
    return labeled.union(noise)


def radius_join_counts(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """Per-point neighbor count within ``radius`` (the density / hotspot
    score): (id, n_neighbors).  Both orientations of each pair contribute,
    so the count is symmetric; isolated points report 0."""
    pairs = radius_pairs(points, id_col, x_col, y_col, radius)
    both = pairs.select(F.col("id_a").alias("_id")).union(
        pairs.select(F.col("id_b").alias("_id"))
    )
    counts = both.groupBy("_id").agg(F.count("*").alias("n_neighbors"))
    ids = points.select(F.col(id_col).cast("bigint").alias("_id")).distinct()
    return ids.join(counts, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
    )


def _validate_ccw_convex(pid, verts: list[tuple[int, int]]) -> None:
    """Driver-side enforcement of the CCW+convex contract: a clockwise or
    concave polygon would silently fail the half-plane test (typically
    matching NOTHING), so reject it loudly.  Vertices are literals, so
    this is O(V) integer arithmetic per polygon — free.

    - winding: twice the signed area (shoelace) must be > 0 (CCW);
    - convexity (and non-degeneracy): every consecutive edge pair must
      turn left or stay straight — cross product >= 0 — with at least one
      strict left turn."""
    if len(verts) < 3:
        raise ValueError(f"polygon {pid}: needs >= 3 vertices")
    area2 = sum(
        ax * by - bx * ay
        for (ax, ay), (bx, by) in zip(verts, verts[1:] + verts[:1])
    )
    if area2 <= 0:
        raise ValueError(
            f"polygon {pid}: vertices must be counter-clockwise "
            f"(shoelace signed area*2 = {area2}); reverse the vertex order"
        )
    n = len(verts)
    for i in range(n):
        ax, ay = verts[i]
        bx, by = verts[(i + 1) % n]
        cx, cy = verts[(i + 2) % n]
        cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if cross < 0:
            raise ValueError(
                f"polygon {pid}: concave at vertex {(bx, by)} — "
                "point_in_convex_polygon_join requires convex polygons "
                "(triangulate concave zones into convex pieces first)"
            )


def point_in_convex_polygon_join(
    points: DataFrame,
    polygons: list[tuple[int, list[tuple[int, int]]]],
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Assign each point to the convex polygons containing it — the
    zone/geofence join (accident -> district, station -> coverage area)
    the bbox predicate cannot express for non-rectangular regions.

    ``polygons`` is a small driver-side list of (polygon_id, vertices)
    with INTEGER vertices in counter-clockwise order — the dimension-table
    side of a geofence join (hundreds of zones, not data-scale), compiled
    into literal column expressions.  The CCW + convex contract is
    VALIDATED driver-side (shoelace winding + cross-product convexity,
    :func:`_validate_ccw_convex`) — a mis-wound zone raises instead of
    silently matching nothing.  Containment is the standard
    half-plane test: p is inside iff for every CCW edge (a, b) the cross
    product (b-a) x (p-a) is >= 0 (boundary inclusive).  All-integer
    arithmetic -> exact, no epsilon.

    Scale shape: ZERO shuffle — each polygon's test is a row-local boolean
    over the scan (whole-stage codegen), and the result is one row per
    (point, containing polygon) via an array of matched ids exploded
    inline.  With P polygons of ~V vertices the per-row cost is O(P·V)
    multiplications; for P beyond a few thousand, pre-filter with a grid
    join on polygon bounding boxes (radius_pairs' cell machinery) first.
    Points in no polygon are dropped (inner-join semantics).
    """
    if not polygons:
        raise ValueError("polygons must be non-empty")
    for pid, verts in polygons:
        _validate_ccw_convex(pid, verts)
    px, py = F.col(x_col), F.col(y_col)

    def _inside(verts: list[tuple[int, int]]):
        tests = []
        for (ax, ay), (bx, by) in zip(verts, verts[1:] + verts[:1]):
            cross = (F.lit(bx - ax) * (py - F.lit(ay))
                     - F.lit(by - ay) * (px - F.lit(ax)))
            tests.append(cross >= 0)
        acc = tests[0]
        for t in tests[1:]:
            acc = acc & t
        return acc

    matched = F.array_compact(
        F.array(
            *[
                F.when(_inside(verts), F.lit(pid).cast("bigint"))
                for pid, verts in polygons
            ]
        )
    )
    return (
        points.select(F.col(id_col), px.alias("_x"), py.alias("_y"),
                      matched.alias("_m"))
        .select(id_col, F.explode("_m").alias("polygon_id"))
    )


def knn_within_radius(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    k: int = 5,
) -> DataFrame:
    """k-NEAREST-NEIGHBOR join, bounded by ``radius`` — for every point,
    its k nearest neighbors among those within the radius, exact:
    (id, neighbor_id, dist2, rank) with integer squared distances and the
    deterministic (dist2, neighbor_id) tie order.

    The radius bound is the honest scale formulation of a spatial kNN
    join: UNBOUNDED exact kNN needs data-dependent grid-ring expansion for
    isolated points (per-point iteration — a fixpoint), while virtually
    every production use ("k nearest stations/accidents/pickups") carries
    a natural relevance horizon anyway.  Points with fewer than k
    neighbors in range return what exists; isolated points return nothing
    (LEFT-join the output against the point set if absence must be
    visible — the spatial_density convention).

    Cost over :func:`radius_pairs`: the pair set symmetrizes (2 rows per
    pair, row-local) and ONE window partitioned by the source point ranks
    candidates — |pairs within radius| rows through one extra exchange,
    never an all-pairs relation.  Same skew posture as the grid join it
    rides: a dense cell bounds fan-out, and radius is the knob.
    """
    pairs = radius_pairs(points, id_col, x_col, y_col, radius)
    sym = pairs.select(
        F.col("id_a").alias("id"),
        F.col("id_b").alias("neighbor_id"),
        "dist2",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"),
            F.col("id_a").alias("neighbor_id"),
            "dist2",
        )
    )
    w = Window.partitionBy("id").orderBy("dist2", "neighbor_id")
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
