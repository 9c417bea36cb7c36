"""Grid-bucketed spatial radius join (operators/spatial.py) vs brute force."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import spatial


def _points(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
    )


def _brute(pts, r):
    out = set()
    for i, (xa, ya) in enumerate(pts):
        for j, (xb, yb) in enumerate(pts):
            if i < j and (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r:
                out.add((i, j))
    return out


def test_radius_pairs_exact(spark):
    rng = random.Random(7)
    for _ in range(3):
        pts = [(rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(120)]
        got = {
            (r.id_a, r.id_b)
            for r in spatial.radius_pairs(_points(spark, pts), "id", "x", "y", 15)
            .collect()
        }
        assert got == _brute(pts, 15)


def test_boundary_distance_inclusive(spark):
    # distance exactly r (dist2 == r²) must be included; r+1 excluded
    pts = [(0, 0), (10, 0), (21, 0)]
    rows = spatial.radius_pairs(_points(spark, pts), "id", "x", "y", 10).collect()
    assert {(r.id_a, r.id_b, r.dist2) for r in rows} == {(0, 1, 100)}


def test_cross_cell_pairs_found_once(spark):
    # points in adjacent cells: each qualifying pair appears exactly once
    pts = [(9, 9), (11, 11), (10, 10), (9, 11)]
    rows = spatial.radius_pairs(_points(spark, pts), "id", "x", "y", 10).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs)) == 6  # all 4 points mutually close


def test_neighbor_counts_include_isolated(spark):
    pts = [(0, 0), (5, 0), (500, 500)]
    got = {
        r.id: r.n_neighbors
        for r in spatial.radius_join_counts(
            _points(spark, pts), "id", "x", "y", 10
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 0}


def test_plan_is_single_equi_join_no_bnlj(spark):
    pts = _points(spark, [(i * 3 % 50, i * 7 % 50) for i in range(40)])
    plan = (
        spatial.radius_pairs(pts, "id", "x", "y", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# dbscan
# ---------------------------------------------------------------------------


def _dbscan_reference(pts, r, min_pts):
    """Pure-python DBSCAN with the module's conventions: self-excluded
    neighbor counts, min-core-id cluster labels, border -> min core
    neighbor's cluster."""
    n = len(pts)
    nbrs = {i: [] for i in range(n)}
    for i in range(n):
        for j in range(n):
            if i != j and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= r * r:
                nbrs[i].append(j)
    core = {i for i in range(n) if len(nbrs[i]) >= min_pts}
    # components over core-core edges (union-find)
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp = {i: min(k for k in core if find(k) == find(i)) for i in core}
    out = {}
    for i in range(n):
        if i in core:
            out[i] = (comp[i], "core")
        else:
            cs = [comp[j] for j in nbrs[i] if j in core]
            out[i] = (min(cs), "border") if cs else (-1, "noise")
    return out


def test_dbscan_matches_reference(spark):
    rng = random.Random(3)
    for trial in range(2):
        pts = [(rng.randrange(0, 120), rng.randrange(0, 120)) for _ in range(90)]
        got = {
            r.id: (r.cluster, r.role)
            for r in spatial.dbscan(_points(spark, pts), "id", "x", "y", 12, 3).collect()
        }
        assert got == _dbscan_reference(pts, 12, 3)


def test_dbscan_all_noise_when_sparse(spark):
    pts = [(0, 0), (500, 500), (900, 100)]
    got = {r.id: (r.cluster, r.role)
           for r in spatial.dbscan(_points(spark, pts), "id", "x", "y", 10, 1).collect()}
    assert got == {0: (-1, "noise"), 1: (-1, "noise"), 2: (-1, "noise")}


def test_polygon_join_matches_and_validates(spark):
    # unit square (CCW) + triangle; point on boundary is inside
    polys = [
        (1, [(0, 0), (10, 0), (10, 10), (0, 10)]),
        (2, [(5, 5), (20, 5), (12, 15)]),
    ]
    pts = _points(spark, [(1, 1), (10, 5), (11, 6), (30, 30)])
    got = sorted(
        (r.id, r.polygon_id)
        for r in spatial.point_in_convex_polygon_join(pts, polys).collect()
    )
    assert got == [(0, 1), (1, 1), (1, 2), (2, 2)]


def test_polygon_join_rejects_clockwise(spark):
    import pytest

    pts = _points(spark, [(1, 1)])
    cw = [(3, [(0, 0), (0, 10), (10, 10), (10, 0)])]
    with pytest.raises(ValueError, match="counter-clockwise"):
        spatial.point_in_convex_polygon_join(pts, cw)


def test_polygon_join_rejects_concave(spark):
    import pytest

    pts = _points(spark, [(1, 1)])
    concave = [(4, [(0, 0), (10, 0), (5, 3), (10, 10), (0, 10)])]
    with pytest.raises(ValueError, match="concave"):
        spatial.point_in_convex_polygon_join(pts, concave)


# ---------------------------------------------------------------------------
# knn_within_radius
# ---------------------------------------------------------------------------


def test_knn_within_radius_bruteforce_parity(spark):
    import random

    from trafficbigdatasearch_spark.operators import spatial

    rnd = random.Random(5)
    pts = [(i, rnd.randrange(0, 60), rnd.randrange(0, 60)) for i in range(40)]
    df = spark.createDataFrame(pts, "id: bigint, x: bigint, y: bigint")
    k, radius = 3, 12
    got = {}
    for r in spatial.knn_within_radius(df, "id", "x", "y", radius, k).collect():
        got.setdefault(r["id"], []).append(
            (r["rank"], r["neighbor_id"], r["dist2"])
        )
    for i, xi, yi in pts:
        cands = sorted(
            (
                ((xi - xj) ** 2 + (yi - yj) ** 2, j)
                for j, xj, yj in pts
                if j != i and (xi - xj) ** 2 + (yi - yj) ** 2 <= radius * radius
            )
        )[:k]
        expect = [(rk + 1, j, d2) for rk, (d2, j) in enumerate(cands)]
        assert sorted(got.get(i, [])) == expect, (i, got.get(i), expect)


def test_knn_isolated_point_absent_and_rank_contract(spark):
    from trafficbigdatasearch_spark.operators import spatial

    # cluster of 3 mutually-near points + one far isolate
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 0), (3, 0, 1), (9, 500, 500)],
        "id: bigint, x: bigint, y: bigint",
    )
    out = spatial.knn_within_radius(df, "id", "x", "y", radius=5, k=5).collect()
    ids = {r["id"] for r in out}
    assert 9 not in ids and ids == {1, 2, 3}
    # fewer than k neighbors -> return what exists, ranks dense from 1
    for i in (1, 2, 3):
        ranks = sorted(r["rank"] for r in out if r["id"] == i)
        assert ranks == [1, 2]
