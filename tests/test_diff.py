"""Snapshot diff / reconciliation (operators/diff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


@pytest.fixture(scope="module")
def snaps(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 30.0), (4, None, 4.0), (5, "w", 5.0)])
    return old, new


def test_statuses_exact_mode(spark, snaps):
    old, new = snaps
    got = {
        r.k: r.diff_status
        for r in diff.snapshot_diff(old, new, ["k"], fingerprint=False).collect()
    }
    # k=1 removed, k=5 added, k=3 changed; 2 and 4 unchanged (dropped)
    assert got == {1: "removed", 5: "added", 3: "changed"}


def test_fingerprint_mode_agrees(spark, snaps):
    old, new = snaps
    exact = diff.snapshot_diff(old, new, ["k"], fingerprint=False, keep_unchanged=True)
    fp = diff.snapshot_diff(old, new, ["k"], fingerprint=True, keep_unchanged=True)
    assert sorted((r.k, r.diff_status) for r in exact.collect()) == sorted(
        (r.k, r.diff_status) for r in fp.collect()
    )


def test_null_equals_null_is_unchanged(spark, snaps):
    # k=4 has NULL 'a' on both sides: null-safe compare must NOT call it
    # changed (a plain != would yield NULL -> 'unchanged' by accident of
    # when(); eqNullSafe makes it principled)
    old, new = snaps
    rows = diff.snapshot_diff(
        old, new, ["k"], fingerprint=False, keep_unchanged=True
    ).collect()
    assert {r.diff_status for r in rows if r.k == 4} == {"unchanged"}


def test_compare_cols_subset(spark, snaps):
    old, new = snaps
    # comparing only 'a' means k=3's b-change is invisible
    got = {
        r.k: r.diff_status
        for r in diff.snapshot_diff(
            old, new, ["k"], compare_cols=["a"], fingerprint=False
        ).collect()
    }
    assert 3 not in got
    assert got == {1: "removed", 5: "added"}


def test_missing_compare_col_raises(spark, snaps):
    old, new = snaps
    with pytest.raises(ValueError, match="absent"):
        diff.snapshot_diff(old.drop("b"), new, ["k"], compare_cols=["b"])


def test_summary_rollup(spark, snaps):
    old, new = snaps
    s = diff.diff_summary(
        diff.snapshot_diff(old, new, ["k"], fingerprint=True, keep_unchanged=True)
    )
    assert {(r.diff_status, r.n) for r in s.collect()} == {
        ("added", 1), ("removed", 1), ("changed", 1), ("unchanged", 2),
    }


# ---------------------------------------------------------------------------
# merge_upsert (CDC apply)
# ---------------------------------------------------------------------------


def _merge_fixture(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, val double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),   # update
            (3, None, None, "D"),   # delete (non-key cols may be NULL)
            (4, "d", 40.0, "I"),    # insert
        ],
        "k bigint, name string, val double, op string",
    )
    return snap, changes


def test_merge_upsert_applies_ops(spark):
    from trafficbigdatasearch_spark.operators import diff as D

    snap, changes = _merge_fixture(spark)
    got = sorted(map(tuple, D.merge_upsert(snap, changes, ["k"]).collect()))
    assert got == [(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)]


def test_merge_upsert_idempotent(spark):
    from trafficbigdatasearch_spark.operators import diff as D

    snap, changes = _merge_fixture(spark)
    once = D.merge_upsert(snap, changes, ["k"])
    twice = D.merge_upsert(once, changes, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_upsert_diff_roundtrip(spark):
    """snapshot_diff(snap, merged) must report exactly the changeset's ops."""
    from trafficbigdatasearch_spark.operators import diff as D

    snap, changes = _merge_fixture(spark)
    merged = D.merge_upsert(snap, changes, ["k"])
    d = {r["k"]: r["diff_status"] for r in
         D.snapshot_diff(snap, merged, ["k"], fingerprint=False).collect()}
    assert d == {2: "changed", 3: "removed", 4: "added"}


def test_merge_upsert_validates_columns(spark):
    import pytest

    from trafficbigdatasearch_spark.operators import diff as D

    snap, changes = _merge_fixture(spark)
    with pytest.raises(ValueError):
        D.merge_upsert(snap, changes.drop("val"), ["k"])
    with pytest.raises(ValueError):
        D.merge_upsert(snap, changes.drop("op"), ["k"])


def test_diff_to_changeset_reconstructs_new(spark):
    """The diff/merge algebra closes: a changeset derived from
    snapshot_diff(old, new) applied to old must reproduce new exactly —
    the CDC pipeline's end-to-end invariant (capture -> apply)."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import diff as D

    old = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # synthesize a "new" snapshot: drop %11 keys, bump %7 prices, add keys
    new = (
        old.filter(F.col("o_orderkey") % 11 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 5.0
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            old.limit(50).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    d = D.snapshot_diff(old, new, ["o_orderkey"], fingerprint=False)
    ops = d.withColumn(
        "op",
        F.when(F.col("diff_status") == "removed", "D")
        .when(F.col("diff_status") == "added", "I")
        .otherwise("U"),
    ).select("o_orderkey", "op")
    changes = ops.join(new, "o_orderkey", "left").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "op"
    )
    rebuilt = D.merge_upsert(old, changes, ["o_orderkey"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_merge_upsert_null_op_is_upsert(spark):
    """A NULL op must act as an upsert per the "any op other than 'D'"
    contract — not silently delete the key (plain != evaluates NULL and
    drops the row from `applied` while the anti join still removes the
    snapshot row; ADVICE r5)."""
    from trafficbigdatasearch_spark.operators import diff as D

    snap = spark.createDataFrame(
        [(1, "a", 10.0)], "k bigint, name string, val double"
    )
    changes = spark.createDataFrame(
        [(1, "a2", 11.0, None)], "k bigint, name string, val double, op string"
    )
    got = sorted(map(tuple, D.merge_upsert(snap, changes, ["k"]).collect()))
    assert got == [(1, "a2", 11.0)]
