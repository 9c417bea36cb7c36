"""Snapshot diff / table reconciliation.

Not in the reference (its pipelines are read-only queries), but essential
operational surface for any engine feeding a 100 TB training-data store:
"what changed between yesterday's corpus snapshot and today's?" — the
question behind incremental re-processing, CDC validation, and
regression-testing a pipeline rewrite against the old output.

Design: ONE full-outer hash join on the key columns.  Two width modes:

- ``fingerprint=True`` (the at-scale default): each side collapses its
  compared columns to a single xxhash64 fingerprint BEFORE the shuffle, so
  the exchange carries (key, fp) — constant width no matter how wide the
  table.  Changed rows are detected by fingerprint inequality; the rare
  hash collision (2^-64 per changed row) would misreport a changed row as
  unchanged, which is the standard, documented trade.
- ``fingerprint=False``: compared columns are shuffled and compared with
  null-safe equality — exact, engine-portable semantics (this is what the
  registry's oracle-checked query uses, since xxhash64 seeds differ across
  engines).

Output: (key..., diff_status) with diff_status in
('added', 'removed', 'changed', 'unchanged'); ``keep_unchanged=False``
drops the (typically dominant) unchanged class before it ever leaves the
join, so the result is proportional to the churn, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    fingerprint: bool = True,
    keep_unchanged: bool = False,
) -> DataFrame:
    """Reconcile two snapshots of a keyed table.

    Returns one row per key present in either snapshot: the key columns
    plus ``diff_status``.  Keys must be unique per snapshot (enforce
    upstream; duplicate keys make "changed" ill-defined).
    """
    cmp_cols = compare_cols or [c for c in new.columns if c not in keys]
    missing = [c for c in cmp_cols if c not in old.columns]
    if missing:
        raise ValueError(f"compare columns {missing} absent from old snapshot")

    if fingerprint:
        o = old.select(*keys, F.xxhash64(*cmp_cols).alias("_fp_o"))
        n = new.select(*keys, F.xxhash64(*cmp_cols).alias("_fp_n"))
        changed = F.col("_fp_o") != F.col("_fp_n")
        drop = ["_fp_o", "_fp_n", "_in_o", "_in_n"]
    else:
        o = old.select(
            *keys, *[F.col(c).alias(f"_o_{c}") for c in cmp_cols]
        )
        n = new.select(
            *keys, *[F.col(c).alias(f"_n_{c}") for c in cmp_cols]
        )
        neq = [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in cmp_cols]
        changed = neq[0]
        for e in neq[1:]:
            changed = changed | e
        drop = (
            [f"_o_{c}" for c in cmp_cols]
            + [f"_n_{c}" for c in cmp_cols]
            + ["_in_o", "_in_n"]
        )

    o = o.withColumn("_in_o", F.lit(True))
    n = n.withColumn("_in_n", F.lit(True))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("diff_status", status).drop(*drop)
    if not keep_unchanged:
        out = out.filter(F.col("diff_status") != "unchanged")
    return out


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changeset to a keyed snapshot — the row-level MERGE
    primitive (Delta/Iceberg ``MERGE INTO`` semantics without a table
    format): upserts ('U'/'I' — any op other than 'D') replace-or-insert
    their key's row; 'D' removes it; untouched keys pass through.

    ONE anti join on the key (snapshot rows not in the changeset) + a
    union with the non-delete change rows — no full-outer compare, since
    MERGE doesn't need to know whether a value actually differed.  At
    100 TB the anti join is the cost; with a churn-sized changeset use the
    bloom-bypass anti join (operators/joins.py::bloom_anti_join) to route
    the untouched bulk around the exchange.  Compose with
    :func:`snapshot_diff` (validate what a changeset did) and
    ``incremental.apply_delta`` (maintain downstream aggregates from the
    same changeset).

    Keys must be unique per side; a key carrying multiple change ops is a
    caller error (which row wins is undefined).  ``changes`` must carry
    the snapshot's full column set plus ``op_col`` — delete rows may leave
    non-key columns NULL.  Applying the same changeset twice is
    idempotent (pinned in tests/test_diff.py).
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing the op column {op_col!r}")
    missing = [c for c in snapshot.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot columns {missing}")
    untouched = snapshot.join(changes.select(*keys), keys, "left_anti")
    # eqNullSafe: a NULL op must count as an upsert per the "any op other
    # than 'D'" contract.  Plain `op != 'D'` evaluates NULL for NULL ops,
    # which would drop the row from `applied` while its key still anti-joins
    # the snapshot row away — a silent delete.
    applied = changes.filter(~F.col(op_col).eqNullSafe("D")).select(
        *snapshot.columns
    )
    return untouched.unionByName(applied)


def diff_summary(diff: DataFrame) -> DataFrame:
    """(diff_status, n) rollup of a :func:`snapshot_diff` result — the
    one-line churn report a daily pipeline gate thresholds on."""
    return diff.groupBy("diff_status").agg(F.count("*").alias("n"))
