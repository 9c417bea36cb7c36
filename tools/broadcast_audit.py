#!/usr/bin/env python
"""Broadcast-direction audit: plan every registered query twice — at the
default autoBroadcastJoinThreshold and at a forced 1KB — and report the
queries whose SortMergeJoin count INCREASES when the threshold drops.

Why: a join that is broadcast at toy scale but sort-merge at 1KB is a join
AQE is rescuing — which is fine for legitimately data-sized sides (the
hint="auto" family is DESIGNED to do this), but a bug for operators whose
docstrings claim an explicitly-broadcast bounded artifact (codebooks, rate
tables, label maps).  The r9 incremental-CC finding was exactly this class:
a broadcast hint on the unusable side of a left join silently degraded to a
corpus shuffle past broadcast size.  A flagged row is a LEAD — triage
against the operator's documented scale posture.

Plan-building only (no execution): ~seconds per query on the driver.

Usage: ``python tools/broadcast_audit.py [sf_dir]``
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafficbigdatasearch_spark.queries import standard
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: Streaming drains execute on construction; plan-only audit skips them.
_SKIP_PREFIXES = ("stream_",)


def _smj_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"SortMergeJoin", plan))


def main() -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = standard.queries()
    default_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    rows = []
    for name, fn in qs.items():
        if name.startswith(_SKIP_PREFIXES):
            continue
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default_thr)
            base = _smj_count(fn(spark, SF_DIR))
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
            low = _smj_count(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            print(f"ERR  {name}: {type(e).__name__}: {e}"[:160])
            continue
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default_thr)
        if low > base:
            rows.append((low - base, name, base, low))
    for delta, name, base, low in sorted(rows, reverse=True):
        print(f"+{delta}  {name}  SMJ {base} -> {low} at 1KB threshold")
    print(f"{len(rows)} queries gain sort-merge joins when broadcasts are off")
    spark.stop()


if __name__ == "__main__":
    main()
