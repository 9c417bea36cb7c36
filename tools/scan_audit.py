#!/usr/bin/env python
"""Scan-hygiene audit: for every registered (batch) query, count how many
times the executed plan scans each source table and how many exchanges are
reused.  Flags queries whose plan scans one table >= THRESHOLD times with
zero reuse — the multi-consumer-recompute smell that cost recsys and the
prefix join extra full passes before their localCheckpoint fixes.

A flagged row is a LEAD, not a verdict: disjoint-slice scans (incremental
partials), logical-snapshot scans (diff/refresh demos), and the inline ANN
read paths (whose persisted-index siblings exist precisely to amortize
repeated reads) are by-design — triage recorded in SCALING.md.

Usage: ``python tools/scan_audit.py [sf_dir] [threshold]``.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trafficbigdatasearch_spark.queries import standard
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
THRESHOLD = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = build_spark(app_name="tbds-scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in standard.queries().items():
        if name.startswith("stream_"):  # streaming drains launch real jobs
            continue
        try:
            plan = (
                fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as e:  # noqa: BLE001 - audit must survive one bad row
            print(f"ERR   {name}: {str(e)[:100]}")
            continue
        counts = Counter(re.findall(r"file:[^\]]*?/(\w+)\.parquet", plan))
        worst = max(counts.values()) if counts else 0
        reused = plan.count("ReusedExchange")
        if worst >= THRESHOLD and reused == 0:
            rows.append((worst, name, dict(counts)))
    rows.sort(reverse=True)
    for worst, name, counts in rows:
        print(f"{worst}x  {name}  {counts}")
    print(f"{len(rows)} queries at >= {THRESHOLD} same-table scans, 0 reuse")
    spark.stop()


if __name__ == "__main__":
    main()
