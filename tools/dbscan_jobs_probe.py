#!/usr/bin/env python
"""Job-count breakdown for pipeline_dbscan (VERDICT r10 #5, option (a)).

Runs the registered pipeline_dbscan query at the given SF with the Spark
event log enabled, then parses the log into a per-phase job ledger: how
many jobs the run launches, which are the CC fixpoint's convergence
counts, and what each phase costs — the evidence that the 32 s headline
number is convergence-round count (algorithmic, bounded O(log^2 n)), not
a bad plan re-scanning data.

Usage: python tools/dbscan_jobs_probe.py [sf_dir] [query_name]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERY = sys.argv[2] if len(sys.argv) > 2 else "pipeline_dbscan"


def main() -> None:
    from pyspark.sql import SparkSession

    log_dir = tempfile.mkdtemp(prefix="dbscan_evlog_")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.enabled", "false")
        .appName("dbscan-jobs-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from trafficbigdatasearch_spark.queries import standard

    q = standard.queries()[QUERY]
    t0 = time.perf_counter()
    n = q(spark, SF_DIR).count()
    wall = time.perf_counter() - t0
    spark.stop()

    jobs = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):  # v2 logs are directories
        paths += [os.path.join(root, f) for f in files if "appstatus" not in f]
    for path in paths:
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                infos = ev.get("Stage Infos", [])
                names = {i.get("Stage Name", "").split(" at ")[-1] for i in infos}
                jobs.append(
                    {
                        "job": ev["Job ID"],
                        "t": ev["Submission Time"],
                        "stages": len(ev.get("Stage IDs", [])),
                        "callsite": ev.get("Properties", {}).get(
                            "callSite.short", ""
                        ) or ",".join(sorted(names)),
                    }
                )
            elif ev.get("Event") == "SparkListenerJobEnd":
                for j in jobs:
                    if j["job"] == ev["Job ID"]:
                        j["sec"] = round(
                            (ev["Completion Time"] - j["t"]) / 1000.0, 3
                        )
    jobs.sort(key=lambda j: j["job"])
    print(f"\n{QUERY} @ {SF_DIR}: {n} rows, {wall:.1f}s wall, {len(jobs)} jobs")
    by_site: dict[str, list] = {}
    for j in jobs:
        by_site.setdefault(j["callsite"] or "?", []).append(j)
    for site, js in sorted(by_site.items(), key=lambda kv: -sum(x.get("sec", 0) for x in kv[1])):
        tot = sum(x.get("sec", 0) for x in js)
        print(f"  {len(js):3d} jobs  {tot:7.2f}s  {site}")
    print("\nper-job ledger:")
    for j in jobs:
        print(f"  job {j['job']:3d}  {j.get('sec', float('nan')):7.3f}s  "
              f"{j['stages']:2d} stages  {j['callsite']}")


if __name__ == "__main__":
    main()
