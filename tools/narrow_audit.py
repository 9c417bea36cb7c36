#!/usr/bin/env python
"""Registry-wide narrow-stage audit: run every headline query once (noop
sink) in one event-logged session and flag stages that are both HOT
(task time above a threshold) and NARROW (tasks <= 2) — the
serialized-compute smell the r13 spread fixes target.  Stage -> query
attribution rides spark.job.description.

A flagged row is a LEAD: global sorts, driver-bounded collects and
genuinely tiny frames are narrow by design — triage before changing.

Usage: python tools/narrow_audit.py [sf_dir] [min_task_ms] [only,names]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MIN_TASK_MS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def main() -> None:
    from bench import HEADLINE
    from trafficbigdatasearch_spark.queries import standard
    from trafficbigdatasearch_spark.session import build_spark

    log_dir = tempfile.mkdtemp(prefix="narrow_audit_")
    spark = build_spark(
        app_name="narrow-audit",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = standard.queries()
    roster = [n for n in HEADLINE if n in qs and (ONLY is None or n in ONLY)]
    for name in roster:
        spark.sparkContext.setJobDescription(f"audit:{name}")
        try:
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERROR {name}: {type(e).__name__}: {e}"[:160], flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    job_query: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if "appstatus" in f:
                continue
            for line in open(os.path.join(root, f)):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    if desc.startswith("audit:"):
                        job_query[ev["Job ID"]] = desc[6:]
                        job_stages[ev["Job ID"]] = ev.get("Stage IDs", [])
                elif k == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    st = stages.setdefault(sid, {"task_ms": 0, "n": 0})
                    tm = ev.get("Task Metrics") or {}
                    st["task_ms"] += tm.get("Executor Run Time", 0)
                    st["n"] += 1

    per_query: dict[str, list] = {}
    for jid, q in job_query.items():
        for sid in job_stages.get(jid, []):
            st = stages.get(sid)
            if st and st["n"] <= 2 and st["task_ms"] >= MIN_TASK_MS:
                per_query.setdefault(q, []).append((sid, st["task_ms"], st["n"]))
    for q in roster:
        hits = per_query.get(q)
        if hits:
            detail = ", ".join(
                f"stage {s}: {ms} ms/n={n}" for s, ms, n in sorted(hits)
            )
            print(f"NARROW-HOT {q}: {detail}", flush=True)
    print(f"done: {len(per_query)}/{len(roster)} queries flagged")


if __name__ == "__main__":
    main()
