#!/usr/bin/env python
"""Per-stage decomposition of registered queries from the Spark event log.

For each named query: run it against the noop sink (cold + warm) on a
fresh build_spark session with event logging on, then parse the event log
into a per-stage ledger — wall, task time, shuffle read/write bytes,
input bytes, task count, and the first line of the stage's callsite — the
optimization-guide §1 evidence (where the time actually goes) without a
live UI.

Usage: python tools/stage_profile.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = "/root/testdata/sf0.1"
if "--sf" in sys.argv:
    SF_DIR = sys.argv[sys.argv.index("--sf") + 1]
    if SF_DIR in args:
        args.remove(SF_DIR)
QUERIES = args


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def profile(query: str) -> None:
    from trafficbigdatasearch_spark.queries import standard
    from trafficbigdatasearch_spark.session import build_spark

    log_dir = tempfile.mkdtemp(prefix=f"stageprof_{query}_")
    spark = build_spark(
        app_name=f"stage-profile-{query}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = standard.queries()[query]
    t0 = time.perf_counter()
    _noop(q(spark, SF_DIR))
    cold = time.perf_counter() - t0
    # mark the warm run's first job id so the ledger reports steady state
    # single-slice marker: a wide parallelize would spawn one Python worker
    # per core (~1.2 s CPU each) and pollute the ledger with a fake hot stage
    marker = spark.sparkContext.parallelize([0], 1).count()  # noqa: F841
    t0 = time.perf_counter()
    _noop(q(spark, SF_DIR))
    warm = time.perf_counter() - t0
    spark.stop()

    def _blank() -> dict:
        return {"name": "", "wall_ms": None, "tasks": None, "callsite": "",
                "task_ms": 0, "sh_read": 0, "sh_write": 0, "input": 0,
                "spill": 0}

    stages: dict[int, dict] = {}
    jobs: list[dict] = []
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
                if k == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    st = stages.setdefault(sid, _blank())
                    st["name"] = si.get("Name", "")[:60]
                    st["wall_ms"] = (comp - sub) if sub and comp else None
                    st["tasks"] = si.get("Number of Tasks")
                    st["callsite"] = (si.get("Details") or "").split("\n")[0][:100]
                elif k == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    st = stages.get(sid)
                    tm = ev.get("Task Metrics") or {}
                    if st is None:
                        # TaskEnd can precede StageCompleted in the log
                        st = stages.setdefault(sid, _blank())
                    st["task_ms"] += tm.get("Executor Run Time", 0)
                    srm = tm.get("Shuffle Read Metrics") or {}
                    st["sh_read"] += srm.get("Local Bytes Read", 0) + srm.get(
                        "Remote Bytes Read", 0
                    )
                    swm = tm.get("Shuffle Write Metrics") or {}
                    st["sh_write"] += swm.get("Shuffle Bytes Written", 0)
                    im = tm.get("Input Metrics") or {}
                    st["input"] += im.get("Bytes Read", 0)
                    st["spill"] += tm.get("Disk Bytes Spilled", 0)
                elif k == "SparkListenerJobStart":
                    jobs.append(
                        {
                            "job": ev["Job ID"],
                            "stages": ev.get("Stage IDs", []),
                            "t0": ev.get("Submission Time"),
                        }
                    )
                elif k == "SparkListenerJobEnd":
                    for j in jobs:
                        if j["job"] == ev["Job ID"]:
                            j["wall_ms"] = ev.get("Completion Time", 0) - j["t0"]

    print(f"\n=== {query}  cold={cold:.2f}s warm={warm:.2f}s  "
          f"jobs={len(jobs)} stages={len(stages)} ===")
    for j in jobs:
        sids = [s for s in j["stages"] if s in stages]
        tot_task = sum(stages[s]["task_ms"] for s in sids)
        print(f"job {j['job']:>3}  wall={j.get('wall_ms', 0):>6} ms  "
              f"task={tot_task:>7} ms  stages={j['stages']}")
    top = sorted(stages.items(), key=lambda kv: -(kv[1]["task_ms"]))[:14]
    for sid, st in top:
        print(
            f"  stage {sid:>3} task={st['task_ms']:>7}ms wall={st['wall_ms']}ms "
            f"n={st['tasks']} in={st['input']>>10}K shR={st['sh_read']>>10}K "
            f"shW={st['sh_write']>>10}K spill={st['spill']>>10}K {st['name']} | {st['callsite']}"
        )


def main() -> None:
    for q in QUERIES:
        profile(q)


if __name__ == "__main__":
    main()
