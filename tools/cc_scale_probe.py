#!/usr/bin/env python
"""Scale probe for the connected-components fixpoint constant factor.

VERDICT r3/r4 watch item: at sf0.1 the CC loop's wall time barely moved
(-4%/-8%) after the algorithmic cuts (small-star pre-pass, carried-count
convergence), suggesting the cost is per-round JOB SCHEDULING, not data.
This probe settles it empirically: run the exact dedup_clusters chain
(minhash LSH pairs -> alternating-star CC) over the sf0.1 documents table
replicated 1x / 2x / 4x (doc_ids offset per replica so clusters replicate
rather than merge) and report wall time per scale.

If the loop overhead is a scale-independent constant, time should grow
markedly SUB-linearly (4x data << 4x time) — i.e. the constant amortizes
with volume and is the right trade at 100 TB.  Results are recorded in
SCALING.md.

Usage: python tools/cc_scale_probe.py [sf_dir] [replicas ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import dedup, graph
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
_MINHASH_K = 16


#: Per-replica letter substitution: a bijective translate() preserves
#: shingle-set EQUALITY within a replica (intra-replica pair structure =
#: the 1x structure) while making cross-replica shingles disjoint (no
#: spurious replica-to-replica merges — plain copies are exact dups and
#: would weld all replicas into one giant component, changing the
#: workload's shape instead of its volume).
_SUBS = ["e", "q", "j", "x", "z", "w", "v", "k"]


def replicate(docs, n: int, offset: int):
    """n structure-preserving copies with disjoint id spaces: CC's
    per-round data volume scales n-fold while cluster structure and round
    COUNT stay fixed — isolating the loop's scheduling constant."""
    reps = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            F.translate(F.col("text"), "e", _SUBS[i]).alias("text"),
        )
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.union(r)
    return out


def main() -> None:
    spark = build_spark(app_name="cc-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    offset = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    def run_chain(d):
        pairs = dedup.minhash_lsh_pairs(d, k=_MINHASH_K, bands=4, n=3)
        return graph.connected_components(pairs).count()

    # warmup: pay whole-stage codegen + JIT once, outside the timings
    run_chain(docs)

    results = {}
    for n in REPLICAS:
        d = replicate(docs, n, offset).localCheckpoint()  # exclude gen cost
        n_docs = d.count()
        timings, n_labeled = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            n_labeled = run_chain(d)
            timings.append(round(time.perf_counter() - t0, 3))
        results[f"{n}x"] = {
            "docs": n_docs,
            "labeled": n_labeled,
            "sec": min(timings),
        }
        print(json.dumps({n: results[f"{n}x"]}), flush=True)
    base = results[f"{REPLICAS[0]}x"]["sec"]
    for n in REPLICAS:
        r = results[f"{n}x"]
        r["time_ratio_vs_1x"] = round(r["sec"] / base, 2)
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
