#!/usr/bin/env python
"""Scale probe for incremental connected-components maintenance (r9).

Claim under test (operators/graph.py::incremental_components): folding a
small new-edge batch into a standing labeling costs work bounded by the
BATCH, not the corpus — the corpus-sized label table is scanned twice and
shuffled never, and the merge fixpoint runs on the label graph (bounded by
the batch).  If that holds, increment wall-time should stay roughly flat
as the base graph grows while full re-clustering grows with it.

Probe: deterministic scatter graphs at three base sizes; for each,
  1. full CC over base+batch          (the re-cluster-everything baseline)
  2. CC over base, then increment     (the maintenance path; labels
                                       pre-materialized so the increment
                                       pays only its own work)
with a fixed 1000-edge batch, asserting label equality at the smallest
size (the equality is proved in tests; here it guards the probe itself).

Emits one JSON line; recorded in SCALING.md.  Usage:
    python tools/inc_cc_probe.py [batch_edges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main() -> None:
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import graph as G
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"probe": "incremental_cc", "batch_edges": BATCH, "sizes": []}

    for n_nodes in (100_000, 400_000, 1_600_000):
        ids = spark.range(n_nodes)
        base = ids.select(
            F.col("id").alias("id_a"),
            ((F.col("id") * 131 + 7) % n_nodes).alias("id_b"),
        ).filter(F.col("id_a") != F.col("id_b"))
        batch = (
            spark.range(BATCH)
            .select(
                ((F.col("id") * 9973) % n_nodes).alias("id_a"),
                ((F.col("id") * 31337 + 11) % n_nodes).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )

        t0 = time.time()
        full = G.connected_components(base.unionByName(batch))
        n_full = full.count()
        dt_full = time.time() - t0

        # standing labels: built once, materialized — the steady state a
        # production pipeline maintains; the increment must not pay for it
        labels = G.connected_components(base).localCheckpoint()
        labels.count()
        t0 = time.time()
        inc = G.incremental_components(labels, batch)
        n_inc = inc.count()
        dt_inc = time.time() - t0

        row = {
            "n_nodes": n_nodes,
            "full_cc_sec": round(dt_full, 2),
            "increment_sec": round(dt_inc, 2),
            "speedup": round(dt_full / max(dt_inc, 1e-9), 2),
            "n_full": n_full,
            "n_inc": n_inc,
        }
        if n_nodes == 100_000:
            a = sorted(map(tuple, full.collect()))
            b = sorted(map(tuple, inc.collect()))
            row["labels_identical"] = a == b
            assert a == b, "increment diverged from full CC"
        out["sizes"].append(row)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
