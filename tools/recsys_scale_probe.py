#!/usr/bin/env python
"""Scale probe for the recsys co-occurrence hot-user cap (verdict r7 #1/#6).

The co-occurrence self-join fans out quadratically in each user's distinct
item count: a single crawler-grade user contributes C(n_items, 2) pairs
through ONE shuffle key — skew no per-pair pruning (min_co) can prevent,
because min_co cuts AFTER the explosion.  ``cap_hot_users`` drops
over-cap users BEFORE the join (the jaccard_link_prediction max_degree
contract).

This probe measures all four corners over the real events tables:

  1. baseline co-occurrence at sf0.01 and sf0.1  (the natural decade —
     is the operator's growth sublinear in rows without adversarial skew?)
  2. sf0.1 + ONE synthetic hot user holding ``hot_items`` distinct items
     (uncapped)  — the skew bomb, measured
  3. the same poisoned matrix with max_user_items=64  — the guard,
     measured; should land back at the clean-sf0.1 cost while every
     surviving co-count stays EXACT (whole-user drop)

Results recorded in SCALING.md.  Usage:
    python tools/recsys_scale_probe.py [hot_items] [cap]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import recsys
from trafficbigdatasearch_spark.session import build_spark

# cap default 100: real sf0.1 users hold up to 67 distinct items, so the
# cap must clear them for the capped==clean assertion to isolate the
# synthetic hot user (64 was measured unsafe — it capped real users)
HOT_ITEMS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def _ui(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return recsys.user_item(ev)


def _poison(spark, ui, n_items: int):
    """Append one synthetic user (-1) interacting with ``n_items`` distinct
    items — C(n_items, 2) pairs through a single user_id shuffle key."""
    hot = spark.range(n_items).select(
        F.lit(-1).cast("bigint").alias("user_id"),
        F.col("id").cast("bigint").alias("item_id"),
    )
    return ui.unionByName(hot)


def _run(label, ui, results, **kw):
    t0 = time.perf_counter()
    n = recsys.item_cooccurrence(ui, min_co=2, **kw).count()
    dt = round(time.perf_counter() - t0, 3)
    results[label] = {"sec": dt, "pairs": n}
    print(f"{label:34s} {dt:8.3f}s  pairs={n}", flush=True)


def main() -> None:
    spark = build_spark(app_name="tbds-recsys-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    ui001 = _ui(spark, "/root/testdata/sf0.01").localCheckpoint()
    ui01 = _ui(spark, "/root/testdata/sf0.1").localCheckpoint()
    _run("warmup(sf0.01)", ui001, {})
    _run("co_sf0.01", ui001, results)
    _run("co_sf0.1", ui01, results)

    poisoned = _poison(spark, ui01, HOT_ITEMS).localCheckpoint()
    _run(f"co_sf0.1+hot{HOT_ITEMS}_uncapped", poisoned, results)
    _run(f"co_sf0.1+hot{HOT_ITEMS}_cap{CAP}", poisoned, results,
         max_user_items=CAP)

    # the guard's correctness side: capped-poisoned == clean (the hot user
    # is the ONLY over-cap user; every clean-table user stays intact)
    clean = {
        (r["item_a"], r["item_b"]): r["n_co"]
        for r in recsys.item_cooccurrence(ui01, min_co=2).collect()
    }
    capped = {
        (r["item_a"], r["item_b"]): r["n_co"]
        for r in recsys.item_cooccurrence(
            poisoned, min_co=2, max_user_items=CAP
        ).collect()
    }
    assert capped == clean, "cap must drop ONLY the synthetic hot user"
    results["capped_equals_clean"] = True

    print(json.dumps({"hot_items": HOT_ITEMS, "cap": CAP, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
