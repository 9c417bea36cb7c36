#!/usr/bin/env python
"""Scale probe for the curriculum-ordering export (r10).

Claim under test (sampling.curriculum_order): the global 0-based position
is computed by a TWO-LEVEL prefix construction (per-(phase, md5-prefix)
counts, cumsum over the tiny summary, within-bucket windows) — never a
global row_number, whose single ordered partition is the textbook
running-total scale-killer.  So the operator's wall-time should scale like
any partition-parallel aggregate, while the naive global-window
formulation concentrates the whole corpus into ONE task and degrades with
size.

Probe: synthetic variable-length docs at three sizes; for each,
  1. curriculum_order (the shipped two-level plan)
  2. the naive formulation: row_number() OVER (ORDER BY phase, md5, id)
     on the SAME phase assignment
plus a result-equality guard at the smallest size (positions identical row
for row; the same parity is test-pinned at tests/test_sampling.py).

Emits one JSON line; recorded in SCALING.md.  Usage:
    python tools/curriculum_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [200_000, 800_000, 3_200_000]


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.operators import ranks, sampling
    from trafficbigdatasearch_spark.session import build_spark

    spark = build_spark(app_name="curriculum-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"probe": "curriculum_order", "sizes": []}

    for n in SIZES:
        docs = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.repeat(F.lit("w "), (F.col("id") * 7 % 31 + 1).cast("int"))
                .alias("text"),
            )
        )
        docs.localCheckpoint()  # isolate generation cost from both timings

        t0 = time.perf_counter()
        two_level = sampling.curriculum_order(docs)
        two_level.agg(F.max("position"), F.count(F.lit(1))).collect()
        t_two = round(time.perf_counter() - t0, 2)

        # naive: identical phase assignment, global ordered window
        t0 = time.perf_counter()
        d = docs.select(
            "doc_id", F.length("text").cast("bigint").alias("n_chars")
        )
        b = ranks.global_quantile_buckets(d, "n_chars", n_buckets=10)
        naive = b.select(
            "doc_id",
            F.col("g_bucket").cast("bigint").alias("phase"),
            F.md5(F.col("doc_id").cast("string")).alias("_mh"),
        ).select(
            "doc_id",
            (
                F.row_number().over(
                    Window.orderBy("phase", "_mh", "doc_id")
                )
                - 1
            ).alias("position"),
        )
        naive.agg(F.max("position"), F.count(F.lit(1))).collect()
        t_naive = round(time.perf_counter() - t0, 2)

        row = {"n_docs": n, "two_level_s": t_two, "naive_global_s": t_naive}
        if n == SIZES[0]:
            a = {r["doc_id"]: r["position"] for r in two_level.collect()}
            bb = {r["doc_id"]: r["position"] for r in naive.collect()}
            assert a == bb, "two-level positions diverge from naive"
            row["equality_guard"] = "identical"
        out["sizes"].append(row)
        print(row, file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
