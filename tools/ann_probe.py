#!/usr/bin/env python
"""ANN recall/latency grid: measure IVFADC's two knobs (nprobe = candidate
coverage, m = code resolution) against the exact brute-force baseline —
the "measure, don't guess" evidence behind sim_ivf_adc_topk's docstring
claim that the knobs trade independently.

Usage: ``python tools/ann_probe.py [sf_dir]`` (default sf0.1).  Prints one
line per (nprobe, m) cell: warm wall time (min of 2) and mean recall@10
over the 20-query probe batch, plus the exact baseline's time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import evalrank, similarity
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _timed(fn):
    _force(fn())  # warm: codegen + JIT
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _force(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = build_spark(app_name="tbds-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qs = emb.filter(F.col("vec_id") < 20)

    exact = similarity.brute_force_topk(emb, qs, k=K).localCheckpoint()
    t_exact = _timed(lambda: similarity.brute_force_topk(emb, qs, k=K))
    n_corpus = emb.count()
    print(f"corpus={n_corpus} queries=20 k={K} exact_time={t_exact:.3f}s")

    for nprobe in (1, 2, 4):
        for m in (4, 8, 16):
            fn = lambda: similarity.ivf_adc_topk(  # noqa: E731
                emb, qs, k=K, nprobe=nprobe, m=m
            )
            t = _timed(fn)
            rows = evalrank.topk_overlap(fn(), exact, k=K).collect()
            rec = sum(r["recall"] for r in rows) / len(rows)
            print(
                f"nprobe={nprobe} m={m:2d}  time={t:.3f}s  "
                f"recall@{K}={rec:.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
