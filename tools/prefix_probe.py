#!/usr/bin/env python
"""Measure prefix filtering's candidate-volume reduction and wall time vs
the plain inverted-index Jaccard join at several thresholds.

Evidence artifact for the SCALING.md prefix-join row: candidate pairs
(sum over posting lists of C(df, 2)) for the PLAIN index vs the
rarity-ordered PREFIX index, plus warm wall time of both operators and a
result-equality check.  On the synthetic corpus the plain operator stays
faster (tiny shingle vocabulary -> unselective prefixes; the docstring of
``dedup_jaccard_prefix`` records this honestly); the candidate-volume
column is the scale-relevant signal — it bounds the verify work on any
corpus, and on heavy-tailed real vocabularies it also bounds the
pair-generation explode that dominates there.

Usage: ``python tools/prefix_probe.py`` (one JSON line per threshold).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import dedup
from trafficbigdatasearch_spark.operators.dedup import (
    _rarity_prefix_rows,
    _shingle_exploded,
)
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 3


def _pairs(df):
    return (
        df.groupBy("shingle")
        .agg(F.count("*").alias("d"))
        .filter("d > 1")
        .select(F.sum(F.expr("d * (d - 1) / 2")).alias("c"))
        .first()["c"]
        or 0
    )


def _timed(fn) -> float:
    fn()
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = build_spark(app_name="tbds-prefix-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ex = _shingle_exploded(docs, "doc_id", "text", N)
    plain_cand = int(_pairs(ex.repartition(F.col("shingle"))))
    for t in (0.5, 0.8, 0.9):
        # the SHIPPED prefix construction — same helper the operator uses,
        # so this evidence cannot drift from the code it describes
        pre, _ = _rarity_prefix_rows(ex, t)
        pref_cand = int(_pairs(pre))
        t_plain = _timed(
            lambda: dedup.ngram_jaccard_pairs(
                docs, n=N, threshold=t, max_shingle_freq=None
            ).write.format("noop").mode("overwrite").save()
        )
        t_pref = _timed(
            lambda: dedup.ngram_jaccard_pairs_prefix(
                docs, n=N, threshold=t
            ).write.format("noop").mode("overwrite").save()
        )
        eq = sorted(
            map(
                tuple,
                dedup.ngram_jaccard_pairs(
                    docs, n=N, threshold=t, max_shingle_freq=None
                ).collect(),
            )
        ) == sorted(
            map(
                tuple,
                dedup.ngram_jaccard_pairs_prefix(
                    docs, n=N, threshold=t
                ).collect(),
            )
        )
        print(
            json.dumps(
                {
                    "threshold": t,
                    "candidates_plain": plain_cand,
                    "candidates_prefix": pref_cand,
                    "reduction": (
                        round(1 - pref_cand / plain_cand, 4)
                        if plain_cand
                        else None
                    ),
                    "t_plain_s": t_plain,
                    "t_prefix_s": t_pref,
                    "results_equal": eq,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
