#!/usr/bin/env python
"""Measure the bloom prefilter's shuffle reduction at several key-set
selectivities.

For each selectivity (fraction of suppliers in the key set), compares the
plain shuffle semi join against ``bloom_semi_join`` on lineitem at
``$SPARK_GRAFT_SF_DIR`` with auto-broadcast off (forcing the shuffle the
bloom is meant to shrink): rows entering the join exchange (= rows passing
the prefilter, vs the full table for the plain join), result equality, and
wall time (min of 2 warm runs).  Evidence artifact for the SCALING.md bloom
row: the prefilter's benefit is proportional to (1 - selectivity) of the
large side's shuffle volume, while the bitmap build cost is a constant
two-job overhead — the crossover favors bloom as data volume grows.

Usage: ``python tools/bloom_probe.py`` (one JSON line per selectivity).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import joins as J
from trafficbigdatasearch_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn, runs: int = 2) -> float:
    fn()  # warm: codegen + JIT
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = build_spark(app_name="tbds-bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    su = load_table(spark, SF_DIR, "supplier")
    n_li = li.count()
    for mod in (50, 10, 2):
        keys = su.filter(F.col("s_suppkey") % mod == 0).select(
            F.col("s_suppkey").alias("l_suppkey")
        )
        plain = li.join(keys.distinct(), "l_suppkey", "left_semi")
        bloomed = J.bloom_semi_join(li, keys, "l_suppkey")
        n_match = plain.count()
        words = J.bloom_bitmap(keys.distinct(), "l_suppkey", 1 << 20, 3)
        n_prefiltered = J.bloom_prefilter(li, "l_suppkey", words).count()
        assert bloomed.count() == n_match
        t_plain = _timed(lambda: plain.write.format("noop").mode("overwrite").save())
        t_bloom = _timed(lambda: bloomed.write.format("noop").mode("overwrite").save())
        print(json.dumps({
            "selectivity": round(n_match / n_li, 4),
            "rows_total": n_li,
            "rows_into_exchange_plain": n_li,
            "rows_into_exchange_bloom": n_prefiltered,
            "shuffle_reduction": round(1 - n_prefiltered / n_li, 4),
            "t_plain_s": t_plain,
            "t_bloom_s": t_bloom,
        }))

    # --- FK-audit anti edge (quality_referential's lineitem→orders path) --
    # Child pre-aggregated to (key, cnt); orphan rate synthesized by
    # DROPPING a fraction of orders keys from the parent set.  Measures the
    # rows each lane moves: pre-agg shrinks the child exchange from row
    # count to distinct-key count, and the bloom bypass removes
    # definite-orphan keys from the anti join's probe input.
    orders = load_table(spark, SF_DIR, "orders")
    li_ok = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    counts = li_ok.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_cnt"))
    n_rows = li_ok.count()
    n_keys = counts.count()
    for drop_mod in (0, 20, 4):  # 0 = clean FK, then 5 % / 25 % orphan keys
        parent = orders.select(F.col("o_orderkey").alias("l_orderkey"))
        if drop_mod:
            parent = parent.filter(F.col("l_orderkey") % drop_mod != 0)
        words = J.bloom_bitmap(parent.distinct(), "l_orderkey", 1 << 20, 3)
        candidates = J.bloom_prefilter(counts, "l_orderkey", words).count()
        plain_viol = (
            li_ok.join(parent, "l_orderkey", "left_anti").count()
        )
        bloom_viol = (
            J.bloom_anti_join(counts, parent, "l_orderkey", words=words)
            .agg(F.coalesce(F.sum("_cnt"), F.lit(0)).alias("v"))
            .first()["v"]
        )
        assert bloom_viol == plain_viol, (bloom_viol, plain_viol)
        print(json.dumps({
            "fk_edge": "lineitem_orders",
            "orphan_key_fraction": round(1 / drop_mod, 4) if drop_mod else 0.0,
            "rows_into_exchange_rowlevel": n_rows,
            "rows_into_exchange_preagg": n_keys,
            "keys_into_anti_probe_bloom": candidates,
            "violations": plain_viol,
        }))


if __name__ == "__main__":
    main()
