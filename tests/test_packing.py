"""Sequence-packing invariants + the distributed-prefix-sum plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import packing

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bucket_size_invariance(spark):
    """pack assignment must not depend on the shuffle-granularity knob."""
    a = sorted(map(tuple, packing.pack_sequences(_docs(spark), 512, bucket_size=7).collect()))
    b = sorted(map(tuple, packing.pack_sequences(_docs(spark), 512, bucket_size=4096).collect()))
    assert a == b


def test_tape_semantics(spark):
    """Offsets reconstruct the exact token tape: sorted by doc_id, each
    doc's global start = previous start + previous n_tokens; pack_id/offset
    are that position div/mod the budget."""
    rows = sorted(
        packing.pack_sequences(_docs(spark), 512).collect(), key=lambda r: r["doc_id"]
    )
    pos = 0
    for r in rows:
        assert r["pack_id"] == pos // 512
        assert r["pack_offset"] == pos % 512
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in rows)


def test_precomputed_token_col(spark):
    d = _docs(spark).withColumn("ntok", F.lit(10))
    rows = sorted(
        packing.pack_sequences(d, 25, token_col="ntok").collect(),
        key=lambda r: r["doc_id"],
    )
    # 10-token docs on a 25 budget: offsets cycle 0,10,20,5,15,...
    assert [r["pack_offset"] for r in rows[:5]] == [0, 10, 20, 5, 15]


def test_no_global_single_partition_window(spark):
    """The corpus-side window must be partitioned (by bucket); only the
    bucket SUMMARY may see a global ordering."""
    df = packing.pack_sequences(_docs(spark), 2048, bucket_size=256)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every Window over the full doc set must carry a partition spec
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert windows, plan
    # one window is over the summary (global order on _b), the corpus
    # window must be partitioned by _b: check a partitionBy exists
    assert any("_b" in w for w in windows), plan
