"""Capstone integration: corpus -> curated, split, packed, sized training
export — every stage is an independently oracle-verified operator; this test
pins that the COMPOSITION holds end-to-end (the product surface a training
team actually runs), including reproducibility and the zero-extra-pass
export metrics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.operators import packing, sampling
from trafficbigdatasearch_spark.pipeline import CorpusPipeline
from trafficbigdatasearch_spark.sources.parquet import write_sized

SF = "/root/testdata/sf0.001"


def _export(spark, out_dir: str):
    docs = load_table(spark, SF, "documents")
    curated = (
        CorpusPipeline(docs)
        .quality_gate(min_tokens=5)
        .dedup_exact()
        .dedup_near()
        .docs()
    )
    split = sampling.hash_split(curated, "doc_id", {"train": 0.9, "holdout": 0.1})
    train = split.filter(F.col("split") == "train").drop("split")
    packs = packing.pack_sequences(train, budget=512)
    export = train.join(packs.select("doc_id", "pack_id", "pack_offset"), "doc_id")
    from pyspark.sql import Observation

    obs = Observation("export")
    # observe() forbids distinct aggregates — max works because pack ids
    # are a dense 0..N sequence from the prefix sum
    observed = export.observe(
        obs,
        F.count("*").alias("n_docs"),
        (F.max("pack_id") + 1).alias("n_packs"),
    )
    write_sized(observed, out_dir, rows_per_file=200, range_by=["pack_id"])
    return export, obs.get


def test_export_composition_and_reproducibility(spark, tmp_path):
    out1 = str(tmp_path / "run1")
    export, metrics = _export(spark, out1)

    back = spark.read.parquet(out1)
    n_docs = back.count()
    assert n_docs > 0 and metrics["n_docs"] == n_docs
    assert metrics["n_packs"] == back.select("pack_id").distinct().count()

    # curation really happened: no exact-duplicate texts survive
    assert back.groupBy("text").count().filter(F.col("count") > 1).isEmpty()

    # packing invariant: offsets stay inside the budget
    assert back.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512)
    ).isEmpty()

    # deterministic end-to-end: a second run writes the identical export
    out2 = str(tmp_path / "run2")
    _export(spark, out2)
    a = sorted(map(tuple, back.select("doc_id", "pack_id", "pack_offset").collect()))
    b = sorted(
        map(
            tuple,
            spark.read.parquet(out2)
            .select("doc_id", "pack_id", "pack_offset")
            .collect(),
        )
    )
    assert a == b

    # sized writer honored the file budget (multiple bounded files)
    files = [f for f in os.listdir(out1) if f.endswith(".parquet")]
    assert files, "no parquet files written"


def test_export_split_is_disjoint_and_total(spark):
    docs = load_table(spark, SF, "documents")
    split = sampling.hash_split(docs, "doc_id", {"train": 0.9, "holdout": 0.1})
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "holdout"}
