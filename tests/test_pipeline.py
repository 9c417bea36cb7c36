"""CorpusPipeline facade: composition must equal the independently
oracle-verified pipeline query, and stay deterministic."""

from __future__ import annotations

import os

import pytest

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.pipeline import CorpusPipeline
from trafficbigdatasearch_spark.queries import standard

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_chain_equals_pipeline_query(spark, docs):
    """quality_gate -> dedup_exact -> dedup_near(k=8) composes to exactly
    the id set of the driver-green pipeline_dedup_corpus query."""
    got = (
        CorpusPipeline(docs)
        .quality_gate(min_tokens=5)
        .dedup_exact()
        .dedup_near(k=8, bands=4, n=3)
        .ids()
    )
    want = standard.queries()["pipeline_dedup_corpus"](spark, SF)
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in want.collect()
    )


def test_chain_preserves_columns(spark, docs):
    """Steps thread the FULL row through (semi/anti joins on id), so
    downstream steps keep metadata columns."""
    out = CorpusPipeline(docs).quality_gate().dedup_exact().docs()
    assert set(out.columns) == set(docs.columns)


def test_sample_deterministic(spark, docs):
    a = CorpusPipeline(docs).sample(0.5).ids().collect()
    b = CorpusPipeline(docs).sample(0.5).ids().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = docs.count()
    assert 0.3 * n < len(a) < 0.7 * n


def test_steps_are_lazy(spark, docs):
    """Building a chain launches no jobs (plan-only): the facade composes
    one logical plan."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    chain = CorpusPipeline(docs).quality_gate().dedup_exact().sample(0.9)
    # dedup_near excluded: connected components is inherently materializing.
    after = tracker.getJobIdsForGroup(None)
    assert before == after
    assert chain.docs().columns  # schema resolution is not a job


def test_empty_corpus_flows_through(spark, docs):
    """Every step (including the CC fixpoint inside dedup_near) must accept
    an empty corpus and produce an empty corpus — the Monday-morning empty
    partition case."""
    empty = docs.filter("doc_id < 0")
    out = (
        CorpusPipeline(empty)
        .quality_gate()
        .dedup_exact()
        .dedup_near(k=8)
        .sample(0.5)
        .docs()
    )
    assert out.count() == 0
    assert set(out.columns) == set(docs.columns)


def test_pipeline_keep_best_prefers_quality_over_min_id(spark):
    """dedup_near_keep_best keeps the longest member of each near-dup
    cluster where dedup_near keeps the min id — and both keep exactly one
    survivor per cluster."""
    from trafficbigdatasearch_spark.pipeline import CorpusPipeline

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with a much longer tail of extra quality words"),
            (7, "completely unrelated content about distributed systems"),
        ],
        "doc_id: bigint, text: string",
    )
    min_ids = {
        r["doc_id"]
        for r in CorpusPipeline(docs).dedup_near(k=8, bands=4, n=2).ids().collect()
    }
    best = {
        r["doc_id"]
        for r in CorpusPipeline(docs)
        .dedup_near_keep_best(k=8, bands=4, n=2)
        .ids()
        .collect()
    }
    assert min_ids == {1, 7}
    assert best == {2, 7}


def test_pipeline_enforce_stage(spark):
    """enforce() composes into the pipeline: clean corpora pass through,
    a broken invariant fails the terminal action with the check's name."""
    import pytest

    from trafficbigdatasearch_spark.catalog import load_table
    from trafficbigdatasearch_spark.operators import validate as V
    from trafficbigdatasearch_spark.pipeline import CorpusPipeline

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ok = (
        CorpusPipeline(docs)
        .enforce({"doc_id_present": V.row_not_null("doc_id")})
        .quality_gate(min_tokens=1)
        .docs()
    )
    assert ok.count() > 0

    broken = docs.withColumn(
        "lang",
        __import__("pyspark.sql.functions", fromlist=["when"]).when(
            docs.doc_id % 100 == 0, None
        ).otherwise(docs.lang),
    )
    bad = CorpusPipeline(broken).enforce(
        {"lang_present": V.row_not_null("lang")}
    ).docs()
    with pytest.raises(Exception, match="lang_present"):
        bad.count()


def test_lm_gate_keeps_fluent_drops_alien_and_empty(spark):
    """lm_gate: docs sharing the trusted corpus's bigrams pass; docs with
    entirely alien vocabulary fail; docs with no bigrams (single token)
    drop — NULL coverage is a failed gate, not a pass."""
    from pyspark.sql import functions as F

    from trafficbigdatasearch_spark.pipeline import CorpusPipeline

    trusted = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id BIGINT, text STRING",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),      # fully covered
            (2, "zzz qqq vvv kkk www"),            # alien bigrams
            (3, "single"),                          # no bigrams -> NULL
        ],
        "doc_id BIGINT, text STRING",
    )
    kept = [
        r["doc_id"]
        for r in CorpusPipeline(docs)
        .lm_gate(trusted, min_coverage=0.5, min_count=2)
        .df.select("doc_id")
        .collect()
    ]
    assert kept == [1]
