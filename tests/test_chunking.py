"""Document chunking (operators/chunking.py): conservation, overlap, and
the zero-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafficbigdatasearch_spark.operators import chunking


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(150))),   # 3 chunks at 64/16
        (1, " ".join(f"u{i}" for i in range(64))),    # exactly one chunk
        (2, " ".join(f"v{i}" for i in range(65))),    # 64 + 1-token tail
        (3, "lone"),                                  # single token
        (4, ""),                                      # tokenless -> no rows
        (5, "   "),                                   # whitespace-only -> no rows
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_counts_and_sizes(docs):
    out = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # stride 48: doc 0 (150 toks) -> starts 0,48,96,144 -> 4 chunks
    assert sorted(c for d, c in rows if d == 0) == [0, 1, 2, 3]
    assert rows[(0, 0)]["n_tokens"] == 64
    assert rows[(0, 3)]["n_tokens"] == 150 - 144
    # doc 1 (64 toks) -> starts 0,48 -> 2 chunks (second is the 16-tok tail)
    assert sorted(c for d, c in rows if d == 1) == [0, 1]
    assert rows[(1, 1)]["n_tokens"] == 16
    # doc 3 single token -> one 1-token chunk
    assert rows[(3, 0)]["n_tokens"] == 1 and rows[(3, 0)]["chunk_text"] == "lone"
    # tokenless docs vanish
    assert not any(d in (4, 5) for d, _ in rows)
    # chunk_text token count always equals n_tokens
    for r in rows.values():
        assert len(r["chunk_text"].split(" ")) == r["n_tokens"]


def test_every_token_covered_and_overlap_exact(docs):
    out = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    covered = (
        out.filter(F.col("doc_id") == 0)
        .select(F.explode(F.split("chunk_text", " ")).alias("tok"))
        .distinct()
        .count()
    )
    assert covered == 150
    # consecutive chunks share exactly `overlap` tokens (non-tail case)
    rows = {r["chunk_id"]: r["chunk_text"].split(" ")
            for r in out.filter(F.col("doc_id") == 0).collect()}
    assert rows[0][-16:] == rows[1][:16]
    assert rows[1][-16:] == rows[2][:16]


def test_zero_overlap_partitions_tokens(docs):
    out = chunking.chunk_documents(docs, chunk_tokens=50, overlap=0)
    toks = (
        out.filter(F.col("doc_id") == 0)
        .orderBy("chunk_id")
        .select("chunk_text")
        .collect()
    )
    rebuilt = " ".join(r["chunk_text"] for r in toks).split(" ")
    assert rebuilt == [f"t{i}" for i in range(150)]


def test_chunking_plan_has_no_exchange(docs):
    out = chunking.chunk_documents(docs, chunk_tokens=64, overlap=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunking_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunking.chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(docs, chunk_tokens=32, overlap=32)


def test_tab_newline_only_docs_produce_zero_chunks(docs):
    """Regression (r13 fuzz finding): Spark's trim strips only ASCII
    spaces, so tab/newline-only text used to emit a phantom empty token
    and a (chunk_id=0, chunk_text='', n_tokens=1) row."""
    from pyspark.sql import Row

    spark = docs.sparkSession
    weird = spark.createDataFrame(
        [Row(doc_id=1, text="\t \n"), Row(doc_id=2, text="\n\n"),
         Row(doc_id=3, text="\t a \n b\t"), Row(doc_id=4, text=" x ")]
    )
    out = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in chunking.chunk_documents(
               weird, chunk_tokens=8, overlap=2).collect()}
    assert out == {(3, 0): ("a b", 2), (4, 0): ("x", 1)}
