"""JSONL source/sink contracts (sources/jsonl.py)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from trafficbigdatasearch_spark.catalog import load_table
from trafficbigdatasearch_spark.sources import jsonl

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text", "lang")


def test_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    jsonl.write_jsonl(docs, path, compression=None)
    back = jsonl.read_jsonl(spark, path, DOC_SCHEMA)
    clean = jsonl.clean_rows(back)
    assert jsonl.quarantine_lines(spark, path, DOC_SCHEMA).count() == 0
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in clean.collect())
    assert a == b


def test_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also ok", "lang": "en"}),
        '["wrong", "shape"]',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = jsonl.read_jsonl(spark, str(p), DOC_SCHEMA)
    clean = jsonl.clean_rows(df)
    assert clean.count() == 2
    bad = sorted(r[0] for r in jsonl.quarantine_lines(spark, str(p), DOC_SCHEMA).collect())
    assert bad == sorted(["{this is not json", '["wrong", "shape"]'])


def test_tab_indented_lines_stay_reader_consistent(spark, tmp_path):
    """Regression (r13 fuzz-class finding): trim strips only ASCII spaces,
    so a TAB-indented valid line used to land in BOTH clean_rows and the
    quarantine, and a tab-only line (which the reader skips) used to be
    quarantined."""
    p = tmp_path / "tabbed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "\t" + json.dumps({"doc_id": 2, "text": "tab indented", "lang": "en"}),
        "   " + json.dumps({"doc_id": 3, "text": "space indented", "lang": "en"}),
        "\t",
        "not json",
    ]
    p.write_text("\n".join(lines) + "\n")
    clean = jsonl.clean_rows(jsonl.read_jsonl(spark, str(p), DOC_SCHEMA))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2, 3]
    bad = [r.line for r in jsonl.quarantine_lines(spark, str(p), DOC_SCHEMA).collect()]
    assert bad == ["not json"]


def test_partial_type_mismatch_goes_to_quarantine_only(spark, tmp_path):
    """Regression (r13 fuzz finding): a line with ONE bad field and one
    good field parses with the good field kept AND the corrupt record
    set — on the any-field-non-null predicate alone it used to land in
    BOTH clean_rows and the quarantine."""
    p = tmp_path / "partial.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        json.dumps({"doc_id": "not-a-long", "text": "half good", "lang": "en"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    clean = jsonl.clean_rows(jsonl.read_jsonl(spark, str(p), DOC_SCHEMA))
    assert clean.count() == 1          # count() path: no corrupt-only query
    assert [r.doc_id for r in clean.collect()] == [1]
    bad = [r.line for r in jsonl.quarantine_lines(spark, str(p), DOC_SCHEMA).collect()]
    assert bad == [lines[1]]


def test_type_mismatch_quarantined(spark, tmp_path):
    """Reader consistency: a syntactically valid line whose field fails type
    coercion parses all-null (so clean_rows drops it) AND must land in the
    quarantine — the PERMISSIVE reader records such lines in
    _corrupt_record, and the quarantine reproduces exactly that set."""
    p = tmp_path / "typed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        '{"doc_id": "not a number"}',
        "{broken",
        '["wrong", "shape"]',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = jsonl.read_jsonl(spark, str(p), DOC_SCHEMA)
    assert jsonl.clean_rows(df).count() == 1
    reader_bad = {
        r[0]
        for r in df.select(jsonl.CORRUPT_COL, "doc_id").collect()
        if r[0] is not None
    }
    quarantined = {
        r[0] for r in jsonl.quarantine_lines(spark, str(p), DOC_SCHEMA).collect()
    }
    assert '{"doc_id": "not a number"}' in quarantined
    assert quarantined == reader_bad


def test_failfast_mode_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    df = jsonl.read_jsonl(spark, str(p), DOC_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_sized_output_and_compression(spark, docs, tmp_path):
    """Tiny target forces multiple output files; gzip parts are readable."""
    path = str(tmp_path / "sized")
    big = docs.unionByName(docs).unionByName(docs)
    jsonl.write_jsonl(big, path, target_mb=1, compression="gzip")
    parts = glob.glob(os.path.join(path, "part-*.json.gz"))
    assert parts, "expected gzip part files"
    with gzip.open(parts[0], "rt") as f:
        first = json.loads(f.readline())
    assert set(first) <= {"doc_id", "text", "lang"}
    back = jsonl.read_jsonl(spark, path, DOC_SCHEMA)
    assert back.count() == big.count()


def test_schema_projection_pushdown(spark, docs, tmp_path):
    """Reading with a narrower schema parses only those fields (smoke: the
    plan's ReadSchema is the narrow one — JSON readers prune by schema)."""
    path = str(tmp_path / "narrow")
    jsonl.write_jsonl(docs, path, compression=None)
    narrow = StructType([StructField("doc_id", LongType(), True)])
    df = jsonl.read_jsonl(spark, path, narrow, mode="DROPMALFORMED")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "doc_id" in plan and "text" not in plan
    assert df.select(F.count("*")).first()[0] == docs.count()
