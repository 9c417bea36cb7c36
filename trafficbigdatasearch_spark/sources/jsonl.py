"""JSON-lines source/sink — the interchange format of training-data
pipelines (web-crawl dumps, annotation exports, eval sets).

The reference reads only headerless CSV (src/AccidentStatistics.scala:59,
src/OverSpeedCount.scala:66) and emits JSON strings row-by-row
(src/TrafficStatistics.scala:25-35); this module is the general,
scale-correct version of both directions:

- **Reads take an EXPLICIT schema.**  Schema inference on JSONL is a full
  extra pass over the data before the real job starts — at 100 TB that is
  the single most expensive accidental line of code in a pipeline.  With a
  schema the reader is a single streaming pass, line-splittable, fully
  parallel.
- **Malformed lines are captured, not fatal.**  PERMISSIVE mode routes every
  unparseable line into a corrupt-record column so the pipeline can count /
  quarantine them (the reference's arity-filter behavior, S5, generalized);
  DROPMALFORMED and FAILFAST are pass-through options.
- **Writes go through the sized-file path.**  ``write_jsonl`` reuses the
  estimate-then-repartition logic of :func:`..sources.parquet.write_sized`
  semantics: JSONL output that lands in ~target-sized files instead of one
  file per upstream task (10k tiny files is the classic downstream-killer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-ful JSONL read.  In PERMISSIVE mode the returned frame carries
    ``_corrupt_record`` (null for clean rows); use :func:`split_corrupt` to
    separate the quarantine stream."""
    full = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def clean_rows(df: DataFrame) -> DataFrame:
    """Parsed rows only, corrupt column dropped, from a PERMISSIVE read.

    Filters on "any data field non-null" rather than on the corrupt column:
    Catalyst's column pruning turns a corrupt-column filter under a
    ``count()`` into a corrupt-only file query, which Spark rejects
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).  Malformed lines
    parse with ALL data fields null, so the predicates agree — except that a
    contentless-but-valid line (``{}``) is also dropped here, which is the
    behavior a corpus pipeline wants anyway."""
    if CORRUPT_COL not in df.columns:
        return df
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    keep = None
    for c in data_cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep | cond)
    return df.filter(keep).drop(CORRUPT_COL)


def quarantine_lines(
    spark: SparkSession, path: str | list[str], schema: StructType
) -> DataFrame:
    """The corrupt-line stream, as one ``line`` column.

    Spark refuses queries over raw JSON that reference ONLY the corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is caching the parsed frame — wrong at 100 TB.
    This instead re-reads the files as TEXT and keeps lines that are not
    valid JSON objects (``try_parse_json`` null, or a non-object top level —
    ``from_json`` can't return "failed" distinctly, it yields all-null
    structs): a second streaming pass, no cache, and the text scan of the
    same files is cheaper than the parse pass.  Type-level mismatches inside
    a valid object (a string where the schema wants a long) are NOT corrupt
    here, matching the reader, which nulls the field."""
    del schema  # corrupt-ness is a property of the line, not the schema
    txt = spark.read.text(path)
    v = F.trim(F.col("value"))
    bad = F.try_parse_json(F.col("value")).isNull() | ~v.startswith("{")
    return txt.filter(bad & (v != "")).select(F.col("value").alias("line"))


def write_jsonl(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write sized JSONL files: estimate the serialized bytes from a sampled
    average line width, repartition to ceil(bytes/target), then write.  Same
    shape as parquet.write_sized — one extra cheap job (count + sampled
    width) buys a sane file layout for every downstream consumer."""
    n = df.count()
    if n == 0:
        df.write.mode(mode).option("compression", compression or "none").json(path)
        return
    frac = min(1.0, 10_000 / n)
    sample = df.sample(fraction=frac, seed=7)
    avg_len = (
        sample.select(
            F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("w")
        ).first()["w"]
        or 1.0
    )
    total_bytes = n * (avg_len + 1)
    n_files = max(1, int(total_bytes // (target_mb * 1024 * 1024)) + 1)
    (
        df.repartition(n_files)
        .write.mode(mode)
        .option("compression", compression or "none")
        .json(path)
    )
