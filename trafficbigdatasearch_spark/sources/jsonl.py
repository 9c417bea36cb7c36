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

    Keep = (any data field non-null) AND (corrupt column null).  The
    data-field leg keeps the filter from ever being a corrupt-ONLY file
    query — Catalyst's column pruning turns a pure corrupt-column filter
    under a ``count()`` into one, which Spark rejects
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and drops
    contentless-but-valid ``{}`` lines, which a corpus pipeline wants
    anyway.  The corrupt-column leg is REQUIRED for partition with the
    quarantine stream (r13 fuzz finding): a PARTIALLY type-mismatched
    line (one field fails coercion, another parses) keeps its good
    fields AND gets the corrupt record set, so on the data-field
    predicate alone it would land in BOTH streams — clean would silently
    carry a half-null row from a corrupt line."""
    if CORRUPT_COL not in df.columns:
        return df
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    keep = None
    for c in data_cols:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep | cond)
    return df.filter(keep & F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def quarantine_lines(
    spark: SparkSession, path: str | list[str], schema: StructType
) -> DataFrame:
    """The corrupt-line stream, as one ``line`` column — READER-CONSISTENT:
    a line lands here iff the PERMISSIVE reader would record it in
    ``_corrupt_record``, so ``clean_rows`` + this partition the input (modulo
    contentless-but-valid lines like ``{}``, dropped by clean and corrupt to
    neither engine).

    Spark refuses queries over raw JSON that reference ONLY the corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is caching the parsed frame — wrong at 100 TB.
    This instead re-reads the files as TEXT and runs ``from_json`` with the
    SAME parser options the reader uses (the file-source corrupt-only
    restriction does not apply to the expression form): one extra streaming
    pass, no cache.  That catches both syntactically malformed lines AND
    valid-JSON lines whose fields fail type coercion (a string where the
    schema wants a long) — the latter parse all-null yet ARE recorded by
    PERMISSIVE, so a syntax-only check would leak them out of both streams.
    Non-object top levels (arrays, scalars) are quarantined explicitly —
    ``from_json`` yields a null/empty struct for those rather than marking
    the corrupt column."""
    full = StructType(
        [f for f in schema.fields if f.name != CORRUPT_COL]
        + [StructField(CORRUPT_COL, StringType(), True)]
    )
    txt = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    # \s-regexp end-strip, NOT F.trim: trim removes only ASCII spaces, so a
    # TAB-indented valid line would fail the startswith("{") check and land
    # in BOTH streams, and a tab-only line (which the reader skips) would
    # be quarantined — both reader-consistency violations (r13 fuzz-class
    # finding, same root as functions/text.py::tokens).
    v = F.regexp_replace(F.col("value"), r"^\s+|\s+$", "")
    bad = parsed.isNull() | parsed[CORRUPT_COL].isNotNull() | ~v.startswith("{")
    return txt.filter(bad & (v != "")).select(F.col("value").alias("line"))


#: rough on-disk shrink of typical JSONL text per codec — used to size files
#: by their POST-compression bytes (the thing target_mb is about)
_COMPRESSION_RATIO = {
    "none": 1.0,
    "gzip": 6.0,
    "deflate": 6.0,
    "zstd": 6.0,
    "bzip2": 8.0,
    "lz4": 3.0,
    "snappy": 2.5,
}


def write_jsonl(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    compression: str | None = None,
    mode: str = "overwrite",
    compression_ratio: float | None = None,
) -> None:
    """Write sized JSONL files: estimate the serialized bytes from a sampled
    average line width, repartition to ceil(bytes/target), then write.  Same
    shape as parquet.write_sized — one extra cheap job (count + sampled
    width) buys a sane file layout for every downstream consumer.

    Default is UNCOMPRESSED: that keeps every output line-splittable, which
    is this module's stated goal (a gzip JSONL file is one undivisible
    stream — a 100 TB read gets at most one task per file).  When a codec is
    requested, the byte estimate is divided by its expected shrink
    (``compression_ratio`` overrides the built-in table) so files land near
    ``target_mb`` ON DISK rather than 5-10x under it."""
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
    ratio = compression_ratio or _COMPRESSION_RATIO.get(
        (compression or "none").lower(), 3.0
    )
    total_bytes = n * (avg_len + 1) / ratio
    n_files = max(1, int(total_bytes // (target_mb * 1024 * 1024)) + 1)
    (
        df.repartition(n_files)
        .write.mode(mode)
        .option("compression", compression or "none")
        .json(path)
    )
