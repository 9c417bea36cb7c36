"""Traffic CSV ingestion with the reference's lenient-parse semantics.

Reference behavior being reproduced (SURVEY.md §1.2, §2.1 S5-S7):

- arity filter: rows with the wrong comma-split field count are dropped
  (src/AccidentStatistics.scala:62 ``length == 20``;
  src/OverSpeedCount.scala:29,69,86 ``== 8`` / ``== 5``),
- empty-key drop: rows with empty key fields are dropped
  (src/OverSpeedCount.scala:30,70,87),
- lenient numeric parse: failures default to 0/0.0
  (src/AccidentStatistics.scala:37-51),
- sentinel timestamps: unparseable ``yyyy-MM-dd HH:mm:ss`` values map to the
  epoch sentinel string and thence to its session-timezone millis
  (src/AccidentStatistics.scala:85-91; src/OverSpeedCount.scala:72-78,89-102);
  speed/fee rows with non-positive millis are then dropped
  (src/OverSpeedCount.scala:81,105), accident keeps sentinel rows (:94),
- accident "unquoting": the reference slices first+last char of *every* field
  unconditionally (src/AccidentStatistics.scala:63) — ``mode="parity"``
  reproduces that (corrupting unquoted fields exactly like the reference);
  ``mode="fixed"`` uses the CSV reader's quote handling.

Everything is column expressions over an all-string schema-ful CSV scan —
no Python UDFs, no RDDs — so the whole cleaning stage stays inside
whole-stage codegen and Catalyst can push bbox/time predicates into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trafficbigdatasearch_spark import schemas

TS_FMT = "yyyy-MM-dd HH:mm:ss"
#: src/AccidentStatistics.scala:88 — failed parses become this string, whose
#: session-timezone millis may be negative (e.g. -28800000 in Asia/Shanghai);
#: the speed/fee ``millis > 0`` drop then removes them.
SENTINEL_TS = "1970-01-01 00:00:00"


def lenient_int(col: Column) -> Column:
    """``parseToInt`` parity (src/AccidentStatistics.scala:37-43): 0 on failure."""
    return F.coalesce(F.trim(col).try_cast("int"), F.lit(0))


def lenient_double(col: Column) -> Column:
    """``parseToDouble`` parity (src/AccidentStatistics.scala:45-51)."""
    return F.coalesce(F.trim(col).try_cast("double"), F.lit(0.0))


def parsed_ts(col: Column) -> Column:
    """Timestamp parse with sentinel fallback (F2) — THE single home of the
    parity rule: parse failures yield the sentinel instant, not NULL
    (``DateTime.parse(s).getMillis`` + catch -> parse(sentinel),
    src/OverSpeedCount.scala:72-78)."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit(TS_FMT)),
        F.to_timestamp(F.lit(SENTINEL_TS), TS_FMT),
    )


def ts_millis(col: Column) -> Column:
    """Timestamp-string -> epoch millis (session timezone) via parsed_ts."""
    return F.unix_millis(parsed_ts(col))


def _non_empty(*cols: str) -> Column:
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull() & (F.length(F.col(c)) > 0)
    return pred


def _read_raw(spark: SparkSession, path, schema) -> DataFrame:
    """Quote-blind tokenization with exact Java ``String.split(",")`` parity.

    The reference tokenizes with Scala/Java ``split(",")`` (limit 0), which
    DROPS trailing empty fields — a row ending in a comma therefore fails the
    arity filter.  A CSV reader can't reproduce that; this does, as pure
    column expressions (whole-stage codegen, no Python):

    ``text scan -> strip trailing commas -> split(limit=-1) -> size == N``
    is element-for-element identical to Java's split + length check
    (interior empty fields survive, trailing ones are removed).
    """
    n = len(schema.fields)
    arr = F.split(F.regexp_replace(F.col("value"), ",+$", ""), ",", -1)
    return (
        spark.read.text(path)
        .filter(F.size(arr) == n)
        .select(*[arr.getItem(i).alias(schema.fields[i].name) for i in range(n)])
    )


# --- accident (src/AccidentStatistics.scala:53-99) ---------------------------


def read_accident_csv(
    spark: SparkSession, path: str, mode: str = "parity"
) -> DataFrame:
    """TF_ZFZD_CASESPECIFICATION.csv -> typed accident table.

    ``mode="parity"``: unconditionally strip first+last char of every field
    (src/AccidentStatistics.scala:63) after a quote-blind split — bug-for-bug.
    ``mode="fixed"``: standard CSV quote handling.
    Derived columns ``hour``/``timestamp`` per :92-93; sentinel rows kept (:94).
    """
    if mode == "parity":
        raw = _read_raw(spark, path, schemas.ACCIDENT_RAW)
        # Unconditional first+last-char slice (:63) — Scala ``slice(1, n-1)``;
        # corrupts unquoted fields exactly like the reference.
        raw = raw.select(
            *[
                F.expr(f"substring(`{c}`, 2, greatest(length(`{c}`) - 2, 0))").alias(c)
                for c in raw.columns
            ]
        )
    else:
        raw = (
            spark.read.schema(schemas.ACCIDENT_RAW)
            .option("header", "false")
            .option("quote", '"')
            .option("mode", "DROPMALFORMED")
            .csv(path)
        )
    typed_cols = []
    for name, dtype in schemas.ACCIDENT_COLUMNS:
        kind = dtype.typeName()
        if kind == "integer":
            typed_cols.append(lenient_int(F.col(name)).alias(name))
        elif kind == "double":
            typed_cols.append(lenient_double(F.col(name)).alias(name))
        else:
            typed_cols.append(F.col(name))
    parsed = parsed_ts(F.col("CASEDATE"))
    return raw.select(
        *typed_cols,
        F.hour(parsed).cast("int").alias("hour"),
        F.unix_millis(parsed).alias("timestamp"),
    )


# --- speed_base (src/OverSpeedCount.scala:25-34) -----------------------------


def read_speed_base_csv(spark: SparkSession, path: str) -> DataFrame:
    """Station dimension; rows with empty LON/LAT dropped (:30)."""
    raw = _read_raw(spark, path, schemas.SPEED_BASE_RAW)
    return raw.filter(_non_empty("LON", "LAT")).select(
        "LXBM",
        "GDCSYZH",
        "GDCSYBM",
        "CSFX",
        "CSYMC",
        "JDZBS",
        # try_cast: a malformed coordinate becomes NULL (fails the bbox
        # predicate) instead of aborting the query under Spark 4's ANSI-on
        # default — the same lenient posture as the other parses here
        F.col("LON").try_cast("double").alias("LON"),
        F.col("LAT").try_cast("double").alias("LAT"),
    )


# --- speed_data (src/OverSpeedCount.scala:66-81 / src/AverageSpeed.scala:43-57)


def read_speed_csv(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Camera observations -> typed table with derived calendar columns.

    Produces the richer AverageSpeed variant (day/month/year included,
    src/AverageSpeed.scala:15); OverSpeedCount's narrower shape is a
    projection of it. Rows with empty SITE_GUID/HPHM/WZSJ are dropped (:70)
    and non-positive millis are dropped (:81).
    """
    if isinstance(path, list) and not path:
        return spark.createDataFrame([], schemas.SPEED_DATA)
    raw = _read_raw(spark, path, schemas.SPEED_DATA_RAW)
    # :70 requires ALL five fields non-empty.
    raw = raw.filter(_non_empty("SITE_GUID", "HPHM", "WZSJ", "CLSD", "ISOVERSPEED"))
    ts = parsed_ts(F.col("WZSJ"))
    return (
        raw.select(
            "SITE_GUID",
            "HPHM",
            F.unix_millis(ts).alias("WZSJMillis"),
            F.hour(ts).cast("int").alias("WZSJHourOfDay"),
            F.dayofmonth(ts).cast("int").alias("WZSJDayOfMonth"),
            F.month(ts).cast("int").alias("WZSMonthOfYear"),
            F.year(ts).cast("int").alias("WZSJYear"),
            lenient_int(F.col("CLSD")).alias("CLSD"),
            lenient_int(F.col("ISOVERSPEED")).alias("ISOVERSPEED"),
        )
        .filter(F.col("WZSJMillis") > 0)
    )


# --- fee_data (src/OverSpeedCount.scala:83-105) ------------------------------


def read_fee_csv(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Toll trips; empty ENTIME/EXTIME dropped (:87), non-positive millis
    dropped (:105)."""
    if isinstance(path, list) and not path:
        return spark.createDataFrame([], schemas.FEE_DATA)
    raw = _read_raw(spark, path, schemas.FEE_DATA_RAW)
    raw = raw.filter(_non_empty("EXTIME", "ENTIME"))
    return (
        raw.select(
            "EXSTATION",
            ts_millis(F.col("EXTIME")).alias("EXTIMEMillis"),
            "ENSTATION",
            ts_millis(F.col("ENTIME")).alias("ENTIMEMillis"),
            "EXVEHCLASS",
            "ENVEHPLATE",
            "EXVEHPLATE",
            "EXTRUCKFLAG",
        )
        .filter((F.col("EXTIMEMillis") > 0) & (F.col("ENTIMEMillis") > 0))
    )
