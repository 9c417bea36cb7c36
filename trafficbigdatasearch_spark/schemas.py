"""Explicit schemas for every table the engine reads (SURVEY.md §1.2).

The reference declares schemas as Scala case classes
(src/AccidentStatistics.scala:12-33, src/OverSpeedCount.scala:12-14,
src/AverageSpeed.scala:14-16); here they are ``StructType``s so the scan layer
is schema-ful (vectorized readers, no inference pass, pushdown-friendly).

Raw ("_RAW") variants are all-string: the lenient-parse semantics of the
reference (0/0.0 defaults, epoch sentinel timestamps — SURVEY §2.10) are
applied as *column expressions* in sources/csv_traffic.py, never per-row
Python, so Catalyst sees through the whole cleaning stage.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- A. Traffic domain (reference parity) -----------------------------------

#: TF_ZFZD_CASESPECIFICATION.csv — 20 source columns
#: (src/AccidentStatistics.scala:12-33). Every field arrives quoted.
ACCIDENT_COLUMNS = [
    ("ACCIDENTCLASS", IntegerType()),
    ("LOSSMONEY", IntegerType()),
    ("CASEID", StringType()),
    ("CASEDATE", StringType()),
    ("CASELEVEL", IntegerType()),
    ("CASELOCROADID", IntegerType()),
    ("CASELOCROAD", StringType()),
    ("CASELOCORADPART", StringType()),
    ("CASELOCDIRECTION", StringType()),
    ("CASELOCKILO", StringType()),
    ("CASELOCMETER", IntegerType()),
    ("CASELONGITUDE", DoubleType()),
    ("CASELATITUDE", DoubleType()),
    ("ACCIDENTTYPE", StringType()),
    ("DEATHNUM", IntegerType()),
    ("GREVIOUSINJURYNUM", IntegerType()),
    ("SLIGHTINJURYNUM", IntegerType()),
    ("CRASHEDMOTORVEHICLENUM", IntegerType()),
    ("LANDFORM", StringType()),
    ("WEATHER", StringType()),
]

ACCIDENT_RAW = _struct(*[(n, StringType()) for n, _ in ACCIDENT_COLUMNS])

#: Typed accident table incl. derived hour/timestamp
#: (src/AccidentStatistics.scala:92-93).
ACCIDENT = _struct(
    *ACCIDENT_COLUMNS, ("hour", IntegerType()), ("timestamp", LongType())
)

#: speed_base.csv — station dimension, 8 fields
#: (src/OverSpeedCount.scala:12; src/AverageSpeed.scala:14).
SPEED_BASE_RAW = _struct(
    ("LXBM", StringType()),
    ("GDCSYZH", StringType()),
    ("GDCSYBM", StringType()),
    ("CSFX", StringType()),
    ("CSYMC", StringType()),
    ("JDZBS", StringType()),
    ("LON", StringType()),
    ("LAT", StringType()),
)

SPEED_BASE = _struct(
    ("LXBM", StringType()),
    ("GDCSYZH", StringType()),
    ("GDCSYBM", StringType()),
    ("CSFX", StringType()),
    ("CSYMC", StringType()),
    ("JDZBS", StringType()),
    ("LON", DoubleType()),
    ("LAT", DoubleType()),
)

#: YYYYMMCSYDATA.csv — camera observations, 5 fields
#: (src/OverSpeedCount.scala:13,66-81).
SPEED_DATA_RAW = _struct(
    ("SITE_GUID", StringType()),
    ("HPHM", StringType()),
    ("WZSJ", StringType()),
    ("CLSD", StringType()),
    ("ISOVERSPEED", StringType()),
)

#: Typed camera observations with the full derived-calendar variant
#: (src/AverageSpeed.scala:15 — superset of src/OverSpeedCount.scala:13).
SPEED_DATA = _struct(
    ("SITE_GUID", StringType()),
    ("HPHM", StringType()),
    ("WZSJMillis", LongType()),
    ("WZSJHourOfDay", IntegerType()),
    ("WZSJDayOfMonth", IntegerType()),
    ("WZSMonthOfYear", IntegerType()),
    ("WZSJYear", IntegerType()),
    ("CLSD", IntegerType()),
    ("ISOVERSPEED", IntegerType()),
)

#: YYYYMMSFZDATA.csv — toll trips, 8 fields
#: (src/OverSpeedCount.scala:14,83-105).
FEE_DATA_RAW = _struct(
    ("EXSTATION", StringType()),
    ("EXTIME", StringType()),
    ("ENSTATION", StringType()),
    ("ENTIME", StringType()),
    ("EXVEHCLASS", StringType()),
    ("ENVEHPLATE", StringType()),
    ("EXVEHPLATE", StringType()),
    ("EXTRUCKFLAG", StringType()),
)

FEE_DATA = _struct(
    ("EXSTATION", StringType()),
    ("EXTIMEMillis", LongType()),
    ("ENSTATION", StringType()),
    ("ENTIMEMillis", LongType()),
    ("EXVEHCLASS", StringType()),
    ("ENVEHPLATE", StringType()),
    ("EXVEHPLATE", StringType()),
    ("EXTRUCKFLAG", StringType()),
)


# --- B. Driver testdata (TPC-H-ish; TESTDATA.md / FIXTURES.md §B) ------------

REGION = _struct(("r_regionkey", IntegerType()), ("r_name", StringType()))
NATION = _struct(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)
CUSTOMER = _struct(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)
SUPPLIER = _struct(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)
PART = _struct(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)
ORDERS = _struct(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)
LINEITEM = _struct(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)
EVENTS = _struct(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)
DOCUMENTS = _struct(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)
EMBEDDINGS = _struct(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
