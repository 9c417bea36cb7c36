"""Sources & sinks: schema-ful CSV/Parquet scans and the JSON sink.

The reference's scan stack is ``sc.textFile`` + ``split(",")`` + per-row Scala
closures (SURVEY.md §2.1 S1-S8) — opaque to the optimizer, so every query
re-parses every file.  Here every source is a DataFrame scan with an explicit
schema and all cleaning as Catalyst expressions, so column pruning and
predicate pushdown reach the file reader.
"""

from trafficbigdatasearch_spark.sources.csv_traffic import (
    read_accident_csv,
    read_fee_csv,
    read_speed_base_csv,
    read_speed_csv,
)
from trafficbigdatasearch_spark.sources.parquet import (
    read_partitioned,
    write_month_partitioned,
)
from trafficbigdatasearch_spark.sources.json_sink import to_json_rows

__all__ = [
    "read_accident_csv",
    "read_speed_base_csv",
    "read_speed_csv",
    "read_fee_csv",
    "read_partitioned",
    "write_month_partitioned",
    "to_json_rows",
]
