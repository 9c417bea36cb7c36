"""trafficbigdatasearch_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference system ``greatji/TrafficBigDataSearch``
(a Spark 1.6-era Scala demo: CSV scan -> lenient parse -> spatial bbox filter ->
temporal range filter -> equi join -> interval join -> per-month union ->
GROUP BY hour COUNT/AVG -> JSON rows), re-expressed as declarative DataFrame /
Spark SQL plans optimized by Catalyst + AQE, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) the reference lacks.

Design rules (see SURVEY.md):
- DataFrame-first; no RDD API in the hot path; no row-at-a-time Python UDFs.
- Catalyst does pruning/pushdown/join-selection; we declare, it schedules.
- Every operator is partition-parallel and sized for a 1000-executor cluster;
  local[32] is only the test harness.
"""

from trafficbigdatasearch_spark.session import get_spark, stop_spark
from trafficbigdatasearch_spark.engine import TrafficEngine

__all__ = ["get_spark", "stop_spark", "TrafficEngine"]
__version__ = "0.1.0"
