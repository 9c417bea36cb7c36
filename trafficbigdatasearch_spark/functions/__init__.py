"""Column-expression function library (SURVEY.md §2.6 + pipeline ops).

Everything here returns ``pyspark.sql.Column`` built from JVM-side built-ins —
no Python UDFs — so every function composes into whole-stage codegen and is
safe in 100 TB-scale hot paths.
"""

from trafficbigdatasearch_spark.functions import text, vectors  # noqa: F401
