"""The reference's three query entry points, re-expressed as single declarative
DataFrame plans (SURVEY.md §3: expected job count drops from ~(2 + months + 4)
actions to 1-2)."""

from trafficbigdatasearch_spark.queries.accident import accident_count
from trafficbigdatasearch_spark.queries.overspeed import overspeed_count
from trafficbigdatasearch_spark.queries.avgspeed import average_speed

__all__ = ["accident_count", "overspeed_count", "average_speed"]
