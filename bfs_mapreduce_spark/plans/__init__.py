from bfs_mapreduce_spark.plans.introspect import (
    exchange_count,
    executed_plan,
    pushed_filters,
    read_schema,
    scan_count,
    scan_metrics,
)

__all__ = [
    "executed_plan",
    "exchange_count",
    "scan_count",
    "pushed_filters",
    "read_schema",
    "scan_metrics",
]
