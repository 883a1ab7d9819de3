"""Sink operators as catalog queries (SURVEY.md §2.10 "Sinks" —
reference op #3, the CSV append sink at ``BFS_map_reduce.py:155-164``,
re-expressed at engine scale).

The reference's only sink appends result rows to a CSV file. The
engine's scale sink is partitioned parquet with append semantics:
executors write partition-pruned files, a reader scans only the
partitions a filter names. ``q_sink_roundtrip`` exercises the full
write → append → partition-pruned read → aggregate cycle as a
DuckDB-oracle-checked catalog query, so the sink surface gets a
driver-verified correctness row (previously it was tests-only:
tests/test_sources.py, tests/test_bucketing.py).

Scale posture: the write is a plain executor-side
``DataFrameWriter.parquet`` — no driver funnel; ``partitionBy`` lays
files out so the read back prunes at the directory level
(PartitionFilters in the scan, proved in tests/test_relational.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bfs_mapreduce_spark.registry import register
from bfs_mapreduce_spark.sources.readers import load_table

_PRIORITIES = ("1-URGENT", "2-HIGH")


@register(
    "q_sink_roundtrip",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderpriority IN {_PRIORITIES!r}
    GROUP BY o_orderpriority
    """,
    doc="Sink round-trip: write orders as parquet partitioned by "
    "priority (half overwrite, half APPEND — the reference's append "
    "sink semantics, op #3), read back with a partition filter (pruned "
    "at the directory level), aggregate. The oracle aggregates the "
    "source directly, so any write/append/read corruption — lost rows, "
    "double-applied append, partition-value mangling — breaks the "
    "hash match.",
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(tempfile.gettempdir(), "bfs_mapreduce_spark_sink", tag)
    shutil.rmtree(out, ignore_errors=True)  # idempotent per invocation
    evens = orders.filter(F.col("o_orderkey") % 2 == 0)
    odds = orders.filter(F.col("o_orderkey") % 2 == 1)
    evens.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    odds.write.mode("append").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderpriority").isin(*_PRIORITIES))
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )
