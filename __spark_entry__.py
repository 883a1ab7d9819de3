"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything here delegates to the engine's named-query catalog
(``bfs_mapreduce_spark.registry.all_queries``) — one entry per
implemented operator from SURVEY.md §2.10. The few queries whose
semantics SQL can't express (LSH candidate generation, approximate
sketches, data-dependent iteration depth at sf scale) register
``oracle=None`` and get the driver's weaker rows-only check; their
semantic tests live in tests/. Iterative operators on the static
reference graphs (BFS, k-core, label propagation) DO carry exact
oracles — their loops unroll as SQL CTEs because the round count is
a measured constant there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bfs_mapreduce_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-style pricing summary: scan → pushdown filter → 8-agg
    groupBy with automatic map-side partial aggregation — the shape
    that exercises the whole scan/filter/shuffle/agg pipeline.
    """
    q = all_queries()["q1_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query that declares one."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
