"""Query registry — the engine's named-query catalog.

Every operator the engine claims (SURVEY.md §2.10) registers one or
more named queries here. A query is:

- ``build(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation (DataFrame API; Catalyst plans it);
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  tables, or ``None`` for ops SQL can't express (those get a weaker
  rows-only check from the driver).

Exact-match discipline (the driver hash-compares values):

- Money aggregates go through ``DECIMAL`` so sums are exact and
  engine-order-independent, then cast back to DOUBLE — both engines
  produce bit-identical doubles from the same exact decimal.
- Every computed column is aliased identically in both dialects.
- Any float produced by genuinely floating math (cosine, tf-idf) is
  rounded to a fixed precision in BOTH dialects before output.
- Result sets avoid ties under the driver's order-insensitive compare
  by construction (row_number over fully-specified orderings).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add ``fn(spark, sf_dir) -> DataFrame`` to the catalog."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Modules that register queries on import. Imported lazily inside
# all_queries so a broken/absent module degrades the catalog instead of
# killing it (the driver still sees every query that DOES load).
_QUERY_MODULES = (
    "bfs_mapreduce_spark.operators.relational",
    "bfs_mapreduce_spark.operators.graph_queries",
    "bfs_mapreduce_spark.operators.dedup_queries",
    "bfs_mapreduce_spark.operators.similarity_queries",
    "bfs_mapreduce_spark.operators.text_queries",
    "bfs_mapreduce_spark.operators.asof_queries",
    "bfs_mapreduce_spark.operators.multimodal_queries",
    "bfs_mapreduce_spark.streaming.windows",
    "bfs_mapreduce_spark.functions.udfs",
)


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full catalog."""
    import importlib

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ImportError:  # a missing module costs its queries, not the catalog
            pass

    return dict(_REGISTRY)
