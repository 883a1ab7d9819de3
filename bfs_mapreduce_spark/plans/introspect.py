"""Physical-plan introspection helpers.

The engine's scale discipline is enforced through the PLAN, not just
results: filters must reach the parquet scan, small sides must
broadcast, melt must be an Expand, iterative rounds must not leak
exchanges. These helpers give tests (and users auditing a query at
100 TB) one place to read those facts off the executed plan instead of
scraping strings ad hoc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as Spark prints it (post-AQE top level)."""
    return df._jdf.queryExecution().executedPlan().toString()


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) nodes in the
    plan — the first number to check against a query's scale story."""
    return executed_plan(df).count("Exchange")


def scan_count(df: DataFrame, fmt: str = "parquet") -> int:
    """Number of file scans of ``fmt`` — catches accidental multi-scan
    shapes (e.g. a melt written as N unioned scans)."""
    return executed_plan(df).count(f"FileScan {fmt}")


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists as raw strings, one per scan."""
    plan = executed_plan(df)
    out = []
    for part in plan.split("PushedFilters: ")[1:]:
        out.append(part.split("]", 1)[0] + "]")
    return out


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema strings, one per scan — column pruning made visible."""
    plan = executed_plan(df)
    return [part.splitlines()[0].strip() for part in plan.split("ReadSchema:")[1:]]
