"""Numeric column helpers shared by the query catalog.

The exact-sum discipline: monetary doubles are quantized to
DECIMAL(12,2) (their true precision in the test data) before
arithmetic, summed exactly, and only then cast back to DOUBLE.
Sum order stops mattering, so Spark and DuckDB agree bit-for-bit,
and at scale the result is stable across partitionings/AQE re-plans —
re-running a 100 TB agg yields the same bytes every time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
FRAC = "decimal(12,4)"  # discounts/taxes: 0.0000-1.0000


def dmoney(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dfrac(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(FRAC)


def dsum_double(expr: Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as DOUBLE."""
    return F.sum(expr).cast("double").alias(alias)


def davg_double(expr: Column, alias: str) -> Column:
    """Average as exact-decimal sum divided by count, in double —
    matches ``CAST(SUM(dec) AS DOUBLE) / COUNT(*)`` on the oracle side."""
    return (F.sum(expr).cast("double") / F.count(F.lit(1))).alias(alias)
