"""Structural guard for the oracle type-widening bug class.

Three consecutive rounds lost a CORRECTNESS row to the same defect
(q_events_sessionize, q_rollup_cascade, q_profile_documents): DuckDB
widens integer ``SUM()`` / arithmetic to HUGEINT, pandas surfaces
HUGEINT as float64/object, and the driver's strict value-hash then
mismatches Spark's BIGINT even though every value is numerically
identical.  (The local compare in ``oracle_utils`` is float-tolerant,
so only the driver catches it — one round too late.)

This lint makes the class impossible to reintroduce: every registered
oracle is ``DESCRIBE``-d in DuckDB (binds the query without executing
it) and any HUGEINT/UHUGEINT output column fails the suite with a
pointer to the offending column.  Fix is always the same one-liner:
``CAST(... AS BIGINT)`` in the oracle.
"""

from __future__ import annotations

import pytest

from bfs_mapreduce_spark.registry import all_queries
from tests.oracle_utils import duckdb_connection

CATALOG = all_queries()
ORACLE_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)

_BANNED_TYPES = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def duck(sf_smoke_dir):
    con = duckdb_connection(sf_smoke_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_has_no_hugeint_columns(duck, name):
    schema = duck.sql("DESCRIBE " + CATALOG[name].oracle).fetchall()
    offending = [
        (col, typ)
        for col, typ, *_ in schema
        if any(b in typ.upper() for b in _BANNED_TYPES)
    ]
    assert not offending, (
        f"{name}: oracle emits {offending} — DuckDB widened an integer "
        "aggregate; wrap it in CAST(... AS BIGINT) so the driver's "
        "value-hash matches Spark's BIGINT"
    )
