"""The driver's t2 gate, run locally: every catalog query with a
DuckDB oracle is executed on Spark AND DuckDB over the same parquet
(sf from $SPARK_GRAFT_ORACLE_DIR, default sf0.01) and value-compared
order-insensitively. Queries with ``oracle=None`` get a rows-run smoke
check here; their semantic tests live in their own test modules.
"""

from __future__ import annotations

import pytest

from bfs_mapreduce_spark.registry import all_queries
from tests.oracle_utils import compare, duckdb_connection

CATALOG = all_queries()
ORACLE_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_oracle_dir):
    con = duckdb_connection(sf_oracle_dir)
    yield con
    con.close()


def test_catalog_loads():
    assert len(CATALOG) >= 25, sorted(CATALOG)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_oracle_dir, duck, name):
    q = CATALOG[name]
    spark_pdf = q.build(spark, sf_oracle_dir).toPandas()
    duck_pdf = duck.sql(q.oracle).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_oracle_dir, name):
    q = CATALOG[name]
    df = q.build(spark, sf_oracle_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_bench_headline_names_resolve():
    """bench.py's HEADLINE suite must name real catalog queries — a
    renamed query would silently drop out of the driver's BENCH run
    (bench skips unknown names rather than failing)."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, missing


def test_parity_certification_covers_headliners():
    """The sf0.1 certification sweep must cover every bench headliner
    (the scale the engine is benched at is also the scale it is
    verified at), and the committed PARITY_sf01.json must reflect that
    set with zero failures: hash-checked where an oracle exists,
    rows-only never silently substituting for an available oracle."""
    import json
    import os

    import bench
    from tools.strict_parity_sweep import _certify_set

    names = _certify_set()
    assert set(bench.HEADLINE) <= set(names)

    path = os.path.join(os.path.dirname(bench.__file__), "PARITY_sf01.json")
    assert os.path.exists(path), "run tools/strict_parity_sweep.py --certify"
    got = json.load(open(path))
    assert got["n_fail"] == 0
    assert set(names) <= set(got["queries"])
    for name in names:
        row = got["queries"][name]
        assert row["ok"], name
        want_mode = "rows_only" if CATALOG[name].oracle is None else "strict_hash"
        assert row["mode"] == want_mode, (name, row["mode"])


def test_full_catalog_certified_at_bench_scale():
    """Round-8 upgrade of the sf0.1 gate: PARITY_sf01_full.json must
    cover EVERY oracle-paired catalog query with a passing strict-hash
    row — adding a query obliges re-running the full sf0.1 sweep
    (tools/strict_parity_sweep.py). This is the net that caught
    q_udaf_geomean's scale-latent LN(0): green at sf0.01, broken at
    bench scale."""
    import json
    import os

    import bench

    path = os.path.join(os.path.dirname(bench.__file__), "PARITY_sf01_full.json")
    assert os.path.exists(path), "run the full sf0.1 strict_parity_sweep"
    got = json.load(open(path))
    assert got["n_fail"] == 0
    oracle_paired = {n for n, q in CATALOG.items() if q.oracle is not None}
    missing = oracle_paired - set(got["queries"])
    assert not missing, f"queries not yet sf0.1-certified: {sorted(missing)}"
    bad = [n for n in oracle_paired if not got["queries"][n]["ok"]]
    assert not bad, bad


def test_spark_entry_contract(spark):
    """The driver executes __spark_entry__ directly: entry() must
    produce rows with a stable schema, queries() must expose the whole
    catalog, and every oracle_sql() key must name a queries() entry."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(qs) == set(CATALOG)
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
