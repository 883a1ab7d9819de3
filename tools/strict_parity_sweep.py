"""Strict oracle-parity sweep: every oracle-paired catalog query vs
DuckDB at string-level value equality — STRICTER than the driver's
hash compare, so latent last-ulp drift is caught here before it ever
reaches a CORRECTNESS_r{N}.json.

The repo convention this enforces: any float produced by genuinely
floating or engine-rounded math must be snapped to the 1e-6 grid in
BOTH dialects (see q1 sum_charge / q14 promo_share history).

Usage:  PYTHONPATH=/root/repo python tools/strict_parity_sweep.py [sf_dir]
Exits non-zero if any pair mismatches.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(df) -> str:
    df = df[sorted(df.columns)]
    if df.empty:  # empty-frame apply returns a DataFrame, not a Series
        rows = []
    else:
        rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from bfs_mapreduce_spark.registry import all_queries
    from bfs_mapreduce_spark.session import get_session

    spark = get_session(app_name="strict_parity_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails = []
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        try:
            sdf = q.build(spark, sf_dir).toPandas()
            odf = con.execute(q.oracle).df()
            ok = (
                len(sdf) == len(odf)
                and sorted(sdf.columns) == sorted(odf.columns)
                and value_hash(sdf) == value_hash(odf)
            )
        except Exception as ex:  # a broken pair is a failure, not a crash
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            fails.append(name)
            continue
        print(f"{'ok  ' if ok else 'FAIL'} {name} rows={len(sdf)}", flush=True)
        if not ok:
            fails.append(name)
    spark.stop()
    print(f"\n{len(fails)} strict mismatches: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
