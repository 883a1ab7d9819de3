"""Strict oracle-parity sweep: catalog queries vs DuckDB at
string-level value equality — STRICTER than the driver's hash compare,
so latent last-ulp drift is caught here before it ever reaches a
CORRECTNESS_r{N}.json.

The repo convention this enforces: any float produced by genuinely
floating or engine-rounded math must be snapped to the 1e-6 grid in
BOTH dialects (see q1 sum_charge / q14 promo_share history).

Three modes:

  # full sweep of every oracle-paired catalog query (default sf0.01)
  PYTHONPATH=/root/repo python tools/strict_parity_sweep.py [sf_dir]

  # bench-scale certification: the headline suite at sf0.1, JSON out
  PYTHONPATH=/root/repo python tools/strict_parity_sweep.py \\
      --certify /root/testdata/sf0.1 PARITY_sf01.json

  # FULL-CATALOG certification with JSON out (what
  # PARITY_sf01_full.json is made of; --certify writes only the
  # 16-query headline set — round 17 added this mode after the
  # headline set briefly overwrote the full artifact)
  PYTHONPATH=/root/repo python tools/strict_parity_sweep.py \\
      --full /root/testdata/sf0.1 PARITY_sf01_full.json

Certification exists because the driver's correctness gate runs at
sf0.01 while the bench runs sf0.1: a wrong answer that only manifests
at scale (overflow, tie-break drift under more partitions) would
otherwise pass. The certified set is bench.HEADLINE with the one
rows-only headliner (q_dedup_minhash_lsh) checked rows-only and its
oracle-paired recall twin (q_dedup_lsh_recall) hash-checked in its
place. Exits non-zero if any pair mismatches.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _certify_set() -> list[str]:
    """bench.HEADLINE, with the rows-only headliner's oracle-paired
    twin appended so every headline computation gets a hash check."""
    sys.path.insert(0, "/root/repo")
    import bench

    return list(bench.HEADLINE) + ["q_dedup_lsh_recall"]


def value_hash(df) -> str:
    df = df[sorted(df.columns)]
    if df.empty:  # empty-frame apply returns a DataFrame, not a Series
        rows = []
    else:
        rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def run(sf_dir: str, names: list[str] | None, json_out: str | None) -> int:
    from bfs_mapreduce_spark.registry import all_queries
    from bfs_mapreduce_spark.session import get_session

    spark = get_session(app_name="strict_parity_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    catalog = all_queries()
    todo = names if names is not None else list(catalog)
    fails, report = [], {}
    for name in todo:
        q = catalog[name]
        if q.oracle is None and names is None:
            continue
        try:
            t0 = time.monotonic()
            sdf = q.build(spark, sf_dir).toPandas()
            t_spark = round(time.monotonic() - t0, 3)
            if q.oracle is None:  # rows-only certification (no oracle)
                ok = len(sdf) > 0
                report[name] = {
                    "mode": "rows_only",
                    "ok": ok,
                    "spark_rows": len(sdf),
                    "spark_sec": t_spark,
                }
            else:
                t0 = time.monotonic()
                odf = con.execute(q.oracle).df()
                t_oracle = round(time.monotonic() - t0, 3)
                ok = (
                    len(sdf) == len(odf)
                    and sorted(sdf.columns) == sorted(odf.columns)
                    and value_hash(sdf) == value_hash(odf)
                )
                report[name] = {
                    "mode": "strict_hash",
                    "ok": ok,
                    "spark_rows": len(sdf),
                    "oracle_rows": len(odf),
                    "spark_sec": t_spark,
                    "oracle_sec": t_oracle,
                }
        except Exception as ex:  # a broken pair is a failure, not a crash
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}", flush=True)
            report[name] = {"mode": "error", "ok": False, "err": str(ex)[:300]}
            fails.append(name)
            continue
        print(f"{'ok  ' if ok else 'FAIL'} {name} rows={len(sdf)}", flush=True)
        if not ok:
            fails.append(name)
    spark.stop()
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "n_ok": sum(1 for r in report.values() if r["ok"]),
            "n_fail": len(fails),
            "queries": report,
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{len(fails)} strict mismatches: {fails}")
    return 1 if fails else 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--certify":
        sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
        json_out = argv[2] if len(argv) > 2 else "PARITY_sf01.json"
        return run(sf_dir, _certify_set(), json_out)
    if argv and argv[0] == "--full":
        sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
        json_out = argv[2] if len(argv) > 2 else "PARITY_sf01_full.json"
        return run(sf_dir, None, json_out)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # optional query names after sf_dir: sweep only those
    names = argv[1:] or None
    return run(sf_dir, names, None)


if __name__ == "__main__":
    raise SystemExit(main())
