"""Dump ``explain('formatted')`` for catalog queries to plans/<tag>/.

Usage:
    PYTHONPATH=/root/repo python tools/dump_plans.py <tag> [query ...]

Writes plans/<round_tag>/<query>_<tag>.txt for each query (default: the
bench HEADLINE set), e.g. ``dump_plans.py r18/before`` writes
``plans/r18/<query>_before.txt``.  The optimization judge reads these
files to check plan claims (Exchange counts, join strategies,
PushedFilters, Python-eval nodes) against the code, so they are
committed artifacts, not scratch output.

Iterative queries (BFS & co.) drive their own actions while being
built; for those the file records the plan of the FINAL returned
DataFrame, which is the comparable artifact round-over-round.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> None:
    if len(sys.argv) < 2 or "/" not in sys.argv[1]:
        raise SystemExit("usage: dump_plans.py <round>/<tag> [query ...]")
    round_dir, tag = sys.argv[1].split("/", 1)
    names = sys.argv[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, "/root/repo")
    import bench
    from bfs_mapreduce_spark.registry import all_queries
    from bfs_mapreduce_spark.session import get_session

    if not names:
        names = list(bench.HEADLINE)

    spark = get_session(app_name="dump_plans")
    catalog = all_queries()
    out_dir = os.path.join("/root/repo/plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = catalog.get(name)
        if q is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        df = q.build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({tag})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
