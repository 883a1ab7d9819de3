"""Graph-scale benchmark: does BFS per-round cost stay flat as the
graph grows?

The reference's declared workload (Presentazione.pdf slide 23) tops
out at mediumG-class (77 k vertices / 905 k edges) and largeG-class
(325 k / 1.5 M) random graphs — datasets absent from its repo — so
this tool SYNTHESIZES those shapes plus a 10x point (3.25 M / 15 M)
and runs the DataFrame BFS with per-round instrumentation.

The claim under test (BASELINE.md / DEPLOY.md): per-round cost is
fixed overhead + O(frontier), NOT O(V) or O(E) — the last-two-frontier
anti-join and the frontier-driven shuffle sizing keep each level's
work proportional to the level, so graph size only enters through
frontier sizes and round count.

Usage:  python tools/bench_graph_scale.py [--quick]
Writes one JSON line per graph to stdout; staging parquet goes under
/tmp (never the read-only /root/testdata).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# (name, n_vertices, n_edges) — reference-declared shapes + a 10x point
GRAPHS = [
    ("mediumG-class", 77_000, 905_000),
    ("largeG-class", 325_000, 1_500_000),
    ("largeG-10x", 3_250_000, 15_000_000),
]


def synthesize(name: str, n: int, m: int, out_dir: str) -> str:
    """G(n, m)-style random multigraph with a Hamiltonian backbone so
    BFS reaches every vertex (the reference's graphs are connected).
    Deterministic per (name, n, m); written as parquet in row-group
    sized chunks so the Spark scan parallelizes."""
    path = os.path.join(out_dir, f"{name}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(abs(hash((name, n, m))) % (2**32))
    backbone_src = np.arange(n - 1, dtype=np.int64)
    backbone_dst = backbone_src + 1
    extra = m - (n - 1)
    src = np.concatenate([backbone_src, rng.integers(0, n, size=extra, dtype=np.int64)])
    dst = np.concatenate([backbone_dst, rng.integers(0, n, size=extra, dtype=np.int64)])
    table = pa.table({"src": src, "dst": dst})
    pq.write_table(table, path, row_group_size=1_000_000)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="skip the 10x graph")
    args = ap.parse_args()

    from bfs_mapreduce_spark.operators.graph import bfs
    from bfs_mapreduce_spark.session import get_session

    out_dir = "/tmp/bfs_mapreduce_spark_scale"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="bench_graph_scale")

    # warm the BFS machinery so graph #1 doesn't pay codegen/JIT
    toy = spark.createDataFrame([(0, 1), (1, 2)], "src bigint, dst bigint")
    bfs(toy, with_paths=False, reached_only=True).count()

    graphs = GRAPHS[:2] if args.quick else GRAPHS
    for name, n, m in graphs:
        path = synthesize(name, n, m, out_dir)
        edges = spark.read.parquet(path)
        stats: dict = {}
        t0 = time.perf_counter()
        res = bfs(
            edges, source=0, with_paths=False, reached_only=True, stats=stats
        )
        n_reached = res.count()
        total = round(time.perf_counter() - t0, 3)
        rounds = stats["rounds"]
        n_rounds = len(rounds)
        print(
            json.dumps(
                {
                    "graph": name,
                    "vertices": n,
                    "edges": m,
                    "reached": n_reached,
                    "rounds": n_rounds,
                    "total_sec": total,
                    "sec_per_round": round(total / max(n_rounds, 1), 4),
                    "round_detail": [
                        {"round": r, "frontier": f, "sec": s} for r, f, s in rounds
                    ],
                }
            )
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
