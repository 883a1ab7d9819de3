"""Graph-scale benchmark — thin wrapper kept for back-compat; the
implementation lives in ``bfs_mapreduce_spark.benchmarks`` and is also
reachable as the CLI subcommand::

    python -m bfs_mapreduce_spark.cli bench-graph [--quick]

Usage:  python tools/bench_graph_scale.py [--quick]
Writes one JSON line per graph to stdout; staging parquet goes under
/tmp (never the read-only /root/testdata).
"""

from __future__ import annotations

import sys

from bfs_mapreduce_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["bench-graph", *sys.argv[1:]]))
