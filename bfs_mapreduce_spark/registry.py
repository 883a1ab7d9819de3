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
    "bfs_mapreduce_spark.operators.sink_queries",
    "bfs_mapreduce_spark.operators.graph_queries",
    "bfs_mapreduce_spark.operators.dedup_queries",
    "bfs_mapreduce_spark.operators.similarity_queries",
    "bfs_mapreduce_spark.operators.text_queries",
    "bfs_mapreduce_spark.operators.asof_queries",
    "bfs_mapreduce_spark.operators.multimodal_queries",
    "bfs_mapreduce_spark.streaming.windows",
    "bfs_mapreduce_spark.functions.udfs",
    "bfs_mapreduce_spark.functions.skew",
)


# Catalog presentation order. The verification harness checks the
# catalog front-to-back with a bounded budget (WINDOW queries), so the
# order matters — but it is DERIVED, not hand-edited. ``all_queries``
# reads the historical ``CORRECTNESS_r*.json`` driver records from the
# repo root and sorts:
#   1. the bench headliners (perf queries stay co-verified with the
#      bench — ``_HEADLINERS`` mirrors bench.py's HEADLINE list; a
#      test asserts they stay in sync),
#   2. every oracle-paired query with NO green driver row in any
#      historical round (newly-registered queries land here
#      automatically — late-landing queries can never again miss
#      certification by someone forgetting to edit a list),
#   3. remaining oracle-paired queries, LEAST-recently-green first —
#      an automatic rotation: earning a green row moves a query to
#      the back, so the window cycles through the whole catalog over
#      successive rounds and no family goes permanently dark,
#   4. oracle=None (rows-only) queries last, same never-green-then-
#      least-recently-green order — they carry the weakest external
#      signal; their semantic checks live in tests/.
# Ties inside each group break by registration order (stable).
_HEADLINERS: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q_window_topk",
    "q_events_sessionize",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_similarity_topk",
    "q_text_tfidf",
    "q_asof_join",
    "q_graph_bfs_histogram",
    "q_similarity_ivfpq_spill",
    "q_pipeline_prepare",
    # lakehouse headliner (round 14, verdict ask #7)
    "q_scan_snapshot_source",
)

# The driver's per-round verification budget (first WINDOW entries of
# the ordered catalog get external CORRECTNESS rows).
WINDOW = 50

# Of those, the LAST ``ROWS_ONLY_SLOTS`` are reserved for the rows-only
# rotation (round-7 VERDICT ask 4): with ~160 oracle-paired queries
# ahead of them, rows-only queries otherwise never reach the window
# and carry zero external driver rows. Two slots cycle the rows-only
# tail (never-rows-green first, then least-recently) at a period of
# ceil(n_rows_only / 2) rounds while costing the oracle-paired
# rotation only two slots.
ROWS_ONLY_SLOTS = 2


def _green_history() -> tuple[dict[str, int], dict[str, int]]:
    """Scan the repo root's ``CORRECTNESS_r*.json`` driver records.

    Returns ``(last_hash_green, last_rows_green)`` — query name → most
    recent round number with, respectively, a full hash-verified green
    row (rows+schema+hash all matched, no error) and a rows-only green
    row (``err == 'no_oracle'`` with a non-negative row count). Missing
    or malformed files are skipped: a fresh checkout simply treats the
    whole catalog as never-certified.
    """
    import json
    import re
    from pathlib import Path

    last_hash: dict[str, int] = {}
    last_rows: dict[str, int] = {}
    root = Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)$", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_hash[name] = max(last_hash.get(name, rnd), rnd)
            elif row.get("err") == "no_oracle":
                rows = row.get("spark_rows")
                if isinstance(rows, int) and rows >= 0:
                    last_rows[name] = max(last_rows.get(name, rnd), rnd)
    return last_hash, last_rows


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full catalog, ordered so the driver's bounded verification
    window always certifies the queries that need it most (see the
    ordering policy comment above ``_HEADLINERS``)."""
    import importlib

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ImportError:  # a missing module costs its queries, not the catalog
            pass

    last_hash, last_rows = _green_history()
    reg_order = {name: i for i, name in enumerate(_REGISTRY)}
    head_rank = {name: i for i, name in enumerate(_HEADLINERS)}

    def sort_key(name: str) -> tuple:
        q = _REGISTRY[name]
        if name in head_rank:
            return (0, head_rank[name], 0)
        if q.oracle is not None:
            # oracle-paired: only a hash-verified row counts as
            # certified; never-certified sorts first, then
            # least-recently-certified (automatic rotation)
            last = last_hash.get(name)
            group = 1 if last is None else 2
            return (group, last or 0, reg_order[name])
        last = last_rows.get(name)
        group = 3 if last is None else 4
        return (group, last or 0, reg_order[name])

    ordered = sorted(_REGISTRY, key=sort_key)
    # Reserve the window's last slots for the most-starved rows-only
    # queries (headliners excluded — a rows-only headliner is already
    # in the window). ``ordered`` already ranks rows-only by
    # never-rows-green-then-least-recently, so the first few are
    # exactly the starved ones.
    reserved = [
        n
        for n in ordered
        if _REGISTRY[n].oracle is None and n not in head_rank
    ][:ROWS_ONLY_SLOTS]
    if reserved and len(ordered) > WINDOW:
        rest = [n for n in ordered if n not in reserved]
        cut = WINDOW - len(reserved)
        ordered = rest[:cut] + reserved + rest[cut:]
    return {name: _REGISTRY[name] for name in ordered}
