"""Batch DataSource over the snapshot-manifest table format — the
``spark.read`` half of the lakehouse API surface (round 11):

    register_snapshot_source(spark)
    df = (spark.read.format("snapshot")
               .option("path", table_root)
               .option("versionAsOf", 3)      # optional time travel
               .load())

This is the DataSource-API twin of :func:`table_snapshots.read`
(which composes DataFrame ops on the driver): the driver plans one
input partition per live data file from the manifest alone, and each
EXECUTOR task streams its parquet file as Arrow batches, applying the
file's position-delete vectors (row-index mask) and any equality-
delete entries whose ``applies`` set names the file (key anti-filter)
before a row ever leaves the task — plus the pinned-schema projection
/ NULL-fill for pre-evolution files. Row bytes never pass through the
driver, and a file with no deletes pays neither join.

Why both paths exist: ``table_snapshots.read`` lets Catalyst see the
whole plan (pushdown through the anti-joins); this source makes the
format a first-class ``spark.read`` citizen a user can hand to ANY
Spark consumer that takes a format name, and it is the shape a
DSv2-style connector takes on a real deployment. The two are
certified row-identical by test and by the catalog query's oracle.

Scale posture: driver cost is O(files) manifest metadata; per-task
cost is one parquet scan + delete structures sized by THAT file's
masked rows / applicable keys, read directly by the executor.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from bfs_mapreduce_spark.sources import table_snapshots as ts
from bfs_mapreduce_spark.sources.snapshot_changes_source import (
    _arrow_schema_for,
)


class _SnapshotScanPartition(InputPartition):
    def __init__(
        self,
        path: str,
        arrow_schema,
        delete_files: list[str],
        eq_entries: list[dict],
        col_map: dict | None = None,
        extra_fields: list | None = None,
    ):
        self.path = path
        self.arrow_schema = arrow_schema
        self.delete_files = delete_files  # position-delete parquet files
        self.eq_entries = eq_entries  # [{"files": [...], "cols": [...]}]
        # era name mapping (round 13): {current_name: write-era name,
        # or None = NULL-fill} for files written before a RENAME/DROP;
        # None for the identity case
        self.col_map = col_map
        # eq-delete key fields pruned out by the `columns` option but
        # needed in-task for the anti-filter (round 18)
        self.extra_fields = extra_fields or []


def _resolve_as_of(options: dict, root: str) -> int:
    """versionAsOf / timestampAsOf (round 15, Delta parity) -> version
    number; mutually exclusive; default = current."""
    v = options.get("versionAsOf")
    t = options.get("timestampAsOf")
    if t is not None:
        if v is not None:
            raise ValueError(
                "versionAsOf and timestampAsOf are mutually exclusive"
            )
        try:
            ts_s = float(t)
        except ValueError:
            import datetime as _dt

            ts_s = _dt.datetime.fromisoformat(str(t)).timestamp()
        return ts.version_as_of(root, ts_s)
    return int(v) if v is not None else ts.current_version(root)


class SnapshotBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("snapshot source requires a path")
        self._version = _resolve_as_of(options, self._root)
        self._m = ts.read_manifest(self._root, self._version)
        # optional manifest-side partition pruning (round 12): a JSON
        # dict of partition-field -> required value; files whose
        # recorded partition tuple cannot match are never planned at
        # all — the earliest possible cut, upstream of footer stats
        pe = options.get("partitionEq")
        self._part_eq = json.loads(pe) if pe else None
        # SOURCE-column pruning across spec evolution (round 14): a
        # JSON dict of source column -> required value; each file
        # prunes under the spec it was WRITTEN with (spec_log eras) —
        # the DataSource twin of read_partition_pruned_src
        pse = options.get("partitionSrcEq")
        self._part_src_eq = json.loads(pse) if pse else None
        newest = self._m["files"][-1] if self._m["files"] else None
        full = _arrow_schema_for(self._m.get("schema"), newest)
        # scan-time column projection (round 18, optimization): the
        # Python DataSource API has no pruning pushdown, so without
        # this every scan reads, masks, and ships EVERY column across
        # the Arrow boundary even when the query consumes one (guide
        # §4: pass only the columns the function needs). `columns`
        # narrows the declared schema AND the per-file parquet read;
        # equality-delete KEY columns are still read when needed (the
        # anti-filter is applied before the final projection) but no
        # longer shipped unless requested.
        cols = options.get("columns")
        self._columns = json.loads(cols) if cols else None
        self._full_schema = full
        if self._columns is not None:
            import pyarrow as pa

            if not self._columns:
                raise ValueError("columns option must name at least one column")
            names = set(full.names)
            missing = [c for c in self._columns if c not in names]
            if missing:
                raise ValueError(f"columns not in table schema: {missing}")
            full = pa.schema([full.field(c) for c in self._columns])
        self._arrow_schema = full

    def partitions(self):
        m = self._m
        deletes = m.get("deletes") or {}
        eq = m.get("eq_deletes") or []
        files = m["files"]
        if self._part_eq:
            files, _ = ts.prune_partitions(m, self._part_eq)
        if self._part_src_eq:
            kept, _ = ts.prune_partitions_source(m, self._part_src_eq)
            keep = set(kept)
            files = [f for f in files if f in keep]
        added_era = m.get("_added_era") or {}
        cmap_by_era: dict[int, dict | None] = {}
        out = []
        for f in files:
            applicable = [
                {
                    "files": e["files"],
                    "cols": e["cols"],
                    # physical names in the immutable delete files when
                    # a key column was renamed after the delete
                    "file_cols": e.get("file_cols") or e["cols"],
                }
                for e in eq
                if f in e["applies"]
            ]
            era = added_era.get(f, 0)
            if era not in cmap_by_era:
                cmap_by_era[era] = ts.era_col_map(
                    m.get("schema"), m.get("schema_log"), era
                )
            # eq-delete keys the anti-filter needs but the projection
            # dropped: carried as extra fields, read + filtered in the
            # task, stripped before the batch leaves it
            extra = []
            if self._columns is not None:
                have = set(self._arrow_schema.names)
                need = {
                    c
                    for e in applicable
                    for c in e["cols"]
                    if c not in have
                }
                extra = [
                    self._full_schema.field(c)
                    for c in sorted(need)
                    if c in self._full_schema.names
                ]
            out.append(
                _SnapshotScanPartition(
                    f,
                    self._arrow_schema,
                    deletes.get(f, []),
                    applicable,
                    cmap_by_era[era],
                    extra_fields=extra,
                )
            )
        return out

    def read(self, partition: _SnapshotScanPartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # internal target = requested schema + any eq-delete key fields
        # the `columns` projection dropped (filtered on, then stripped)
        target = partition.arrow_schema
        for f in partition.extra_fields:
            target = target.append(f)
        cmap = partition.col_map or {}
        # read only the source columns the target needs that the file
        # actually has (guide §4: don't decode or ship dead columns);
        # one ParquetFile keeps a single footer parse for the
        # availability check + the read
        pf = pq.ParquetFile(partition.path)
        avail = set(pf.schema_arrow.names)
        wanted = []
        for field in target:
            src = cmap.get(field.name, field.name)
            if src is not None and src in avail and src not in wanted:
                wanted.append(src)
        tbl = pf.read(columns=wanted)
        keep = np.ones(tbl.num_rows, dtype=bool)
        # position deletes: the delete vectors hold (file_path, pos)
        # rows for possibly several data files — mask this file's rows
        for dv in partition.delete_files:
            d = pq.read_table(dv, columns=["file_path", "pos"])
            mask = pc.equal(d.column("file_path"), partition.path)
            pos = d.filter(mask).column("pos").to_numpy(zero_copy_only=False)
            keep[pos[pos < tbl.num_rows]] = False
        if not keep.all():
            tbl = tbl.filter(pa.array(keep))
        # pinned-schema projection + NULL-fill (schema evolution), era
        # name resolution included (round 13) — BEFORE eq filtering so
        # eq-delete key columns resolve by current names
        out_cols = []
        for field in target:
            src = cmap.get(field.name, field.name)
            if src is not None and src in tbl.column_names:
                out_cols.append(tbl.column(src).cast(field.type))
            else:
                out_cols.append(pa.nulls(tbl.num_rows, type=field.type))
        tbl = pa.table(out_cols, schema=target)
        # equality deletes: anti-filter on the entry's key columns
        for e in partition.eq_entries:
            cols = e["cols"]
            file_cols = e.get("file_cols") or cols
            keys = pa.concat_tables(
                [
                    pq.read_table(kf, columns=file_cols).rename_columns(cols)
                    for kf in e["files"]
                ]
            )
            if keys.num_rows == 0 or tbl.num_rows == 0:
                continue
            if len(cols) == 1:
                hit = pc.is_in(
                    tbl.column(cols[0]), value_set=keys.column(cols[0])
                )
                tbl = tbl.filter(pc.invert(pc.fill_null(hit, False)))
            else:
                # composite key: Arrow has no struct is_in kernel —
                # the key set is the (tiny) delete file, so a Python
                # tuple set over THIS file's rows is the honest path
                key_set = set(
                    zip(*(keys.column(c).to_pylist() for c in cols))
                )
                row_keys = zip(*(tbl.column(c).to_pylist() for c in cols))
                keep_rows = pa.array(
                    [rk not in key_set for rk in row_keys]
                )
                tbl = tbl.filter(keep_rows)
        if partition.extra_fields:  # strip the filter-only key columns
            tbl = tbl.select(partition.arrow_schema.names)
        yield from tbl.to_batches()


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot").option("path", root).load()`` —
    batch reads of a snapshot table, with optional ``versionAsOf`` /
    ``timestampAsOf`` time travel (round 15); both delete kinds and
    schema evolution are applied executor-side per file."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot source requires a path")
        from pyspark.sql.pandas.types import from_arrow_schema

        m = ts.read_manifest(root, _resolve_as_of(self.options, root))
        newest = m["files"][-1] if m["files"] else None
        full = _arrow_schema_for(m.get("schema"), newest)
        cols = self.options.get("columns")
        if cols:
            import pyarrow as pa

            requested = json.loads(cols)
            full = pa.schema([full.field(c) for c in requested])
        return from_arrow_schema(full)

    def reader(self, schema) -> SnapshotBatchReader:
        return SnapshotBatchReader(self.options)


def register_snapshot_source(spark) -> None:
    spark.dataSource.register(SnapshotDataSource)
