"""Streaming ROW-LEVEL change feed over the snapshot table format
(round 14) — the readStream twin of ``table_snapshots.
read_row_changes`` and the shape of Delta's ``readChangeFeed``:

    register_snapshot_row_changes_source(spark)
    feed = (spark.readStream.format("snapshot_row_changes")
                 .option("path", table_root)
                 .option("startingVersion", 0)
                 .load())
    # table columns + _change_type string + _commit_version bigint

Where the plain ``snapshot_changes`` stream REFUSES any non-append
commit (file-diff CDC is unsound across them), this source derives
each commit's CHANGED ROWS lazily from the metadata the format
already retains — position vectors and equality-delete key files are
immutable, so a delete/upsert commit's victims are exactly
reconstructible at read time with zero commit-time cost.

Per-commit change encoding:

- APPEND — the new files' rows as ``insert``.
- DELETE (position) — rows of each masked file AT the commit's NEW
  vector positions, as ``delete``. A (file, pos) is masked at most
  once ever (delete_where scans through existing vectors), so no
  prior-state check is needed.
- DELETE (equality) / UPSERT — victims = each applies-file's rows
  read through the PRIOR version's delete state (prior vectors +
  prior equality entries), then kept iff they match the commit's new
  keys — a row already dead before the commit never re-emits. The
  STREAM encodes an upsert as ``delete`` + ``insert`` (the classic
  changelog encoding): splitting the inserts into
  update_postimage/insert needs the GLOBAL matched-key set, which a
  per-file executor task cannot know and the driver must not compute
  with a Spark job inside the planning callback. The batch
  ``read_row_changes`` keeps the richer pre/post classification.
- Row-preserving rewrites (compact/optimize/repartition + every
  metadata-only op) contribute nothing by proof. A MERGE that wrote
  change files (round 16, the changeFeed property) streams them —
  one partition per change file, its pre/post images mapped onto the
  changelog encoding (preimage -> delete, postimage -> insert); a
  merge WITHOUT change files or a RESTORE fails the stream loudly,
  exactly like the batch derivation.

Scale posture: the driver plans O(range commits + changed files)
partition descriptors per trigger; each executor task reads ONE data
file plus the (tiny) vector/key files that concern it, applies the
masks/joins in Arrow, and streams record batches — row bytes never
pass through the driver. Offsets are table versions (the durable
cursor), so checkpoint resume is exact.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from bfs_mapreduce_spark.sources import table_snapshots as ts
from bfs_mapreduce_spark.sources.snapshot_changes_source import (
    _arrow_schema_for,
)

_ROW_PRESERVING = set(ts._ROW_PRESERVING_OPS)


class _RowChangePartition(InputPartition):
    """One executor task: one data file + the change metadata that
    concerns it. ``kind``:

    - ``insert``: emit every row of ``path``.
    - ``delete_pos``: emit rows of ``path`` AT the positions its
      entries in ``vector_files`` name.
    - ``victims``: emit rows of ``path`` surviving the PRIOR delete
      state (``prior_vectors`` + ``prior_eq``) that match
      ``key_files``'s keys on ``cols`` (physical names
      ``file_cols``), tagged ``change`` (delete for delete_eq, delete
      for the upsert's preimage half).
    - ``change_file`` (round 16): ``path`` is a merge-written change
      file — emit every row with its own ``_change_type``, image
      pairs mapped onto the changelog encoding.
    """

    def __init__(
        self,
        kind: str,
        path: str,
        version: int,
        change: str,
        arrow_schema,
        col_map: dict | None = None,
        vector_files: list[str] | None = None,
        key_files: list[str] | None = None,
        cols: list[str] | None = None,
        file_cols: list[str] | None = None,
        prior_vectors: list[str] | None = None,
        prior_eq: list[dict] | None = None,
    ):
        self.kind = kind
        self.path = path
        self.version = version
        self.change = change
        self.arrow_schema = arrow_schema
        self.col_map = col_map
        self.vector_files = vector_files or []
        self.key_files = key_files or []
        self.cols = cols or []
        self.file_cols = file_cols or []
        self.prior_vectors = prior_vectors or []
        self.prior_eq = prior_eq or []


class SnapshotRowChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("snapshot_row_changes source requires a path")
        cur = ts.current_version(self._root)
        from bfs_mapreduce_spark.sources.snapshot_changes_source import (
            _resolve_starting_version,
        )

        sv = _resolve_starting_version(options, self._root)
        if sv is None:
            self._start_v = cur
        else:
            if int(sv) > cur:
                raise ValueError(
                    f"startingVersion={int(sv)} is ahead of the table "
                    f"(currently v{cur})"
                )
            self._start_v = max(0, int(sv) - 1)
        # Admission control (round 15): maxFilesPerTrigger caps the
        # number of per-file change partitions admitted per batch,
        # VERSION-atomically — a commit's changes are one unit (an
        # upsert's delete+insert halves must never land in different
        # batches), so the cap admits whole versions until spent and
        # always admits at least one. Same drain recipe as the sibling
        # source for capped catch-up under availableNow.
        mf = options.get("maxFilesPerTrigger")
        self._max_files = int(mf) if mf is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        self._last_end: dict = {"v": self._start_v}
        self._parts_cache: dict[int, list] = {}
        m = ts.read_manifest(self._root)
        newest = m["files"][-1] if m["files"] else None
        self._schema_json = m.get("schema")
        self._schema_log = m.get("schema_log")
        # Whether the PINNED schema carries field ids: a stream's
        # output schema is fixed at start, so a schema change committed
        # mid-stream is only resolvable by field id (pinned names →
        # the newer era's physical names). Without ids the stream must
        # fail loudly on such a commit instead of NULL-filling.
        self._has_fids = bool(self._schema_json) and all(
            f.get("metadata", {}).get(ts._FID) is not None
            for f in json.loads(self._schema_json)["fields"]
        )
        base = _arrow_schema_for(self._schema_json, newest)
        import pyarrow as pa

        self._arrow_schema = pa.schema(
            list(base)
            + [
                pa.field("_change_type", pa.string(), nullable=True),
                pa.field("_commit_version", pa.int64(), nullable=True),
            ]
        )

    # offsets: whole table versions — every commit's changes are one
    # atomic unit, and the version number is the durable cursor
    def initialOffset(self) -> dict:
        return {"v": self._start_v}

    def latestOffset(self) -> dict:
        cur = ts.current_version(self._root)
        if self._max_files is None:
            return {"v": cur}
        # capped admission, version-atomic: admit whole commits until
        # the file budget is spent (at least one). A merge/restore
        # ahead plans uncapped so partitions() raises the informative
        # refusal instead of this walk.
        end = self._last_end["v"]
        budget = self._max_files
        v = end + 1
        while v <= cur:
            try:
                n = len(self._plan_version(v))
            except ValueError:
                return {"v": cur}
            if n > budget and end > self._last_end["v"]:
                break  # budget spent and at least one version admitted
            end = v
            budget -= n
            v += 1
            if budget <= 0:
                break
        return {"v": max(end, self._last_end["v"])}

    def commit(self, end: dict) -> None:
        # clamp the admission cursor (same rule as the sibling source:
        # after this no call order can re-admit committed versions)
        if end["v"] >= self._last_end["v"]:
            self._last_end = dict(end)
        self._parts_cache = {
            v: p for v, p in self._parts_cache.items() if v > end["v"]
        }

    def partitions(self, start: dict, end: dict):
        if end["v"] >= self._last_end["v"]:
            self._last_end = dict(end)  # restart replay teaches position
        out: list[_RowChangePartition] = []
        for v in range(start["v"] + 1, end["v"] + 1):
            out.extend(self._plan_version(v))
        return out

    def _plan_version(self, v: int) -> list:
        """Per-version change partitions, cached (planning is
        O(the commit's changed files); the admission walk and the
        batch that follows it share one plan)."""
        hit = self._parts_cache.get(v)
        if hit is not None:
            return hit
        out: list[_RowChangePartition] = []
        m = ts.read_manifest(self._root, v)
        # Era resolution uses THIS version's manifest state, never
        # the init-time snapshot: files committed after the stream
        # started are absent from the start manifest's _added_era
        # and would default to era 0 — on a renamed table that maps
        # pinned names onto the OLDEST era's physical names, which
        # post-rename parquet does not have (silent NULL-fill).
        vlog = m.get("schema_log") or self._schema_log
        vera = m.get("_added_era") or {}
        if vlog != self._schema_log and not self._has_fids:
            raise ValueError(
                f"snapshot_row_changes: v{v} carries a schema change "
                "committed after the stream started, and the "
                "stream's pinned schema has no field ids to resolve "
                "it — restart the stream to pick up the new schema"
            )
        mp = (
            ts.read_manifest(self._root, m["parent"])
            if m.get("parent")
            else {"version": 0, "files": []}
        )
        pfiles = set(mp["files"])
        op = m.get("operation") or (
            "append" if pfiles <= set(m["files"]) else "replace"
        )
        if op in _ROW_PRESERVING:
            self._parts_cache[v] = out
            return out
        if op == "merge" and m.get("change_files"):
            # round 16: a clause merge with the change feed on wrote
            # its row-level images at commit time — serve them under
            # this source's changelog encoding (update_preimage ->
            # delete, update_postimage -> insert). Era: the files
            # were written under the schema current at v.
            era_v = 0
            for ver, _sj in vlog or []:
                if ver <= v:
                    era_v = ver
                else:
                    break
            cmap = ts.era_col_map(self._schema_json, vlog, era_v)
            for f in m["change_files"]:
                out.append(
                    _RowChangePartition(
                        "change_file", f, v, "", self._arrow_schema, cmap
                    )
                )
            self._parts_cache[v] = out
            return out
        if op not in ("append", "delete", "upsert"):
            raise ValueError(
                f"snapshot_row_changes: v{v} is a {op} commit — "
                "row-level change derivation covers append/delete/"
                "upsert (and merges that wrote change files via the "
                "changeFeed property); this commit's effect set was "
                "not kept"
            )
        new_files = [f for f in m["files"] if f not in pfiles]
        old_eq_ids = {
            tuple(sorted(e["files"]))
            for e in mp.get("eq_deletes") or []
        }
        fresh_eq = [
            e
            for e in m.get("eq_deletes") or []
            if tuple(sorted(e["files"])) not in old_eq_ids
        ]
        prior_dv = mp.get("deletes") or {}
        prior_eq_all = mp.get("eq_deletes") or []

        def era_of(f: str, vlog=vlog, vera=vera) -> dict | None:
            return ts.era_col_map(
                self._schema_json, vlog, vera.get(f, 0)
            )

        for f in new_files:  # appends AND the upsert's insert half
            out.append(
                _RowChangePartition(
                    "insert", f, v, "insert", self._arrow_schema, era_of(f)
                )
            )
        old_dv = prior_dv
        for f, vecs in (m.get("deletes") or {}).items():
            fresh = [d for d in vecs if d not in set(old_dv.get(f, []))]
            if fresh:
                out.append(
                    _RowChangePartition(
                        "delete_pos", f, v, "delete",
                        self._arrow_schema, era_of(f),
                        vector_files=fresh,
                    )
                )
        for e in fresh_eq:
            for f in e["applies"]:
                out.append(
                    _RowChangePartition(
                        "victims", f, v, "delete",
                        self._arrow_schema, era_of(f),
                        key_files=list(e["files"]),
                        cols=list(e["cols"]),
                        file_cols=list(
                            e.get("file_cols") or e["cols"]
                        ),
                        prior_vectors=list(prior_dv.get(f, [])),
                        prior_eq=[
                            {
                                "files": pe["files"],
                                "cols": pe["cols"],
                                "file_cols": pe.get("file_cols")
                                or pe["cols"],
                            }
                            for pe in prior_eq_all
                            if f in pe["applies"]
                        ],
                    )
                )
        self._parts_cache[v] = out
        return out

    def read(self, partition: _RowChangePartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        p = partition
        tbl = pq.read_table(p.path)

        def keys_table(files: list[str], file_cols: list[str], cols: list[str]):
            return pa.concat_tables(
                [
                    pq.read_table(kf, columns=file_cols).rename_columns(cols)
                    for kf in files
                ]
            )

        def eq_mask(table, files, file_cols, cols) -> "pa.Array":
            """True where the row's key matches any key row (physical
            column names resolved through the era col map)."""
            cmap = p.col_map or {}
            phys = [cmap.get(c, c) for c in cols]
            keys = keys_table(files, file_cols, cols)
            if len(phys) == 1:
                hit = pc.is_in(
                    table.column(phys[0]), value_set=keys.column(cols[0])
                )
                return pc.fill_null(hit, False)
            key_set = set(
                zip(*(keys.column(c).to_pylist() for c in cols))
            )
            row_keys = zip(*(table.column(c).to_pylist() for c in phys))
            return pa.array([rk in key_set for rk in row_keys])

        change_arr = None
        if p.kind == "insert":
            pass  # every row
        elif p.kind == "change_file":
            # merge change files carry their own _change_type; map the
            # image pairs onto this source's changelog encoding
            raw = tbl.column("_change_type")
            step = pc.if_else(
                pc.equal(raw, "update_preimage"), pa.scalar("delete"), raw
            )
            change_arr = pc.if_else(
                pc.equal(step, "update_postimage"), pa.scalar("insert"), step
            )
        elif p.kind == "delete_pos":
            d = pa.concat_tables(
                [
                    pq.read_table(df_, columns=["file_path", "pos"])
                    for df_ in p.vector_files
                ]
            )
            mask = pc.equal(d.column("file_path"), p.path)
            pos = d.filter(mask).column("pos").to_numpy(zero_copy_only=False)
            keep = np.zeros(tbl.num_rows, dtype=bool)
            keep[pos[pos < tbl.num_rows]] = True
            tbl = tbl.filter(pa.array(keep))
        elif p.kind == "victims":
            # 1) survive the PRIOR delete state
            keep = np.ones(tbl.num_rows, dtype=bool)
            for dvf in p.prior_vectors:
                d = pq.read_table(dvf, columns=["file_path", "pos"])
                mask = pc.equal(d.column("file_path"), p.path)
                pos = d.filter(mask).column("pos").to_numpy(
                    zero_copy_only=False
                )
                keep[pos[pos < tbl.num_rows]] = False
            if not keep.all():
                tbl = tbl.filter(pa.array(keep))
            for pe in p.prior_eq:
                if tbl.num_rows == 0:
                    break
                tbl = tbl.filter(
                    pc.invert(
                        eq_mask(tbl, pe["files"], pe["file_cols"], pe["cols"])
                    )
                )
            # 2) keep rows matching the commit's NEW keys
            if tbl.num_rows:
                tbl = tbl.filter(
                    eq_mask(tbl, p.key_files, p.file_cols, p.cols)
                )
        else:  # pragma: no cover - planner emits only the three kinds
            raise ValueError(f"unknown partition kind {p.kind!r}")

        target = p.arrow_schema
        cmap = p.col_map or {}
        cols = []
        for field in target:
            if field.name == "_change_type":
                if change_arr is not None:
                    cols.append(change_arr.combine_chunks() if hasattr(
                        change_arr, "combine_chunks") else change_arr)
                else:
                    cols.append(
                        pa.array([p.change] * tbl.num_rows, type=pa.string())
                    )
            elif field.name == "_commit_version":
                cols.append(
                    pa.array([p.version] * tbl.num_rows, type=pa.int64())
                )
            else:
                src = cmap.get(field.name, field.name)
                if src is not None and src in tbl.column_names:
                    cols.append(tbl.column(src).cast(field.type))
                else:
                    cols.append(pa.nulls(tbl.num_rows, type=field.type))
        yield from pa.table(cols, schema=target).to_batches()


class SnapshotRowChangesDataSource(DataSource):
    """``spark.readStream.format("snapshot_row_changes")`` — streaming
    row-level change feed (insert/delete changelog encoding) over a
    snapshot table's commits."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_row_changes"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot_row_changes source requires a path")
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow as pa

        m = ts.read_manifest(root)
        newest = m["files"][-1] if m["files"] else None
        base = _arrow_schema_for(m.get("schema"), newest)
        return from_arrow_schema(
            pa.schema(
                list(base)
                + [
                    pa.field("_change_type", pa.string(), nullable=True),
                    pa.field("_commit_version", pa.int64(), nullable=True),
                ]
            )
        )

    def streamReader(self, schema) -> SnapshotRowChangesStreamReader:
        return SnapshotRowChangesStreamReader(self.options)


def register_snapshot_row_changes_source(spark) -> None:
    spark.dataSource.register(SnapshotRowChangesDataSource)


def drain_snapshot_row_changes(
    spark,
    root: str,
    checkpoint: str,
    for_each_batch,
    max_files_per_trigger: int | None = None,
    starting_version: int | None = 0,
    max_runs: int = 10_000,
) -> int:
    """Rate-limited catch-up over the ROW-LEVEL change feed as a loop
    of ``availableNow`` runs (round 15 — the same recipe as
    ``drain_snapshot_changes``, for the same documented API boundary:
    a capped Python DataSource under one availableNow run delivers
    exactly one batch). The cap is VERSION-ATOMIC: each admitted batch
    holds whole commits (an upsert's delete+insert halves never
    split), at least one per run. The checkpoint carries the version
    cursor, so the loop is exactly-once and kill/restart-safe.
    Returns the number of non-empty runs."""
    reader = (
        spark.readStream.format("snapshot_row_changes").option("path", root)
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", starting_version)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    runs = 0
    for _ in range(max_runs):
        seen = {"rows": 0, "batches": 0}

        def batch(df, bid, _seen=seen):
            n = df.count()
            _seen["rows"] += n
            _seen["batches"] += 1
            if n:
                for_each_batch(df, bid)

        q = (
            reader.load()
            .writeStream.foreachBatch(batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if seen["batches"] == 0:
            # no micro-batch ran: nothing new was admitted — converged.
            # (zero ROWS is NOT convergence: a capped run can admit a
            # row-preserving commit alone, or a no-match delete, and
            # stopping there would strand the rest of the history)
            return runs
        if seen["rows"]:
            runs += 1
    raise RuntimeError(
        f"drain did not converge in {max_runs} availableNow runs — "
        "is a writer outpacing the cap?"
    )
