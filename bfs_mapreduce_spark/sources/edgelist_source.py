"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
for the reference's whitespace edge-list format (``Graph.py:2-16``,
format shown in ``Presentazione.pdf`` slide 24: one edge per line,
``FromNodeID ToNodeID``).

The engine's FAST path for edge lists is the JVM CSV reader
(``sources/readers.py:read_edge_list`` — sep-split + cast entirely in
whole-stage codegen); this source exists as the engine's demonstration
of the **extensible source surface**: a file format Spark has no
built-in reader for, implemented once against the DataSource API and
then consumed through the ordinary ``spark.read.format(...)`` front
door — schema projection, ``.filter`` and the rest of the plan compose
on top unchanged.

Scale posture: one input partition per file (a 100 TB edge corpus
arrives as many files on object storage, so the parallelism follows
the layout exactly like binaryFile's). Lines are parsed lazily per
partition in Python — acceptable for a custom-format on-ramp whose
output feeds a shuffle anyway; promote hot formats to a JVM reader
(as ``read_edge_list`` does for this one) when the scan itself is the
bottleneck. Blank lines and ``#`` comments are skipped; anything else
malformed raises rather than silently dropping edges.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class EdgeListDataSource(DataSource):
    """``spark.read.format("edgelist").load(path_or_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "edgelist"

    def schema(self) -> str:
        return "src bigint, dst bigint"

    def reader(self, schema) -> "EdgeListReader":
        return EdgeListReader(self.options)

    def simpleStreamReader(self, schema) -> "EdgeListStreamReader":
        return EdgeListStreamReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EdgeListReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("edgelist source requires a path")
        self._path = path

    def partitions(self):
        import glob
        import os

        if os.path.isdir(self._path):
            paths = sorted(glob.glob(os.path.join(self._path, "*")))
        else:
            paths = sorted(glob.glob(self._path)) or [self._path]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        yield from _parse_edge_file(partition.path)


def register_edgelist_source(spark) -> None:
    """Idempotent per-session registration (re-registering the same
    name is an error in Spark 4, so remember sessions we've done)."""
    done = getattr(spark, "_edgelist_source_registered", False)
    if not done:
        spark.dataSource.register(EdgeListDataSource)
        spark._edgelist_source_registered = True


def _parse_edge_file(path: str):
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            parts = s.split()
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{lineno}: expected 2 fields, got {len(parts)}"
                )
            yield int(parts[0]), int(parts[1])


class EdgeListStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the edgelist source: each micro-batch delivers
    the edges of files that arrived since the last offset.

    Offset design — BOUNDED, the pattern of Spark's own file source
    (high-watermark + lateness window) rather than an ever-growing
    seen-file list:

    - ``wm``: high-watermark = max ``st_mtime_ns`` ever ingested
      (-1 before the first file);
    - ``recent``: ``[name, mtime_ns]`` pairs of seen files whose mtime
      is within ``lateness`` seconds of the watermark — the only
      per-file state carried forward, so offset size is O(files per
      lateness window), NOT O(files ever seen);
    - ``batch``: the names ingested by the batch that PRODUCED this
      offset, making ``readBetweenOffsets`` an exact replay at
      O(batch) cost.

    A listed file is ingested iff it is not in ``recent`` and its
    mtime is not older than ``wm - lateness``. Consequences, all
    shared with Spark's file source: files are expected immutable once
    written (object-storage contract); a committed file that
    transiently vanishes from an eventually-consistent listing is not
    re-ingested when it reappears (it stays in ``recent`` until the
    watermark passes it, and reads as too-late after); and a file that
    first APPEARS with an mtime older than the lateness window is
    dropped as too-late — size ``lateness`` (option, seconds, default
    300) to the listing's consistency lag, not to zero.

    A nonexistent path or a glob matching nothing raises (the batch
    reader's contract: misconfiguration fails loudly, never an
    empty-forever stream) — an EXISTING empty directory is the one
    legitimate empty start, since arriving files are the entire
    point."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("edgelist source requires a path")
        self._path = path
        self._lateness_ns = int(float(options.get("lateness", "300")) * 1e9)

    def _files(self) -> list[tuple[str, int]]:
        """→ sorted [(path, mtime_ns)]; vanished-between-glob-and-stat
        files are skipped (they will list again or stay in recent)."""
        import glob
        import os

        if os.path.isdir(self._path):
            names = sorted(glob.glob(os.path.join(self._path, "*")))
        else:
            names = sorted(glob.glob(self._path))
            if not names:
                raise FileNotFoundError(
                    f"edgelist stream: no such path or no matches: {self._path!r}"
                )
        out = []
        for p in names:
            try:
                out.append((p, os.stat(p).st_mtime_ns))
            except FileNotFoundError:
                continue
        return out

    def initialOffset(self) -> dict:
        self._files()  # misconfigured path fails at stream start, not silently
        return {"wm": -1, "recent": [], "batch": []}

    def read(self, start: dict):
        wm = start["wm"]
        recent = {name: mt for name, mt in start["recent"]}
        cutoff = wm - self._lateness_ns
        new = sorted(
            (p, mt)
            for p, mt in self._files()
            if p not in recent and (wm < 0 or mt >= cutoff)
        )
        rows: list[tuple[int, int]] = []
        for p, _mt in new:
            rows.extend(_parse_edge_file(p))
        new_wm = max([wm, *(mt for _p, mt in new)])
        new_cutoff = new_wm - self._lateness_ns
        kept = {
            name: mt
            for name, mt in {**recent, **dict(new)}.items()
            if mt >= new_cutoff
        }
        return iter(rows), {
            "wm": new_wm,
            "recent": sorted([n, m] for n, m in kept.items()),
            "batch": sorted(p for p, _mt in new),
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list[tuple[int, int]] = []
        for p in end["batch"]:
            rows.extend(_parse_edge_file(p))
        return iter(rows)
