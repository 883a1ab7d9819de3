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
)

from bfs_mapreduce_spark.sources.stream_files import FileArrivalStreamReader


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


class EdgeListStreamReader(FileArrivalStreamReader):
    """Streaming half of the edgelist source: each micro-batch delivers
    the edges of files that arrived since the last offset. Offset
    semantics (bounded watermark + lateness window, exact
    ``readBetweenOffsets`` replay) live in the shared
    ``FileArrivalStreamReader`` (sources/stream_files.py) — the same
    machinery the avro_py source streams with."""

    def _parse_file(self, path: str):
        return _parse_edge_file(path)
