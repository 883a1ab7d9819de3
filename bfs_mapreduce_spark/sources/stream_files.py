"""Shared streaming-offset machinery for file-arrival Python
DataSources (the edgelist and avro_py sources both stream this way).

Offset design — BOUNDED, the pattern of Spark's own file source
(high-watermark + lateness window) rather than an ever-growing
seen-file list:

- ``wm``: high-watermark = max ``st_mtime_ns`` ever ingested
  (-1 before the first file);
- ``recent``: ``[name, mtime_ns]`` pairs of seen files whose mtime is
  within ``lateness`` seconds of the watermark — the only per-file
  state carried forward, so offset size is O(files per lateness
  window), NOT O(files ever seen);
- ``batch``: the names ingested by the batch that PRODUCED this
  offset, making ``readBetweenOffsets`` an exact replay at O(batch)
  cost.

A listed file is ingested iff it is not in ``recent`` and its mtime is
not older than ``wm - lateness``. Consequences, all shared with
Spark's file source: files are expected immutable once written
(object-storage contract); a committed file that transiently vanishes
from an eventually-consistent listing is not re-ingested when it
reappears; and a file that first APPEARS with an mtime older than the
lateness window is dropped as too-late — size ``lateness`` (option,
seconds, default 300) to the listing's consistency lag, not to zero.

A nonexistent path or a glob matching nothing raises (the batch
readers' contract: misconfiguration fails loudly, never an
empty-forever stream) — an EXISTING empty directory is the one
legitimate empty start, since arriving files are the entire point.
"""

from __future__ import annotations

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class FileArrivalStreamReader(SimpleDataSourceStreamReader):
    """Generic arriving-files stream reader. Subclasses set
    ``_dir_glob`` (pattern applied when the path is a directory) and
    implement ``_parse_file(path) -> iterable[tuple]``."""

    _dir_glob = "*"

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(f"{type(self).__name__}: source requires a path")
        self._path = path
        self._lateness_ns = int(float(options.get("lateness", "300")) * 1e9)

    def _parse_file(self, path: str):
        raise NotImplementedError

    def _files(self) -> list[tuple[str, int]]:
        """→ sorted [(path, mtime_ns)]; vanished-between-glob-and-stat
        files are skipped (they will list again or stay in recent)."""
        import glob
        import os

        if os.path.isdir(self._path):
            names = sorted(glob.glob(os.path.join(self._path, self._dir_glob)))
        else:
            names = sorted(glob.glob(self._path))
            if not names:
                raise FileNotFoundError(
                    f"{type(self).__name__}: no such path or no matches: "
                    f"{self._path!r}"
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
        rows: list[tuple] = []
        for p, _mt in new:
            rows.extend(self._parse_file(p))
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
        rows: list[tuple] = []
        for p in end["batch"]:
            rows.extend(self._parse_file(p))
        return iter(rows)
