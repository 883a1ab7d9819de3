"""Round 16: table properties, persisted commit timestamps, auto
manifest-merge cadence, and the orphan-aware vacuum."""

import json
import os
import time

import pytest


def _mk(tmp_path, name):
    root = str(tmp_path / name)
    os.makedirs(root)
    return root


def test_set_property_carries_forward_and_unsets(spark, tmp_path):
    """SET TBLPROPERTIES is a metadata-only commit; every later commit
    carries the map; value=None unsets; set_property commits are
    row-preserving for CDC and rebase-safe for concurrent writers."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = _mk(tmp_path, "props")
    d = spark.range(4).toDF("k")
    v = ts.commit(root, ts.stage_files(d, root), base_version=0,
                  schema=d.schema.json())
    v = ts.set_property(root, "owner", "pipeline-a")
    assert ts.table_property(root, "owner") == "pipeline-a"
    # carried by a later plain append
    v = ts.commit(root, ts.stage_files(spark.range(4, 8).toDF("k"), root),
                  base_version=v)
    assert ts.table_property(root, "owner") == "pipeline-a"
    # file-diff CDC crosses the set_property commit (metadata-only)
    got = sorted(r["k"] for r in ts.read_changes(spark, root, 1, v).collect())
    assert got == [4, 5, 6, 7]
    # unset
    v = ts.set_property(root, "owner", None)
    assert ts.table_property(root, "owner") is None
    # history shows the ops
    ops = [h["operation"] for h in ts.history(root)]
    assert ops.count("set_property") == 2


def test_commit_timestamps_survive_mtime_rewrite(spark, tmp_path):
    """ADVICE (round 15): timestampAsOf / startingTimestamp / the
    vacuum race guard key off the stamp PERSISTED in the manifest, so
    an rsync/backup that rewrites mtimes cannot shift resolution."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = _mk(tmp_path, "stamps")
    d = spark.range(3).toDF("k")
    v1 = ts.commit(root, ts.stage_files(d, root), base_version=0,
                   schema=d.schema.json())
    t_mid = time.time()
    time.sleep(0.05)
    v2 = ts.commit(root, ts.stage_files(spark.range(3, 6).toDF("k"), root),
                   base_version=v1)
    # the stamp is in the payload, monotone
    assert ts.commit_timestamp(root, v2) >= ts.commit_timestamp(root, v1)
    m = json.loads(open(ts._manifest_path(root, v2)).read())
    assert m["ts"] == pytest.approx(ts.commit_timestamp(root, v2))
    # simulate a backup/restore: clobber every manifest mtime to NOW
    for v in (v1, v2):
        os.utime(ts._manifest_path(root, v), (time.time() + 999,) * 2)
    assert ts.version_as_of(root, t_mid) == v1          # unshifted
    assert ts.version_at_or_after(root, t_mid) == v2    # unshifted
    # retention policy by age also resolves off persisted stamps
    assert ts.retention_cutoff(root, max_age_s=time.time() - t_mid) == v2


def test_manifest_merge_cadence_bounds_segments(spark, tmp_path):
    """Verdict ask #3: with commit.rewrite-segments-every=K, the
    append path self-maintains — segment count stays bounded by K,
    the rewrite is CDC-transparent, and reads stay exact."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = _mk(tmp_path, "cadence")
    d = spark.range(2).toDF("k")
    v = ts.commit(root, ts.stage_files(d, root), base_version=0,
                  schema=d.schema.json())
    v = ts.set_property(root, "commit.rewrite-segments-every", 4)
    for i in range(1, 10):
        v = ts.commit(
            root,
            ts.stage_files(spark.range(2 * i, 2 * i + 2).toDF("k"), root),
            base_version=v,
        )
        segs = ts.read_manifest(root)["_segments"] or []
        assert len(segs) <= 4, f"cadence failed to bound segments: {len(segs)}"
    ops = [h["operation"] for h in ts.history(root)]
    assert "rewrite_manifests" in ops
    got = sorted(r["k"] for r in ts.read(spark, root).collect())
    assert got == list(range(20))
    # CDC-transparent: a file-diff range across the whole history
    # sees exactly the appended rows, no double counting
    changed = ts.read_changes(spark, root, 1, ts.current_version(root))
    assert sorted(r["k"] for r in changed.collect()) == list(range(2, 20))


def test_vacuum_orphans_grace_window(spark, tmp_path):
    """Verdict ask #6: a writer killed before its commit leaves staged
    parquet no manifest references. Default vacuum never touches it
    (it is indistinguishable from an in-flight stager's file);
    vacuum(orphans=True) deletes it once older than the grace window,
    while a concurrently-staging writer's FRESH files provably survive
    the window guard."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "orph")
    os.makedirs(root)
    d = spark.range(4).toDF("k")
    ts.commit(root, ts.stage_files(d, root), base_version=0,
              schema=d.schema.json())
    # writer killed pre-commit: staged but never referenced
    dead = ts.stage_files(spark.range(4, 8).toDF("k"), root)
    # age the dead files past the grace window
    old = time.time() - 10 * 24 * 3600
    for p in dead:
        os.utime(p, (old, old))
    # a SECOND in-flight writer staged fresh files just now
    fresh = ts.stage_files(spark.range(8, 12).toDF("k"), root)

    # default vacuum: no orphan is touched, committed data intact
    deleted = ts.vacuum(root, retain_from=1)
    assert deleted == []
    assert all(os.path.exists(p) for p in dead + fresh)

    # orphan sweep: dead files (older than grace) go; fresh survive
    deleted = ts.vacuum(root, retain_from=1, orphans=True,
                        orphan_grace_s=24 * 3600)
    assert set(deleted) == set(dead)
    assert all(os.path.exists(p) for p in fresh)
    # the in-flight writer's commit still lands and reads exactly
    v = ts.commit(root, fresh, base_version=1)
    got = sorted(r["k"] for r in ts.read(spark, root).collect())
    assert got == [0, 1, 2, 3, 8, 9, 10, 11]
    # dry_run previews the same set without deleting
    more = ts.stage_files(spark.range(20, 22).toDF("k"), root)
    for p in more:
        os.utime(p, (old, old))
    preview = ts.vacuum(root, retain_from=1, orphans=True,
                        orphan_grace_s=24 * 3600, dry_run=True)
    assert set(preview) == set(more) and all(os.path.exists(p) for p in more)


def test_restore_carries_properties_and_stamp(spark, tmp_path):
    """RESTORE keeps the CURRENT head's properties (table config is
    not data state being rolled back) and stamps a persisted commit
    time like every writer."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = _mk(tmp_path, "restprops")
    d = spark.range(3).toDF("k")
    v1 = ts.commit(root, ts.stage_files(d, root), base_version=0,
                   schema=d.schema.json())
    v2 = ts.commit(root, ts.stage_files(spark.range(3, 6).toDF("k"), root),
                   base_version=v1)
    v3 = ts.set_property(root, "changeFeed", True)
    v4 = ts.restore(root, v1)
    assert ts.table_property(root, "changeFeed") is True
    m = json.loads(open(ts._manifest_path(root, v4)).read())
    assert m["ts"] >= ts.commit_timestamp(root, v3)
    got = sorted(r["k"] for r in ts.read(spark, root).collect())
    assert got == [0, 1, 2]


def test_manifest_merge_cadence_streaming_transparent(spark, tmp_path):
    """Verdict ask #3's done-criterion: the cadence's metadata-only
    rewrites are invisible to a STREAMING CDC reader — every appended
    row delivered exactly once across collapse points."""
    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = _mk(tmp_path, "cadstream")
    ck = str(tmp_path / "ck")
    d = spark.range(2).toDF("k")
    v = ts.commit(root, ts.stage_files(d, root), base_version=0,
                  schema=d.schema.json())
    v = ts.set_property(root, "commit.rewrite-segments-every", 3)

    got = []

    def run():
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .option("startingVersion", 0)
            .load()
            .writeStream.foreachBatch(
                lambda b, _i: got.extend(r["k"] for r in b.collect())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sorted(got) == [0, 1]
    # 8 appends: cadence fires twice in the window; resume mid-history
    for i in range(1, 9):
        v = ts.commit(
            root,
            ts.stage_files(spark.range(2 * i, 2 * i + 2).toDF("k"), root),
            base_version=v,
        )
        if i == 4:
            run()  # mid-window drain straddles a rewrite point
    run()
    assert sorted(got) == list(range(18)), sorted(got)
    assert "rewrite_manifests" in [h["operation"] for h in ts.history(root)]
