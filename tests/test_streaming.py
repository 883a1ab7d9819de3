"""Streaming/batch parity: each streaming operator run to completion
(AvailableNow) must equal its batch twin on the same staged events."""

from __future__ import annotations

from pyspark.sql import functions as F

from bfs_mapreduce_spark.sources.readers import load_table
from bfs_mapreduce_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    running_user_counts,
    session_counts,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_batch_parity(spark, sf_smoke_dir):
    streamed = run_to_memory(tumbling_counts(events_stream(spark, sf_smoke_dir)))
    batch = (
        load_table(spark, sf_smoke_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_session_batch_parity(spark, sf_smoke_dir):
    from pyspark.sql import Window

    streamed = run_to_memory(session_counts(events_stream(spark, sf_smoke_dir)))
    ev = load_table(spark, sf_smoke_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    is_new = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) >= 1_800_000_000), 1
    ).otherwise(0)
    batch = (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .withColumn("session_id", F.sum("is_new").over(wcum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stateful_running_counts(spark, sf_smoke_dir):
    streamed = run_to_memory(
        running_user_counts(events_stream(spark, sf_smoke_dir)), output_mode="update"
    )
    # update mode: the LAST row per user carries the final running count
    final = (
        streamed.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, sf_smoke_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_foreachbatch_sink_round_trip(spark, sf_smoke_dir, tmp_path):
    """foreachBatch: arbitrary per-micro-batch sink logic (here: append
    parquet + collect batch sizes); totals must match the source."""
    out = str(tmp_path / "fb_out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))
        batch_df.write.mode("append").parquet(out)

    src = events_stream(spark, sf_smoke_dir).select("event_id", "user_id", "value")
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total_src = load_table(spark, sf_smoke_dir, "events").count()
    assert sum(n for _, n in seen) == total_src
    assert spark.read.parquet(out).count() == total_src


def test_stream_state_linear_in_keys_not_events(spark, tmp_path):
    """run_stream_scale's claim (BASELINE.md round-9 table): stateful
    streaming state grows with KEYS, never with events. The custom
    stateful counter's state rows must equal cumulative distinct keys
    per batch — including the final repeated-key batch, where events
    keep flowing but state must not grow — and the session-window
    leg's state must stay watermark-bounded (~current batch's
    sessions), not cumulative."""
    from bfs_mapreduce_spark.benchmarks import run_stream_scale

    ramp = [(2_000, 100), (2_000, 200), (2_000, 200)]
    recs = {r["op"]: r for r in run_stream_scale(spark, ramp, str(tmp_path))}

    counts = recs["running_user_counts"]["batches"]
    data_batches = [b for b in counts if b["rows_in"]]
    assert [b["state_rows"] for b in data_batches] == [100, 200, 200]
    assert data_batches[-1]["state_rows_updated"] == 200  # keys touched,
    # yet zero NEW state rows: 2000 more events, state unchanged
    assert sum(b["rows_in"] for b in data_batches) == 6_000
    assert all(b["state_bytes"] > 0 for b in data_batches)

    sessions = recs["session_counts"]["batches"]
    # watermark eviction: final state holds only the last batch's
    # sessions (200), never the cumulative 500 the ramp produced
    assert sessions[-1]["state_rows"] <= 400
    assert max(b["state_rows"] for b in sessions) < 500


def test_stream_dedup_ingest_checkpoint_recovery(spark, sf_smoke_dir, tmp_path):
    """The fault-tolerance half of the streaming-ingest story: the
    stream is KILLED mid-run — by an injected failure AFTER batch 1's
    store commit but BEFORE its checkpoint offset commit, the worst
    at-least-once window — then restarted from the same checkpoint.
    Recovery must redeliver batch 1 (its offsets never committed),
    ingest_batch's replay-safety must swallow the duplicate delivery,
    and the final store must equal a single-shot control run document
    for document and compacted link for link."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bfs_mapreduce_spark.operators.dedup_incremental import (
        compact_store,
        ingest_batch,
        init_store,
    )

    mb = 2
    docs = load_table(spark, sf_smoke_dir, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0]
    b1, b2 = hi // 3, (2 * hi) // 3
    splits = [
        docs.filter(F.col("doc_id") <= b1),
        docs.filter((F.col("doc_id") > b1) & (F.col("doc_id") <= b2)),
        docs.filter(F.col("doc_id") > b2),
    ]
    chunks = str(tmp_path / "chunks")
    for i, part in enumerate(splits):
        part.coalesce(1).write.mode("overwrite").parquet(f"{chunks}/chunk_{i}.parquet")

    streamed = str(tmp_path / "store_streamed")
    control = str(tmp_path / "store_control")
    init_store(spark, splits[0], streamed)
    init_store(spark, splits[0], control)

    ckpt = str(tmp_path / "ckpt")  # survives across the restart
    crashed = {"done": False}

    def fold_poison(batch, bid):
        ingest_batch(spark, batch, streamed, max_bucket_rows=mb)
        if bid == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash: store committed, offsets not")

    def make_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{chunks}/*")
        )

    q = (
        make_stream()
        .writeStream.foreachBatch(fold_poison)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    assert crashed["done"]

    q2 = (
        make_stream()
        .writeStream.foreachBatch(
            lambda b, _i: ingest_batch(spark, b, streamed, max_bucket_rows=mb)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    # single-shot control: same three batches, one process, no crash
    for part in splits:
        ingest_batch(spark, part, control, max_bucket_rows=mb)

    a = spark.read.parquet(f"{streamed}/shingles").select("doc_id")
    b = spark.read.parquet(f"{control}/shingles").select("doc_id")
    assert a.join(b, "doc_id", "left_anti").count() == 0
    assert b.join(a, "doc_id", "left_anti").count() == 0
    # no duplicated store rows from the replayed batch
    assert a.count() == a.distinct().count() == b.count()
    la = compact_store(spark, streamed, max_bucket_rows=mb)
    lb = compact_store(spark, control, max_bucket_rows=mb)
    assert la.join(lb, ["doc_a", "doc_b"], "left_anti").count() == 0
    assert lb.join(la, ["doc_a", "doc_b"], "left_anti").count() == 0


def test_stream_state_semantics_identical_on_rocksdb(spark, tmp_path):
    """The RocksDB state-store backend (the disk-spilling provider a
    100 TB key cardinality needs) must report the SAME state-rows
    semantics as the default in-heap store on the same ramp — state
    tracks cumulative distinct keys exactly, repeated-key batches add
    zero rows — and the provider conf must be restored afterwards."""
    from bfs_mapreduce_spark.benchmarks import run_stream_scale

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    ramp = [(1_000, 50), (1_000, 100), (1_000, 100)]
    recs = {
        r["op"]: r
        for r in run_stream_scale(
            spark, ramp, str(tmp_path), state_store="rocksdb"
        )
    }
    assert all(r["state_store"] == "rocksdb" for r in recs.values())
    counts = [
        b
        for b in recs["running_user_counts"]["batches"]
        if b["rows_in"]
    ]
    assert [b["state_rows"] for b in counts] == [50, 100, 100]
    assert sum(b["rows_in"] for b in counts) == 3_000
    assert spark.conf.get(key, None) == before  # conf restored


def test_snapshot_txn_guard_idempotent(spark, tmp_path):
    """The (app_id, batch_id) txn action: published by the same
    pointer swap as the data, carried forward by later commits, and
    monotone — the guard a foreachBatch writer uses to swallow
    at-least-once redelivery."""
    import os

    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    df = spark.range(10).withColumnRenamed("id", "k")
    assert ts.last_txn(root, "app") == -1
    v1 = ts.commit(
        root, ts.stage_files(df, root), base_version=0, txn=("app", 0)
    )
    assert ts.last_txn(root, "app") == 0
    # a non-streaming commit in between carries the txn forward
    v2 = ts.commit(root, ts.stage_files(df, root), base_version=v1)
    assert ts.last_txn(root, "app") == 0 and ts.last_txn(root, "other") == -1
    # the writer-side guard: replayed batch 0 is skipped, batch 1 lands
    for bid in (0, 1):
        if ts.last_txn(root, "app") >= bid:
            continue
        ts.commit(
            root,
            ts.stage_files(df, root),
            base_version=ts.current_version(root),
            txn=("app", bid),
        )
    assert ts.current_version(root) == v2 + 1  # exactly one new commit
    assert ts.last_txn(root, "app") == 1


def test_avro_stream_sink_replay_is_idempotent(spark, sf_smoke_dir, tmp_path):
    """The avro_py streaming sink's exactly-once contract: rerunning
    the WHOLE stream from a fresh checkpoint (at-least-once
    redelivery of every batch) rewrites the same deterministic
    (batch, partition) file names instead of duplicating rows, and no
    in-flight tmp files remain visible."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources.avro_py import register_avro_source
    from bfs_mapreduce_spark.streaming.windows import events_stream

    register_avro_source(spark)
    out = str(tmp_path / "sink")

    def run_once(ckpt):
        stream = events_stream(spark, sf_smoke_dir).select(
            "event_id", "user_id", "event_type"
        )
        q = (
            stream.writeStream.format("avro_py")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(str(tmp_path / "ckpt1"))
    first = sorted(os.path.basename(p) for p in _glob.glob(f"{out}/*.avro"))
    n_first = spark.read.format("avro_py").load(f"{out}/*.avro").count()
    # full redelivery: fresh checkpoint, same sink
    run_once(str(tmp_path / "ckpt2"))
    second = sorted(os.path.basename(p) for p in _glob.glob(f"{out}/*.avro"))
    assert second == first  # deterministic names, overwritten in place
    back = spark.read.format("avro_py").load(f"{out}/*.avro")
    assert back.count() == n_first
    assert back.agg(F.countDistinct("event_id")).first()[0] == n_first
    assert not _glob.glob(f"{out}/.inflight-*")  # no visible tmp litter


def test_snapshot_changes_stream_source(spark, tmp_path):
    """Round-11 CDC streaming source (snapshot_changes): offsets are
    table versions; a fresh start with startingVersion=0 delivers the
    whole history exactly once; a checkpoint resume delivers only new
    commits; a REPLACE commit in range fails the stream with the batch
    read_changes refusal; schema evolution NULL-fills old files."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for i in range(3):
        ts.commit(
            root,
            ts.stage_files(
                spark.range(i * 10, i * 10 + 10).toDF("k"), root
            ),
            base_version=i,
        )
    got = []

    def run(ckpt):
        stream = (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .option("startingVersion", 0)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: got.append(sorted(r["k"] for r in b.collect()))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ckpt = str(tmp_path / "ckpt")
    run(ckpt)
    assert sorted(k for ks in got for k in ks) == list(range(30))

    # schema evolution: v4 appends with an extra column; the stream's
    # NEXT run (fresh checkpoint, evolved schema) NULL-fills old files
    evolved = spark.range(100, 103).select(
        F.col("id").alias("k"), F.lit(7).cast("bigint").alias("extra")
    )
    ts.commit(
        root,
        ts.stage_files(evolved, root),
        base_version=3,
        schema=evolved.schema.json(),
    )
    got.clear()
    rows = []
    stream2 = (
        spark.readStream.format("snapshot_changes")
        .option("path", root)
        .option("startingVersion", 0)
        .load()
    )
    q = (
        stream2.writeStream.foreachBatch(
            lambda b, bid: rows.extend(
                (r["k"], r["extra"]) for r in b.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(rows) == 33
    assert {e for k, e in rows if k < 100} == {None}  # NULL-filled
    assert {e for k, e in rows if k >= 100} == {7}

    # resume from the ORIGINAL checkpoint delivers only v4's rows
    run(ckpt)
    assert got == [[100, 101, 102]]

    # a compaction in range fails the stream loudly
    ts.compact(spark, root, n_files=1)
    with pytest.raises(Exception, match="(?i)replace|append-only"):
        run(str(tmp_path / "ckpt3"))


def test_snapshot_changes_starting_version_inclusive(spark, tmp_path):
    """Round-12 contract fix: startingVersion=N is INCLUSIVE (Delta's
    contract — replay from commit N's own changes), not an exclusive
    lower bound; a user porting Delta readStream code keeps commit N's
    rows. 0 and 1 both mean full history; ahead-of-table still fails."""
    import os

    import pytest

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for i in range(3):
        ts.commit(
            root,
            ts.stage_files(spark.range(i * 10, i * 10 + 10).toDF("k"), root),
            base_version=i,
        )

    def collect_from(sv, ckpt):
        got = []
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .option("startingVersion", sv)
            .load()
            .writeStream.foreachBatch(
                lambda b, _bid: got.extend(r["k"] for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(got)

    assert collect_from(2, "c2") == list(range(10, 30))  # v2 INCLUDED
    assert collect_from(3, "c3") == list(range(20, 30))
    assert collect_from(1, "c1") == list(range(30))
    assert collect_from(0, "c0") == list(range(30))  # 0 = full history
    with pytest.raises(Exception):
        collect_from(4, "c4")


def test_snapshot_changes_skip_change_commits(spark, tmp_path):
    """Round-12 (verdict ask #5): skipChangeCommits — Delta's opt-in
    escape hatch — lets a CDC stream ride THROUGH a compaction: the
    REPLACE commit contributes nothing (its rewritten files would
    double-deliver every compacted row), appends before and after are
    delivered exactly once. Fail-by-default stands without the option
    (pinned by test_snapshot_changes_stream_source)."""
    import os

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = 0
    for i in (0, 1):
        v = ts.commit(
            root,
            ts.stage_files(spark.range(i * 10, i * 10 + 10).toDF("k"), root),
            base_version=v,
        )

    def run(ckpt):
        got = []
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .option("startingVersion", 0)
            .option("skipChangeCommits", "true")
            .load()
            .writeStream.foreachBatch(
                lambda b, _bid: got.extend(r["k"] for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(got)

    # consume the first two appends, checkpointing
    assert run("ck") == list(range(20))
    # the table compacts itself, then appends more
    ts.compact(spark, root, n_files=1)
    v = ts.commit(
        root,
        ts.stage_files(spark.range(20, 30).toDF("k"), root),
        base_version=ts.current_version(root),
    )
    # resume from the SAME checkpoint: only the new append arrives —
    # the compaction's rewritten files are not re-delivered
    assert run("ck") == list(range(20, 30))
    # a fresh full-history read with the option also sees each row once
    assert run("ck_fresh") == list(range(30))


def test_snapshot_changes_rate_limit_offsets_unit(spark, tmp_path):
    """Round-13 (verdict ask #4) — the admission-control math, unit
    level: maxFilesPerTrigger splits one large commit across offsets
    of (version, file-index); planning derives an append's additions
    from its FRESH manifest segments (never a full-table resolution —
    the ADVICE O(K*F) fix); slicing [start, end] mid-commit delivers
    exactly the indexed files."""
    import os

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources import snapshot_changes_source as scs

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = ts.commit(
        root,
        ts.stage_files(spark.range(50).toDF("k").repartition(5), root),
        base_version=0,
    )
    v = ts.commit(
        root,
        ts.stage_files(spark.range(50, 70).toDF("k").repartition(2), root),
        base_version=v,
    )
    r = scs.SnapshotChangesStreamReader(
        {"path": root, "startingVersion": "0", "maxFilesPerTrigger": "2"}
    )
    # full-resolution reads only at init: additions planning must stay
    # O(appended files) — raw manifests + fresh segments
    n_res = {"n": 0}
    orig = ts.read_manifest

    def counting(root_, version=None):
        n_res["n"] += 1
        return orig(root_, version)

    ts.read_manifest = counting
    try:
        offs = [r.initialOffset()]
        while True:
            nxt = r.latestOffset()
            if nxt == offs[-1]:
                break
            parts = r.partitions(offs[-1], nxt)
            assert 1 <= len(parts) <= 2
            offs.append(nxt)
    finally:
        ts.read_manifest = orig
    assert n_res["n"] == 0
    # 7 files / cap 2 -> 4 batches; commit 1 split at indexes 2 and 4
    assert offs == [
        {"v": 0},
        {"v": 1, "i": 2},
        {"v": 1, "i": 4},
        {"v": 2, "i": 1},
        {"v": 2},
    ]
    # every staged file delivered exactly once across the slices
    seen = []
    for a, b in zip(offs, offs[1:]):
        seen += [p.path for p in r.partitions(a, b)]
    want = r._additions(1) + r._additions(2)
    assert seen == want and len(set(seen)) == 7

    # byte cap: 1 byte -> one file per batch (at least one always)
    rb = scs.SnapshotChangesStreamReader(
        {"path": root, "startingVersion": "0", "maxBytesPerTrigger": "1"}
    )
    first = rb.latestOffset()
    assert first == {"v": 1, "i": 1}
    assert len(rb.partitions({"v": 0}, first)) == 1


def test_snapshot_changes_rate_limited_stream_and_midcommit_resume(
    spark, tmp_path
):
    """Round-13 (verdict ask #4), end to end: a 5-file commit streamed
    under maxFilesPerTrigger=2 spreads across micro-batches; stopping
    after one batch checkpoints MID-COMMIT, and the restarted query
    keeps honoring the cap (the replayed partitions() call re-teaches
    the reader its position before the next latestOffset). The final
    frame equals the batch read_changes. Note: Trigger.AvailableNow
    snapshots ONE capped latestOffset as its end target (Python
    DataSource API has no admission-control hook), so draining under a
    cap takes repeated runs — Trigger.Once here, one batch per run."""
    import os

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    ts.commit(
        root,
        ts.stage_files(spark.range(50).toDF("k").repartition(5), root),
        base_version=0,
    )
    batches = []

    def run_once():
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", root)
            .option("startingVersion", 0)
            .option("maxFilesPerTrigger", 2)
            .load()
            .writeStream.foreachBatch(
                lambda b, _bid: batches.append(sorted(r["k"] for r in b.collect()))
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()

    # expected batch sizes: sums of per-file row counts in manifest
    # order, two files per batch (repartition need not split evenly)
    import pyarrow.parquet as pq

    files = ts.read_manifest(root)["files"]
    n = [pq.ParquetFile(f).metadata.num_rows for f in files]
    run_once()  # batch 0: 2 files, checkpoint now mid-commit
    assert [len(b) for b in batches] == [n[0] + n[1]]
    run_once()  # restart mid-commit: cap still enforced
    assert [len(b) for b in batches] == [n[0] + n[1], n[2] + n[3]]
    run_once()  # the commit's last file
    assert [len(b) for b in batches] == [n[0] + n[1], n[2] + n[3], n[4]]
    # exactly-once union, equal to the batch CDC read
    got = sorted(k for b in batches for k in b)
    want = sorted(
        r["k"] for r in ts.read_changes(spark, root, 0, 1).collect()
    )
    assert got == want == list(range(50))


def test_drain_snapshot_changes_capped_catchup(spark, tmp_path):
    """Round-14: drain_snapshot_changes loops capped availableNow runs
    from ONE checkpoint — the supported recipe for the documented
    availableNow/admission-control API boundary. Exactly-once across
    the whole drain, one capped slice per run, resumable mid-drain."""
    import os

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_changes_source import (
        drain_snapshot_changes,
        register_snapshot_changes_source,
    )

    register_snapshot_changes_source(spark)
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = 0
    for i in range(3):
        v = ts.commit(
            root,
            ts.stage_files(
                spark.range(i * 10, (i + 1) * 10).toDF("k").repartition(2),
                root,
            ),
            base_version=v,
        )
    got = []
    ck = str(tmp_path / "ck")
    runs = drain_snapshot_changes(
        spark,
        root,
        ck,
        lambda df, bid: got.extend(r["k"] for r in df.collect()),
        max_files_per_trigger=2,
    )
    # 6 files / cap 2 -> 3 non-empty runs; every row exactly once
    assert runs == 3
    assert sorted(got) == list(range(30))
    # resumable: new commits drain from the SAME checkpoint, old rows
    # never redelivered
    ts.commit(
        root,
        ts.stage_files(spark.range(30, 35).toDF("k"), root),
        base_version=v,
    )
    more = []
    runs2 = drain_snapshot_changes(
        root=root,
        spark=spark,
        checkpoint=ck,
        for_each_batch=lambda df, bid: more.extend(
            r["k"] for r in df.collect()
        ),
        max_files_per_trigger=2,
    )
    assert runs2 >= 1
    assert sorted(more) == list(range(30, 35))


def test_snapshot_row_changes_stream(spark, tmp_path):
    """Round-14 streaming row-level change feed: the readStream twin
    of read_row_changes (upserts encoded delete+insert). Lifecycle
    deltas exact, dead rows never re-emit, checkpoint RESUME picks up
    exactly the new commits, row-preserving rewrites contribute
    nothing, merge fails the stream loudly."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_row_changes_source import (
        register_snapshot_row_changes_source,
    )

    register_snapshot_row_changes_source(spark)
    root = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    os.makedirs(root)

    def run():
        got = []
        q = (
            spark.readStream.format("snapshot_row_changes")
            .option("path", root)
            .option("startingVersion", 0)
            .load()
            .writeStream.foreachBatch(
                lambda b, _i: got.extend(
                    (r["_commit_version"], r["_change_type"], r["k"], r["v"])
                    for r in b.collect()
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(got)

    d1 = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    ts.commit(
        root, ts.stage_files(d1, root), base_version=0, schema=d1.schema.json()
    )
    ts.delete_where(spark, root, "k >= 4")
    src = spark.createDataFrame([(1, 111), (9, 999)], "k bigint, v bigint")
    ts.upsert_eq(spark, root, src, ["k"])
    assert run() == [
        (1, "insert", 0, 0), (1, "insert", 1, 10), (1, "insert", 2, 20),
        (1, "insert", 3, 30), (1, "insert", 4, 40), (1, "insert", 5, 50),
        (2, "delete", 4, 40), (2, "delete", 5, 50),
        (3, "delete", 1, 10),
        (3, "insert", 1, 111), (3, "insert", 9, 999),
    ]
    # resume from the SAME checkpoint: only the NEW commits stream —
    # an eq-delete targeting live AND dead keys emits live victims only
    ts.delete_eq(
        spark, root, spark.createDataFrame([(2,), (4,)], "k bigint")
    )
    ts.compact(spark, root)  # row-preserving: contributes nothing
    assert run() == [(4, "delete", 2, 20)]
    # a merge fails the stream loudly (effect set needs change files)
    ts.merge_into(
        spark, root, spark.createDataFrame([(9, 1)], "k bigint, v bigint"), ["k"]
    )
    with pytest.raises(Exception, match="replace commit"):
        run()


def test_snapshot_changes_midstream_rename_resolves_new_files(
    spark, tmp_path
):
    """Round-15 (ADVICE): a RENAME committed AFTER the stream reader
    starts must not NULL-fill. The reader pins its output schema at
    init; files appended post-rename carry the new physical name, and
    era resolution must go through the VERSION's own schema log (the
    init-time log lacks the rename entry entirely). Unit-level: one
    reader instance lives across the rename, exactly the mid-stream
    window a real query occupies between init and latestOffset."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import snapshot_changes_source as scs
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    d1 = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    ts.commit(
        root, ts.stage_files(d1, root), base_version=0, schema=d1.schema.json()
    )
    r = scs.SnapshotChangesStreamReader({"path": root, "startingVersion": "0"})
    assert [f.name for f in r._arrow_schema] == ["k", "v"]
    # the rename and a post-rename append land AFTER the reader started
    ts.rename_column(root, "v", "val")
    d2 = spark.range(10, 13).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    ts.commit(
        root,
        ts.stage_files(d2, root),
        base_version=ts.current_version(root),
        schema=d2.schema.json(),
    )
    rows = []
    for p in r.partitions({"v": 0}, {"v": ts.current_version(root)}):
        for b in r.read(p):
            rows.extend(b.to_pylist())
    # output stays under the PINNED names; post-rename rows resolve by
    # field id to the new physical name — no silent NULL-fill
    got = sorted((x["k"], x["v"]) for x in rows)
    assert got == [(i, i * 10) for i in (0, 1, 2, 10, 11, 12)]
    # without field ids the same situation must fail loudly, never
    # NULL-fill (a stream cannot re-pin its schema mid-run)
    r2 = scs.SnapshotChangesStreamReader(
        {"path": root, "startingVersion": "0"}
    )
    ts.rename_column(root, "val", "w")
    r2._has_fids = False  # simulate a legacy pinned schema without ids
    d3 = spark.range(20, 21).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    ts.commit(
        root,
        ts.stage_files(d3, root),
        base_version=ts.current_version(root),
        schema=d3.schema.json(),
    )
    with pytest.raises(ValueError, match="schema change"):
        r2.partitions({"v": 0}, {"v": ts.current_version(root)})


def test_snapshot_row_changes_midstream_rename_and_deletes(spark, tmp_path):
    """Round-15 (ADVICE, high): the row-level change feed's era
    resolution must come from each version's OWN manifest — a file
    committed after the stream started is absent from the init-time
    _added_era and used to default to era 0, NULL-filling the renamed
    column for every post-rename insert/delete. Covers all three
    partition kinds (insert, position delete, eq-delete victims)
    against post-rename files."""
    import os

    import pytest

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import snapshot_row_changes_source as srcs
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    d1 = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    ts.commit(
        root, ts.stage_files(d1, root), base_version=0, schema=d1.schema.json()
    )
    r = srcs.SnapshotRowChangesStreamReader(
        {"path": root, "startingVersion": "0"}
    )
    assert [f.name for f in r._arrow_schema][:2] == ["k", "v"]
    # rename + post-rename commits land while the reader lives
    ts.rename_column(root, "v", "val")
    d2 = spark.range(10, 14).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val")
    )
    ts.commit(
        root,
        ts.stage_files(d2, root),
        base_version=ts.current_version(root),
        schema=d2.schema.json(),
    )
    ts.delete_where(spark, root, "k = 10")  # position delete, new file
    ts.delete_eq(
        spark, root, spark.createDataFrame([(11,)], "k bigint")
    )  # eq-delete victims read from the post-rename file
    rows = []
    for p in r.partitions({"v": 0}, {"v": ts.current_version(root)}):
        for b in r.read(p):
            rows.extend(b.to_pylist())
    got = sorted(
        (x["_commit_version"], x["_change_type"], x["k"], x["v"])
        for x in rows
    )
    assert got == [
        (1, "insert", 0, 0), (1, "insert", 1, 10), (1, "insert", 2, 20),
        (3, "insert", 10, 100), (3, "insert", 11, 110),
        (3, "insert", 12, 120), (3, "insert", 13, 130),
        (4, "delete", 10, 100),
        (5, "delete", 11, 110),
    ]


def test_transform_with_state_refusal_is_still_genuine():
    """Round-15 (verdict ask #5): Spark 4's transformWithStateInPandas
    is the successor stateful API (typed state variables, timers,
    TTL), and the engine's refusal to adopt it is an ENVIRONMENT
    boundary, not a design choice: its Python worker speaks protobuf
    to the JVM state server and this container ships no usable
    google.protobuf (a live probe dies with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE from
    `from google.protobuf import descriptor`). This canary pins both
    halves — the API must exist, and the dependency must still be
    missing. The day protobuf appears, this test FAILS and the swap
    in streaming/windows.py's docstring (groupBy().
    transformWithStateInPandas with a 3-method StatefulProcessor for
    running_user_counts) becomes due."""
    import importlib

    from pyspark.sql.pandas.group_ops import PandasGroupedOpsMixin

    assert hasattr(PandasGroupedOpsMixin, "transformWithStateInPandas")
    assert hasattr(PandasGroupedOpsMixin, "transformWithState")
    try:
        importlib.import_module("google.protobuf.descriptor")
        usable = True
    except ImportError:
        usable = False
    assert not usable, (
        "google.protobuf is importable now: adopt "
        "transformWithStateInPandas for running_user_counts (see the "
        "API-generation note in bfs_mapreduce_spark/streaming/"
        "windows.py) and certify it like q_stream_stateful_counts"
    )


def test_snapshot_row_changes_rate_limited_drain(spark, tmp_path):
    """Round-15: the row-level change feed takes maxFilesPerTrigger —
    version-ATOMIC admission (an upsert's delete+insert never split
    across batches), at least one commit per batch — and
    drain_snapshot_row_changes loops capped availableNow runs from ONE
    checkpoint, exactly-once, resumable."""
    import os

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_row_changes_source import (
        drain_snapshot_row_changes,
        register_snapshot_row_changes_source,
    )

    register_snapshot_row_changes_source(spark)
    root = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    os.makedirs(root)
    d1 = spark.range(6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    ts.commit(
        root, ts.stage_files(d1.repartition(2), root),
        base_version=0, schema=d1.schema.json(),
    )
    ts.delete_where(spark, root, "k >= 4")
    ts.upsert_eq(
        spark, root,
        spark.createDataFrame([(1, 111), (9, 999)], "k bigint, v bigint"),
        ["k"],
    )
    batches: list[list] = []
    runs = drain_snapshot_row_changes(
        spark, root, ck,
        lambda df, bid: batches.append(
            sorted(
                (r["_commit_version"], r["_change_type"], r["k"])
                for r in df.collect()
            )
        ),
        max_files_per_trigger=1,
    )
    # cap 1 + version atomicity -> one commit per run, three runs
    assert runs == 3
    versions_per_batch = [{t[0] for t in b} for b in batches]
    assert all(len(vs) == 1 for vs in versions_per_batch)
    flat = sorted(t for b in batches for t in b)
    assert flat == [
        (1, "insert", 0), (1, "insert", 1), (1, "insert", 2),
        (1, "insert", 3), (1, "insert", 4), (1, "insert", 5),
        (2, "delete", 4), (2, "delete", 5),
        (3, "delete", 1), (3, "insert", 1), (3, "insert", 9),
    ]
    # the upsert's delete+insert halves landed in ONE batch
    b3 = next(b for b, vs in zip(batches, versions_per_batch) if vs == {3})
    assert {t[1] for t in b3} == {"delete", "insert"}
    # resume from the same checkpoint: only new commits drain
    ts.delete_eq(spark, root, spark.createDataFrame([(2,)], "k bigint"))
    more: list[tuple] = []
    runs2 = drain_snapshot_row_changes(
        spark, root, ck,
        lambda df, bid: more.extend(
            (r["_change_type"], r["k"]) for r in df.collect()
        ),
        max_files_per_trigger=1,
    )
    assert runs2 == 1 and sorted(more) == [("delete", 2)]


def test_cdc_sources_starting_timestamp(spark, tmp_path):
    """Round-15 Delta parity: both CDC sources take startingTimestamp
    (epoch seconds or ISO-8601), resolved to the first version
    committed at or after it; mutually exclusive with startingVersion;
    a future timestamp starts at the head with nothing to replay."""
    import os
    import time

    import pytest

    from bfs_mapreduce_spark.sources import snapshot_changes_source as scs
    from bfs_mapreduce_spark.sources import snapshot_row_changes_source as srcs
    from bfs_mapreduce_spark.sources import table_snapshots as ts

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    v = ts.commit(
        root, ts.stage_files(spark.range(3).toDF("k"), root), base_version=0
    )
    t_mid = time.time()
    # ensure the next commit's mtime lands strictly after t_mid
    time.sleep(0.05)
    ts.commit(
        root,
        ts.stage_files(spark.range(3, 6).toDF("k"), root),
        base_version=v,
    )
    assert ts.version_at_or_after(root, 0.0) == 1
    assert ts.version_at_or_after(root, t_mid) == 2
    assert ts.version_at_or_after(root, time.time() + 60) == 3  # head+1
    # file-level source: replay starts at the resolved version
    r = scs.SnapshotChangesStreamReader(
        {"path": root, "startingTimestamp": str(t_mid)}
    )
    rows = []
    for p in r.partitions(r.initialOffset(), r.latestOffset()):
        for b in r.read(p):
            rows.extend(x["k"] for x in b.to_pylist())
    assert sorted(rows) == [3, 4, 5]
    # row-level source: same resolution
    rr = srcs.SnapshotRowChangesStreamReader(
        {"path": root, "startingTimestamp": str(t_mid)}
    )
    rows2 = []
    for p in rr.partitions(rr.initialOffset(), rr.latestOffset()):
        for b in rr.read(p):
            rows2.extend(x["k"] for x in b.to_pylist())
    assert sorted(rows2) == [3, 4, 5]
    # a FUTURE timestamp starts at the head: nothing to replay
    rf = scs.SnapshotChangesStreamReader(
        {"path": root, "startingTimestamp": str(time.time() + 60)}
    )
    assert rf.initialOffset() == rf.latestOffset()
    # mutual exclusion, same contract as Delta
    with pytest.raises(ValueError, match="mutually exclusive"):
        scs.SnapshotChangesStreamReader(
            {"path": root, "startingVersion": "1", "startingTimestamp": "0"}
        )
    # ISO-8601 form parses too
    import datetime as dt

    iso = dt.datetime.fromtimestamp(t_mid).isoformat()
    r_iso = srcs.SnapshotRowChangesStreamReader(
        {"path": root, "startingTimestamp": iso}
    )
    assert r_iso.initialOffset() == {"v": 1}


def test_row_changes_drain_survives_zero_row_batches(spark, tmp_path):
    """Round-15 review fix: a capped drain run can admit ONLY a
    row-preserving commit (zero change rows) when the next commit
    exceeds the budget — that batch must not read as convergence, or
    the rest of the history is silently stranded."""
    import os

    from pyspark.sql import functions as F

    from bfs_mapreduce_spark.sources import table_snapshots as ts
    from bfs_mapreduce_spark.sources.snapshot_row_changes_source import (
        drain_snapshot_row_changes,
        register_snapshot_row_changes_source,
    )

    register_snapshot_row_changes_source(spark)
    root = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    os.makedirs(root)
    d1 = spark.range(8).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    v = ts.commit(
        root, ts.stage_files(d1.repartition(4), root),
        base_version=0, schema=d1.schema.json(),
    )
    ts.compact(spark, root, n_files=4)  # v2: row-preserving, 0 changes
    d3 = spark.range(100, 108).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    ts.commit(
        root, ts.stage_files(d3.repartition(5), root),
        base_version=ts.current_version(root),
    )  # v3: 5 files — exceeds the budget right after the empty v2
    got: list[int] = []
    runs = drain_snapshot_row_changes(
        spark, root, ck,
        lambda df, bid: got.extend(r["k"] for r in df.collect()),
        max_files_per_trigger=4,
    )
    # the pre-fix behavior returned after the {v2} zero-row batch with
    # v3's rows undelivered
    assert sorted(got) == list(range(8)) + list(range(100, 108))
    assert runs == 2  # two non-empty runs; the empty v2 batch is free
