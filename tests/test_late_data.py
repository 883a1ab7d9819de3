"""Watermark semantics: rows arriving later than the watermark bound
must be dropped from finalized windows (append mode), on-time rows in
open windows must land. Two-micro-batch file stream, deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_late_rows_below_watermark_are_dropped(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    sink = "late_data_sink"

    from datetime import datetime

    def mk(rows):
        parsed = [
            (datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), u, v) for ts, u, v in rows
        ]
        return spark.createDataFrame(parsed, "ts timestamp, user_id bigint, value double")

    # batch 1: 10:00-13:59 — after processing, watermark ≈ 13:59 - 30min = 13:29,
    # so the 10:00 and 11:00 windows are finalized
    batch1 = mk(
        [
            ("2024-01-01 10:00:10", 1, 1.0),
            ("2024-01-01 10:20:00", 1, 1.0),
            ("2024-01-01 11:05:00", 2, 1.0),
            ("2024-01-01 13:59:00", 2, 1.0),
        ]
    )
    batch1.coalesce(1).write.mode("append").parquet(src)  # ONE file: one micro-batch

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one LATE row into the finalized 10:00 window (must be
        # dropped) + one on-time row opening the 14:00 window
        mk(
            [
                ("2024-01-01 10:30:00", 3, 1.0),  # late: watermark is 13:29
                ("2024-01-01 14:10:00", 3, 1.0),
            ]
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # advance watermark past 15:00 so the 14:00 window finalizes and
        # append mode emits it
        mk([("2024-01-01 16:00:00", 4, 1.0)]).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start"].strftime("%H:%M"): r["n"]
        for r in spark.table(sink).collect()
    }
    assert got["10:00"] == 2  # late 10:30 row NOT counted
    assert got["11:00"] == 1
    assert got["14:00"] == 1  # on-time row landed


def test_session_windows_merge_across_shuffled_micro_batches(spark, tmp_path):
    """Session windows + watermark under event-time disorder ACROSS
    micro-batches — the classic silent-wrongness spot (VERDICT r04
    item 4): a session's events arrive scattered over >=3 micro-batches
    and out of chronological order, including a bridge event that
    arrives two batches late and must MERGE two already-open session
    intervals into one. Oracle = the same gaps-and-islands computed
    serially over the full event set (>= 30-min gap starts a session,
    matching session_window's half-open interval)."""
    from datetime import datetime, timedelta

    from bfs_mapreduce_spark.streaming.windows import session_counts

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    sink = "session_disorder_sink"

    def t(hhmm: str) -> datetime:
        return datetime.strptime(f"2024-01-01 {hhmm}:00", "%Y-%m-%d %H:%M:%S")

    # (ts, user): user 1's 10:00 and 10:50 open as TWO intervals in
    # batch 1; the 10:25 bridge lands two batches later and must merge
    # them. User 2's events are shuffled across all three batches with
    # a backwards jump (09:30 arrives after 10:50 has been seen).
    batches = [
        [(t("10:00"), 1), (t("10:50"), 1), (t("10:05"), 2)],
        [(t("09:30"), 2), (t("11:20"), 2)],
        [(t("10:25"), 1), (t("11:00"), 2), (t("10:10"), 3)],
        # sentinel: advances the watermark a day so every real session
        # finalizes and append mode emits it (excluded from comparison)
        [(t("10:00") + timedelta(days=1), 99)],
    ]
    all_events = [e for b in batches[:-1] for e in b]

    # serial gaps-and-islands oracle over the complete, ordered set
    expected: set[tuple[int, str, int]] = set()
    by_user: dict[int, list[datetime]] = {}
    for ts, u in sorted(all_events):
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        start, n = tss[0], 1
        for prev, cur in zip(tss, tss[1:]):
            if cur - prev >= timedelta(minutes=30):
                expected.add((u, start.strftime("%H:%M"), n))
                start, n = cur, 1
            else:
                n += 1
        expected.add((u, start.strftime("%H:%M"), n))

    def write_batch(rows):
        spark.createDataFrame(rows, "ts timestamp, user_id bigint").coalesce(
            1
        ).write.mode("append").parquet(src)

    write_batch(batches[0])
    stream = spark.readStream.schema("ts timestamp, user_id bigint").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    # 3h watermark: the cross-batch disorder stays on-time by design —
    # this test pins merge-correctness, not late-drop (covered above)
    q = (
        session_counts(stream, watermark="3 hours")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            write_batch(b)
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["session_start"].strftime("%H:%M"), r["n_events"])
        for r in spark.table(sink).collect()
        if r["user_id"] != 99
    }
    assert got == expected, f"got {sorted(got)}, expected {sorted(expected)}"
    # the bridged session is present as ONE 3-event interval
    assert (1, "10:00", 3) in got
