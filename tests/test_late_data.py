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
