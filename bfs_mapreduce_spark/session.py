"""SparkSession factory.

One place to pin the configs that matter for correctness (UTC
timestamps for oracle parity) and scale (AQE, Arrow, sane shuffle
partition counts). On a real cluster the same builder is used — only
``master`` and the partition counts change (pass ``shuffle_partitions``
sized to ~2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "bfs_mapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are local-mode friendly; on a cluster, ``master`` comes
    from spark-submit and ``shuffle_partitions`` should be ~2-3x the
    total executor core count. AQE re-coalesces at runtime either way,
    so the static number only has to be an upper bound.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # AQE coalesces DOWN only — the static count is a hard UPPER
        # bound on shuffle granularity, so at x100-scale shuffles
        # (300M-row edge joins) 32 partitions means ~10M rows each and
        # disk spill. SPARK_GRAFT_SHUFFLE_PARTITIONS raises the bound
        # for stress runs (round 17); the default stays core-count for
        # the certified small-SF profile.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
        ) or cpus or (os.cpu_count() or 8)
    # In local mode the driver JVM IS the executor; Spark's 1g default
    # heap caps the workload far below the host (measured: a 15 M-edge
    # BFS OOMs at 1g, runs at 12g). Only effective at JVM launch —
    # getOrCreate on a live session keeps the old heap.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # sort-merge->broadcast conversion. Essential at 100 TB, free locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # UTC so timestamp semantics match the DuckDB oracle (naive-UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores ts as TIMESTAMP(NANOS): read as int64,
        # converted to TIMESTAMP_NTZ in sources.readers.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for every pandas UDF / toPandas hop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
