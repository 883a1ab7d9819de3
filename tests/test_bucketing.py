"""Physical-layout scale stories, proved by plan inspection:

- bucketed tables co-locate join keys at write time → the join runs
  with NO exchange at all (at 100 TB this is the difference between
  re-shuffling the fact table every query and never shuffling it);
- partitioned writes prune at the directory level → a filtered scan
  reads only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bfs_mapreduce_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_smoke_dir, tmp_path):
    orders = load_table(spark, sf_smoke_dir, "orders")
    lineitem = load_table(spark, sf_smoke_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path so the assertion is about bucketing,
        # not about broadcast making the question moot
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        ))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        n = j.agg(F.sum("n")).collect()[0][0]
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_partitions(spark, sf_smoke_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_smoke_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert back.count() == want
