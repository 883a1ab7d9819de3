"""salted_join must be a drop-in equi-join replacement: identical
results, hot key spread across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from bfs_mapreduce_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # one hot key (90% of rows) + a long tail
    facts = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dims = spark.createDataFrame(
        [(1, "hot"), (19, "cold19"), (29, "cold29")], "k bigint, label string"
    )
    return facts, dims


def test_salted_join_matches_plain_join(spark):
    facts, dims = _skewed_frames(spark)
    plain = facts.join(dims, "k").groupBy("k", "label").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        salted_join(facts, dims, on="k", n_salts=8, spread_col="fact_id")
        .groupBy("k", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_actually_spreads_the_hot_key(spark):
    facts, _ = _skewed_frames(spark)
    salt = F.pmod(F.xxhash64("fact_id"), F.lit(8))
    per_salt = (
        facts.filter(F.col("k") == 1)
        .withColumn("s", salt)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(per_salt) == 8  # hot key present in every salt bucket
    counts = [r["n"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly even
