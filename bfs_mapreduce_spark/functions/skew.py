"""Skew-handling utilities (SURVEY §4.3: "salted keys for skewed
vertices" — the manual fallback when AQE's skew-join splitting isn't
available, e.g. bucketed/co-partitioned pipelines or RDD-land).

The pattern: a hot join key concentrates one partition; salting
splits the hot key's rows across ``n_salts`` sub-keys (fact side gets
a deterministic salt, dimension side is replicated once per salt), so
the join fans the hot key over n_salts tasks at the cost of an
n_salts-times-larger (usually tiny) dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str,
    n_salts: int = 8,
    spread_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⋈ dims ON on`` with the fact side salted into
    ``n_salts`` sub-keys.

    ``spread_col`` names a fact column whose hash spreads rows of one
    key across salts (deterministic → reproducible plans); defaults to
    a per-row partition-local id, which is NOT stable across reruns —
    pass a real column when results feed a hash-compared pipeline.
    Output columns = the usual join output (salt column dropped).
    """
    if spread_col is not None:
        salt = F.pmod(F.xxhash64(spread_col), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    f = facts.withColumn(_SALT, salt)
    d = dims.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        _SALT, F.col(_SALT).cast("bigint")
    )
    return f.join(d, [on, _SALT], how).drop(_SALT)


# ---------------------------------------------------------------- catalog entry

from pyspark.sql import SparkSession  # noqa: E402

from bfs_mapreduce_spark.registry import register  # noqa: E402
from bfs_mapreduce_spark.sources.readers import load_table  # noqa: E402


@register(
    "q_skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Salted skew join as a catalog query: the fact side (events) "
    "gets a deterministic per-row salt (xxhash64 of event_id), the "
    "dimension side is replicated once per salt, and the join fans any "
    "hot user over n_salts tasks. Salting is semantics-preserving, so "
    "the oracle is the PLAIN join — the hash match proves the "
    "rewritten plan changes distribution, never results.",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dims = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(events, dims, on="user_id", n_salts=8, spread_col="event_id")
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
