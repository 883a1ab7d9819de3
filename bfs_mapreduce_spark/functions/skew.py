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
