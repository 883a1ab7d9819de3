"""Data-layout helpers: Z-order (Morton) clustering for multi-column
row-group pruning — the lakehouse technique (Delta OPTIMIZE ZORDER,
Hudi/Iceberg sort orders) that makes ONE physical sort serve range
filters on SEVERAL columns.

Why it matters at 100 TB: parquet row-group skipping works off per-
column min/max stats, which are only selective when the file layout
clusters that column. A linear sort clusters exactly one column; a
Z-order sort interleaves the bits of k normalized keys, so every file
covers a small hyper-rectangle and a filter on ANY of the keys skips
most row groups. ``q_sink_zorder`` (operators/sink_queries.py) proves
the effect from EXECUTED scan metrics, not theory.

Everything here is JVM-side bit arithmetic inside whole-stage codegen
— shiftleft / bitwiseAND / bitwiseOR expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(x: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of a 32-bit word
    (the classic Morton 'part-1-by-1' bit trick, unrolled)."""
    for shift, mask in _SPREAD_MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder2(a16: Column, b16: Column) -> Column:
    """Interleave two 16-bit integers into their 32-bit Morton code
    (``a`` on even bits, ``b`` on odd). The spread values are widened
    to bigint BEFORE the final shift: ``_spread16`` tops out at
    0x55555555, so ``shiftleft(.., 1)`` reaches 0xAAAAAAAA, which
    wraps negative in int32 and would split the sort order on
    ``b``'s MSB instead of being true Morton order."""
    return (
        _spread16(a16)
        .cast("bigint")
        .bitwiseOR(F.shiftleft(_spread16(b16).cast("bigint"), 1))
    )


def with_zorder(df: DataFrame, col_a: str, col_b: str, out: str = "zv") -> DataFrame:
    """Append a Morton code over two numeric columns, each min/max
    normalized to 16 bits IN-PLAN: the per-column bounds come from one
    aggregate crossJoined back as a single broadcast row (never a
    driver-side collect), so the whole thing is scan → 1-row agg →
    projection. NULLs map to bucket 0 (they cluster together at the
    low corner — the same choice Delta makes)."""
    bounds = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )

    def norm16(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        scaled = F.when(span <= 0, F.lit(0)).otherwise(
            ((F.col(c) - F.col(lo)) * 65535 / span).cast("int")
        )
        return F.coalesce(scaled, F.lit(0))

    return df.crossJoin(F.broadcast(bounds)).withColumn(
        out, zorder2(norm16(col_a, "_amin", "_amax"), norm16(col_b, "_bmin", "_bmax"))
    ).drop("_amin", "_amax", "_bmin", "_bmax")


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 32
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of
    (col_a, col_b): range-partition on the Morton code (so each of the
    ``n_files`` output files owns a compact Z-range = a small
    hyper-rectangle in (a, b) space) and sort within partitions for
    page-level locality. The code column itself is dropped — layout is
    physical, not schema."""
    zdf = with_zorder(df, col_a, col_b)
    (
        zdf.repartitionByRange(n_files, "zv")
        .sortWithinPartitions("zv")
        .drop("zv")
        .write.mode("overwrite")
        .parquet(path)
    )
