"""Data-layout optimization — Z-order clustering keys for multi-dimension
data skipping.

Sorting a table by a single column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of TWO columns
(Morton/Z-order) gives useful pruning on BOTH — the standard lakehouse
`OPTIMIZE ZORDER BY` layout, re-expressed as a plain integer expression so
it works anywhere a sort key does (write-time `sortWithinPartitions`,
bucketed table layouts, compaction rewrites).

Pure integer bit arithmetic → bit-identical cross-engine, and the
clustering effect is oracle-checkable: bucketing rows by z-key prefix must
yield TIGHT min/max ranges on both dimensions simultaneously (the q85
oracle asserts exactly that structure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the interleave (32-bit z-key total).
Z_BITS = 16


def zorder_key(x: str | Column, y: str | Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. Columns
    are masked into range first (callers with wider domains should
    range-bucket before interleaving, as real Z-ordering does)."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    cy = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    mask = (1 << bits) - 1
    cx = cx.bitwiseAND(F.lit(mask))
    cy = cy.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(cx, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(cy, i).bitwiseAND(F.lit(1))
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def duck_zorder_key(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB SQL fragment computing the same Morton key."""
    mask = (1 << bits) - 1
    parts = []
    for i in range(bits):
        parts.append(
            f"((({x} & {mask}) >> {i}) & 1) * {1 << (2 * i)}"
            f" + ((({y} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def zorder_bucket_profile(
    df: DataFrame, x: str, y: str, n_buckets: int = 16, bits: int = Z_BITS
) -> DataFrame:
    """Cluster rows into ``n_buckets`` by z-key range and profile each
    bucket's min/max on BOTH dimensions — the data-skipping evidence a
    layout job would record as file-level statistics. → ``(zbucket, n,
    min_x, max_x, min_y, max_y)``.

    The bucket span adapts to the OBSERVED z-key range (1-row broadcast
    max — exact integer arithmetic, so the adaptive split is still
    bit-identical cross-engine); a fixed 2^(2·bits) span would collapse a
    small key domain into one bucket."""
    z = zorder_key(x, y, bits)
    keyed = df.select(z.alias("_z"), F.col(x).alias("_x"), F.col(y).alias("_y"))
    mx = keyed.agg(F.max("_z").alias("_mz"))
    return (
        keyed.join(F.broadcast(mx))
        .select(
            F.expr(f"_z DIV greatest(1, (_mz + 1) DIV {n_buckets})").alias("zbucket"),
            "_x",
            "_y",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("_x").cast("bigint").alias("min_x"),
            F.max("_x").cast("bigint").alias("max_x"),
            F.min("_y").cast("bigint").alias("min_y"),
            F.max("_y").cast("bigint").alias("max_y"),
        )
    )
