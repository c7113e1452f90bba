"""Exact z-score outlier detection — anomaly screening with ZERO floating
point.

The textbook |v − µ| > 3σ test is fp-laden (mean, variance, sqrt). Cross-
multiplying removes all of it: with integer-scaled values ``vi`` and group
moments ``n, S = Σvi, Q = Σvi²``,

    (vi − S/n)² > 9·(Q/n − (S/n)²)   ⟺   (vi·n − S)² > 9·(n·Q − S²)

— both sides exact integers (Spark DECIMAL(38,0) / DuckDB HUGEINT), so the
flag is bit-identical across engines and immune to summation order. The
same shape every scaled metric screen should use; population variance,
current point included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scaled(df: DataFrame, key_col: str, val_col: str, id_col: str, scale: int) -> DataFrame:
    vi = (F.col(val_col).cast("decimal(18,4)") * scale).cast("decimal(38,0)")
    return df.select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key"), vi.alias("vi")
    )


def moment_partials(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    scale: int = 10_000,
) -> DataFrame:
    """Exact per-key moment partials → ``(key, n, s, q)`` as
    DECIMAL(38,0): count, Σvi, Σvi² over ``scale``-scaled values.
    ADDITIVELY mergeable (sum each column) and order-free — the shard-
    local / per-micro-batch state of the streaming anomaly screen
    (streaming/moments.py), same mergeability contract as the HLL/CMS
    register families."""
    base = _scaled(df, key_col, val_col, id_col, scale)
    return base.groupBy("key").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("vi").alias("s"),
        F.sum(F.col("vi") * F.col("vi")).alias("q"),
    )


def flag_against_moments(
    df: DataFrame,
    moments: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    n_sigma: int = 3,
    scale: int = 10_000,
) -> DataFrame:
    """Classify rows against EXTERNAL moments (see module docstring) →
    ``(id, key, is_outlier)``. ``moments`` must be ``(key, n, s, q)``
    with the same ``scale``; keys absent from ``moments`` are dropped
    (no baseline — nothing to deviate from)."""
    base = _scaled(df, key_col, val_col, id_col, scale)
    lhs_root = F.col("vi") * F.col("n") - F.col("s")
    lhs = lhs_root * lhs_root
    rhs = F.lit(n_sigma * n_sigma).cast("decimal(38,0)") * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    return base.join(F.broadcast(moments), "key").select(
        "id", "key", (lhs > rhs).cast("bigint").alias("is_outlier")
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    n_sigma: int = 3,
    scale: int = 10_000,
) -> DataFrame:
    """→ ``(id, key, is_outlier)`` per row, flag = 1 when the row's value
    is more than ``n_sigma`` population standard deviations from its
    group mean — computed entirely in exact integer arithmetic (see
    module docstring).

    One hash agg over the groups (tiny) broadcast-joined back — the
    two-pass shape; at 100 TB both passes are map-heavy scans and the
    join-back side is |groups| rows.
    """
    mom = moment_partials(df, key_col, val_col, id_col, scale)
    return flag_against_moments(df, mom, key_col, val_col, id_col, n_sigma, scale)
