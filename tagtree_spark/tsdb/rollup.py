"""Hierarchical time rollups — the hypertable "continuous aggregate"
pattern: aggregate samples once at a fine resolution, then answer every
coarser resolution FROM the fine rollup instead of rescanning raw samples.

The reference stores raw samples only (its index serves series selection;
downsampling lives downstream in Prometheus). At 100 TB the rollup ladder
is the difference between a dashboard query scanning 100 TB of raw points
and scanning a few GB of 5-minute aggregates — this is the Spark-native
form of that ladder.

Cross-engine discipline: every aggregate kept in the ladder is
re-aggregatable (count/sum/min/max — sum as DECIMAL so coarsening is
order-independent); avg is derived at the end as one sum/count division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_samples(samples: DataFrame, minutes: int) -> DataFrame:
    """Fine-grained rollup: ``(tsid, bucket_start, n, v_sum DECIMAL,
    v_min, v_max)`` with ``bucket_start`` = epoch-seconds floor of the
    bucket. One groupBy with map-side partial aggregation; at scale the
    output is partitioned by time bucket (natural partition pruning for
    range queries)."""
    secs = int(minutes) * 60
    bucket = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % secs).cast("bigint")
    return (
        samples.select("tsid", bucket.alias("bucket_start"), "value")
        .groupBy("tsid", "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("v_sum"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


def coarsen_rollup(fine: DataFrame, fine_minutes: int, coarse_minutes: int) -> DataFrame:
    """Re-aggregate a fine rollup to a coarser resolution WITHOUT touching
    raw samples — count/sum/min/max compose exactly (sum is DECIMAL, so
    the regrouping is order-independent and bit-identical to aggregating
    the raw points directly)."""
    if coarse_minutes % fine_minutes != 0:
        raise ValueError("coarse resolution must be a multiple of the fine one")
    secs = int(coarse_minutes) * 60
    bucket = (F.col("bucket_start") - F.col("bucket_start") % secs).cast("bigint")
    return (
        fine.select(
            "tsid", bucket.alias("bucket_start"), "n", "v_sum", "v_min", "v_max"
        )
        .groupBy("tsid", "bucket_start")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v_sum").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )
