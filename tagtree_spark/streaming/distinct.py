"""Streaming distinct counting — continuous HLL (operators/sketch.py) over
a micro-batch stream: each batch contributes its register partial as an
O(m)-row segment; the live estimate is a merge-on-read max over segments.

This is the streaming twin of RollupSink's continuous aggregate: state per
group is 64 register rows regardless of stream volume (the whole point of
the sketch at 100 TB — a COUNT(DISTINCT) over a stream would hold every
key), the per-batch write is O(distinct buckets in batch) ≤ m, replay is
idempotent by segment naming, and compaction re-aggregates (max composes,
like the rollup's decimal sums — losslessly).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.sketch import (
    hll_estimate_from_registers,
    hll_registers,
)
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class DistinctSink:
    """foreachBatch sink maintaining per-group HLL register segments for
    ``col`` (grouped by ``group_cols``)."""

    def __init__(self, store_path: str, col: str, group_cols: list[str] | None = None,
                 compact_every: int | None = 8):
        self.store_path = store_path
        self.col = col
        self.group_cols = group_cols or []
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_registers(spark, self.store_path, batch_id, self.group_cols)
        regs = hll_registers(batch_df, self.col, self.group_cols)
        regs.write.mode("overwrite").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )


def read_registers(
    spark: SparkSession, store_path: str, group_cols: list[str] | None = None,
    before_batch: int | None = None,
) -> DataFrame | None:
    """Merge-on-read: max over all completed segments' registers."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    raw = reduce(
        lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in segs)
    )
    return raw.groupBy(*(group_cols or []), "_b").agg(F.max("_m").alias("_m"))


def read_estimate(
    spark: SparkSession, store_path: str, group_cols: list[str] | None = None
) -> DataFrame | None:
    regs = read_registers(spark, store_path, group_cols)
    if regs is None:
        return None
    return hll_estimate_from_registers(regs, group_cols)


def compact_registers(
    spark: SparkSession, store_path: str, before_batch: int,
    group_cols: list[str] | None = None,
) -> None:
    """Fold register segments < before_batch into one base via max-merge —
    RE-AGGREGATING compaction (registers compose losslessly), same
    crash-safe base-then-delete order as the other segment stores."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_registers(spark, store_path, group_cols, before_batch=before_batch)
        if merged is None:
            return
        merged.write.mode("overwrite").parquet(base)
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)
