"""Streaming anomaly baseline — continuous exact moments
(operators/anomaly.py) over a micro-batch stream: each batch contributes
its per-key ``(n, Σvi, Σvi²)`` partial as a tiny segment; the live
baseline is a merge-on-read SUM over segments (moments compose
ADDITIVELY and order-free — DECIMAL(38,0) integer sums, the rollup's
mergeability with the anomaly screen's exactness).

State per key is ONE row of three integers regardless of stream volume;
the per-batch write is O(|keys in batch|); replay is idempotent by
segment naming; compaction re-aggregates losslessly (sums compose) with
the same crash-safe base-then-delete order as the sibling sinks.
Arriving batches can be flagged against the PRE-batch baseline with
:func:`tagtree_spark.operators.anomaly.flag_against_moments` — the
streaming z-score screen with zero floating point.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.anomaly import moment_partials
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class MomentsSink:
    """foreachBatch sink maintaining per-key exact moment segments for
    ``val_col`` keyed by ``key_col``."""

    def __init__(
        self,
        store_path: str,
        key_col: str = "event_type",
        val_col: str = "value",
        id_col: str = "event_id",
        scale: int = 10_000,
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.key_col = key_col
        self.val_col = val_col
        self.id_col = id_col
        self.scale = scale
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_moments(spark, self.store_path, batch_id)
        part = moment_partials(
            batch_df, self.key_col, self.val_col, self.id_col, self.scale
        )
        # non-partitioned write: a zero-row batch still emits a schema-only
        # part file, so later reads never hit UNABLE_TO_INFER_SCHEMA
        part.write.mode("overwrite").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )


def read_moments(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame | None:
    """Merge-on-read: SUM over all completed segments' partials →
    ``(key, n, s, q)`` (DECIMAL(38,0) — exact, order-free)."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    raw = reduce(lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in segs))
    return raw.groupBy("key").agg(
        F.sum("n").cast("decimal(38,0)").alias("n"),
        F.sum("s").cast("decimal(38,0)").alias("s"),
        F.sum("q").cast("decimal(38,0)").alias("q"),
    )


def compact_moments(
    spark: SparkSession, store_path: str, before_batch: int
) -> None:
    """Fold moment segments < before_batch into one base via sum-merge —
    re-aggregating compaction (sums compose losslessly)."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_moments(spark, store_path, before_batch=before_batch)
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
