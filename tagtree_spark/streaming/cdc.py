"""Streaming upsert store — the lakehouse MERGE family (operators/cdc.py)
driven by a micro-batch stream.

Each batch is a change set (op ∈ I/U/D + payload); the sink appends it as
ONE versioned segment (version = batch id). A snapshot at version V is
``snapshot_as_of`` over the unioned segments — latest ≤V row per key,
tombstones dropped — i.e. the Delta/Iceberg read path re-expressed as an
argmax window. Compaction folds everything below a version into a single
base segment holding ONE row per live key (plus tombstones, which must
survive folding so later reads don't resurrect shadowed history), same
crash-safe base-then-delete order as the sibling sinks. Replay is
idempotent by segment naming; the per-key state on disk is one row per
key per WRITTEN version — bounded by change volume, never by read volume.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class UpsertSink:
    """foreachBatch sink: append each micro-batch of changes
    ``(key, op, payload...)`` as a versioned segment."""

    def __init__(
        self,
        store_path: str,
        key_col: str = "doc_id",
        op_col: str = "op",
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.key_col = key_col
        self.op_col = op_col
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_upserts(spark, self.store_path, batch_id, self.key_col, self.op_col)
        seg = batch_df.withColumn("_v", F.lit(batch_id).cast("bigint"))
        # non-partitioned write: zero-row batches still emit a schema-only
        # part file (no UNABLE_TO_INFER_SCHEMA poisoning)
        seg.write.mode("overwrite").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )


def _read_log(spark: SparkSession, store_path: str, before_batch: int | None = None):
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    return reduce(lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in segs))


def _latest_per_key(log: DataFrame, key_col: str, op_col: str) -> DataFrame:
    """Argmax window shared by snapshot + compaction: latest ``_v`` per
    key, with DETERMINISTIC tie-breaks for two change rows that share a
    (key, _v) — op precedence (D shadows U shadows I, the conservative
    read of an ambiguous batch) then a hash of the whole row, so replays
    and re-runs fold identically even when a producer violates the
    one-row-per-key-per-batch contract."""
    from pyspark.sql import Window

    prec = (
        F.when(F.col(op_col) == "D", F.lit(2))
        .when(F.col(op_col) == "U", F.lit(1))
        .otherwise(F.lit(0))
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("_v").desc(),
        prec.desc(),
        F.xxhash64(*[F.col(c) for c in log.columns]).desc(),
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_snapshot(
    spark: SparkSession,
    store_path: str,
    version: int | None = None,
    key_col: str = "doc_id",
    op_col: str = "op",
) -> DataFrame | None:
    """Table AS OF ``version`` (default: everything written) — latest
    ≤version row per key via one argmax window, tombstones dropped.

    Compaction retains only each key's LATEST folded row, so time travel
    to versions below the last fold point is lossy — the standard
    Delta-vacuum tradeoff; size ``compact_every`` to the history window
    the deployment must keep."""
    log = _read_log(spark, store_path)
    if log is None:
        return None
    if version is not None:
        log = log.where(F.col("_v") <= version)
    latest = _latest_per_key(log, key_col, op_col)
    return latest.where(F.col(op_col) != "D").drop(op_col, "_v")


def compact_upserts(
    spark: SparkSession,
    store_path: str,
    before_batch: int,
    key_col: str = "doc_id",
    op_col: str = "op",
) -> None:
    """Fold segments < before_batch into one base holding the latest row
    per key — INCLUDING tombstones ('D' rows survive as tombstones so a
    later snapshot never resurrects a shadowed insert)."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        log = _read_log(spark, store_path, before_batch=before_batch)
        if log is None:
            return
        folded = _latest_per_key(log, key_col, op_col)
        folded.write.mode("overwrite").parquet(base)
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)
