"""Streaming continuous aggregate — the rollup ladder (tsdb/rollup.py)
maintained incrementally by a foreachBatch sink.

A dashboard over a 100 TB/day stream cannot re-aggregate raw samples per
query; the standard answer (TimescaleDB continuous aggregates, Druid
rollup ingestion) is to fold each micro-batch into partial aggregates and
let readers merge partials. Because the rollup ladder's aggregates all
compose exactly (count/sum/min/max, sum as DECIMAL — tsdb/rollup.py), the
merge is a plain re-aggregation and is bit-identical to aggregating the
raw stream directly — which is exactly what the test pins.

Storage follows the SeriesSink segment protocol (streaming/ingest.py):

    path/seg-<batch_id>-delta/   O(batch-distinct-buckets) partial rows
    path/seg-<batch_id>-base/    compaction output (re-aggregated)

Per batch the sink writes ONLY the batch's own partial rollup (O(batch)
work, never O(table)); replay overwrites the same segment (idempotent);
compaction every N batches re-aggregates old segments into a base whose
contents readers cannot distinguish from the deltas it replaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment
from tagtree_spark.tsdb.rollup import rollup_samples


def _merge_partials(raw: DataFrame) -> DataFrame:
    """Re-aggregate partial rollup rows (exact: the ladder's aggregates
    compose)."""
    return raw.groupBy("tsid", "bucket_start").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def read_rollup(spark: SparkSession, path: str, before_batch: int | None = None) -> DataFrame | None:
    """Merge-on-read over rollup segments: union the partials, one exact
    re-aggregation. Returns None when no segment is readable yet."""
    segs = _list_segments(path, before_batch)
    if not segs:
        return None
    return _merge_partials(spark.read.parquet(*segs))


def compact_rollup(spark: SparkSession, path: str, before_batch: int) -> None:
    """Fold every segment with id < before_batch into one re-aggregated
    base — same crash protocol as ingest.compact_segments: base written
    and _SUCCESS'd before any delete; a crash mid-delete leaves shadowed
    segments that readers already ignore."""
    import glob
    import shutil

    base = os.path.join(path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        segs = _list_segments(path, before_batch)
        if len(segs) <= 1:
            return
        _merge_partials(spark.read.parquet(*segs)).write.mode("overwrite").parquet(base)
        if not _complete(base):
            return
    for d in glob.glob(os.path.join(path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            shutil.rmtree(d, ignore_errors=True)


class RollupSink:
    """foreachBatch sink maintaining a segmented continuous aggregate over
    a ``(tsid, ts, value)`` sample stream at ``minutes`` resolution."""

    def __init__(self, path: str, minutes: int = 360, compact_every: int | None = 8):
        self.path = path
        self.minutes = minutes
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_rollup(spark, self.path, batch_id)
        part = rollup_samples(batch_df.select("tsid", "ts", "value"), self.minutes)
        part.write.mode("overwrite").parquet(
            os.path.join(self.path, f"seg-{batch_id:010d}-delta")
        )


def start_rollup(
    spark: SparkSession,
    events_dir: str,
    schema,
    rollup_path: str,
    checkpoint_dir: str,
    minutes: int = 360,
    tsid_col: str = "user_id",
    available_now: bool = True,
    compact_every: int | None = 8,
):
    """Wire an events directory stream into the rollup store, keying by
    ``tsid_col`` (a real deployment feeds resolved samples; the direct
    keying keeps the sink independently testable)."""
    from tagtree_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, events_dir, schema).select(
        F.col(tsid_col).cast("bigint").alias("tsid"), "ts", "value"
    )
    writer = (
        stream.writeStream.foreachBatch(
            RollupSink(rollup_path, minutes=minutes, compact_every=compact_every)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
