"""Structured Streaming ingest — the WAL/compaction path re-expressed
(SURVEY.md §2.1 S1/S2, §2.4 X1, §3.2-3.4).

The reference's durability machinery (page-buffered WAL, COW-tree
compaction, checkpoint + replay — /root/reference/src/wal/wal.cpp:174-226,
src/index/index_server.cpp:205-232,234-284) collapses in Spark to:

  * ``readStream`` over an append-only events directory = WAL scan (S2);
  * ``foreachBatch`` MERGE into the persisted series table + samples
    append = WAL append + compaction (S1/X1) — each micro-batch is one
    atomic "compaction" of new series into the durable store;
  * the stream CHECKPOINT directory = the reference's checkpoint record
    (low-watermark TSID, last segment) — restart resumes exactly-once,
    which together with ``add_series_batch``'s idempotence gives the §3.4
    replay guarantee with zero custom recovery code.

Event-time watermarks (``withWatermark``) bound state for late data — the
reference has no event-time story at all (SURVEY.md §2.9); this is the
Spark-native upgrade.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.tsdb.ingest import add_series_batch
from tagtree_spark.tsdb.model import LABEL_NAMES, with_labels


def read_event_stream(
    spark: SparkSession, events_dir: str, schema, watermark: str = "1 hour"
) -> DataFrame:
    """S2: streaming source over an append-only parquet events directory,
    with an event-time watermark bounding any downstream stateful ops."""
    return (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )


class SeriesSink:
    """foreachBatch sink maintaining the durable series + samples tables.

    Per micro-batch (S1 + X1 in one atomic step):
      1. read current series table (absent on first batch);
      2. add_series_batch MERGE (idempotent — replayed batches are no-ops
         for id assignment, they only widen first/last_seen);
      3. overwrite series table, append resolved samples.

    Single-writer by construction (one streaming query owns the tables),
    matching the reference's single compaction thread
    (src/index/index_server.cpp:182-185).
    """

    def __init__(self, series_path: str, samples_path: str):
        self.series_path = series_path
        self.samples_path = samples_path

    def _load_series(self, spark: SparkSession) -> DataFrame | None:
        try:
            if not os.path.exists(self.series_path):
                return None
            return spark.read.parquet(self.series_path)
        except Exception:
            return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = self._load_series(spark)
        merged = add_series_batch(current, batch_df)
        # Materialize before overwriting the table it was derived from.
        merged_rows = merged.cache()
        merged_rows.count()
        merged_rows.write.mode("overwrite").parquet(self.series_path)
        fresh = spark.read.parquet(self.series_path)
        samples = (
            with_labels(batch_df)
            .join(fresh.select("tsid", *LABEL_NAMES), on=list(LABEL_NAMES))
            .select("tsid", "ts", "value")
        )
        samples.write.mode("append").parquet(self.samples_path)
        merged_rows.unpersist()


def start_ingest(
    spark: SparkSession,
    events_dir: str,
    schema,
    series_path: str,
    samples_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire source → sink and start the query. ``available_now=True``
    drains everything currently in the directory then stops (the batch
    "catch-up compaction" mode, also what tests use); False = continuous
    micro-batches."""
    stream = read_event_stream(spark, events_dir, schema)
    writer = (
        stream.writeStream.foreachBatch(SeriesSink(series_path, samples_path))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
