"""Streaming as-of enrichment — a stream-static TEMPORAL join: every
incoming event picks up the latest dimension row as of ITS OWN event time
(within a staleness lookback). The Flink "temporal table join" shape, and
the online form of a feature-store backfill: a click stream enriched with
the feature value that was current when the click happened.

Batch/stream duality: ``asof_enrich`` is a plain DataFrame function; the
sink runs the SAME function per micro-batch against the broadcast
dimension (per-event as-of needs an argmax over the range join — not
expressible as a plain append-mode stream-stream join — so the
micro-batch seam via foreachBatch is the idiomatic Spark shape).
The drained stream is therefore bit-identical to the batch call — pinned
by ``tests/test_streaming_enrich.py``.

Scale: the range join fans each event out to its ≤ lookback-window
dimension rows before the argmax — bounded by dimension update frequency,
exactly like the PIT join in ``tsdb/asof.py``; the dimension table is
broadcast (dimensions ≪ events), so per batch this is one narrow pass +
one (event) shuffle. Output segments follow the house protocol: one
``seg-<batch>-delta`` directory per micro-batch, skipped when empty
(CLAUDE.md rule: never dynamic-partition-write a zero-row frame),
overwritten idempotently on replay.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def asof_enrich(
    events: DataFrame,
    dim: DataFrame,
    lookback: _dt.timedelta,
    key: str = "tsid",
) -> DataFrame:
    """Per-event point-in-time join: each event row gains the latest
    ``dim`` row (``dim.ts <= event.ts``, within ``lookback``) for its
    ``key``. Deterministic winner = max (ts, value) struct, one shuffle
    on event_id after the broadcast range join.

    events: ``(event_id, ts, <key>)`` — dim: ``(<key>, ts, value)``.
    → ``(event_id, ev_us, <key>, dim_ts_us, dim_value)``; events with no
    in-window dimension row are dropped (inner PIT join).
    """
    ev = events.select(
        "event_id", F.col("ts").alias("ev_ts"), F.col(key).alias("k")
    )
    d = dim.select(F.col(key).alias("k"), F.col("ts").alias("d_ts"), "value")
    cand = ev.join(
        F.broadcast(d),
        ["k"],
    ).where(
        (F.col("d_ts") <= F.col("ev_ts"))
        & (F.col("d_ts") > F.col("ev_ts") - F.lit(lookback))
    )
    win = cand.groupBy("event_id", "ev_ts", "k").agg(
        F.max(F.struct(F.col("d_ts"), F.col("value"))).alias("m")
    )
    return win.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros("ev_ts").cast("bigint").alias("ev_us"),
        F.col("k").alias(key),
        F.unix_micros(F.col("m.d_ts")).cast("bigint").alias("dim_ts_us"),
        F.col("m.value").alias("dim_value"),
    )


class AsofEnrichSink:
    """foreachBatch sink: enrich each micro-batch of events against a
    static dimension frame and append one idempotent segment per batch."""

    def __init__(self, dim: DataFrame, path: str, lookback: _dt.timedelta, key: str = "tsid"):
        self.dim = dim
        self.path = path
        self.lookback = lookback
        self.key = key

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        out = asof_enrich(batch, self.dim, self.lookback, key=self.key)
        if out.isEmpty():
            return
        out.write.mode("overwrite").parquet(f"{self.path}/seg-{batch_id}-delta")


def read_enriched(spark: SparkSession, path: str) -> DataFrame | None:
    import glob
    import os

    segs = [
        p
        for p in sorted(glob.glob(os.path.join(path, "seg-*-delta")))
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    if not segs:
        return None
    return spark.read.parquet(*segs)
