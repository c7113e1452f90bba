"""Streaming sessionization — native ``session_window`` aggregation over an
event stream (§2.9; the streaming form of q37/q76's batch sessions).

Reference parity: the reference has no session concept — this is part of the
mandated streaming surface (SURVEY §2.9) built on Structured Streaming's
session-window state store, the idiomatic replacement for the hand-rolled
stateful operator a native engine would need (cf. Flink session windows).

Semantics: a session is a maximal run of events per ``user_id`` where each
event arrives within ``gap`` of the session's current end. Spark merges
session fragments across micro-batches in the state store and, in append
mode, emits a session only once the event-time watermark passes its end —
so results are final (no retractions), which is what a downstream sink
(funnel table, training-data sessionizer) wants.

Exactness / stream≡batch: the SAME builder runs on a batch frame (where
``withWatermark`` is a no-op and every session closes at end-of-input);
the aggregates are count + DECIMAL sum (order-free), so the drained stream
is bit-identical to the batch answer — pinned by
``tests/test_streaming_sessions.py``, including sessions whose events span
micro-batches (state-store merge) and out-of-order arrivals within the
watermark delay.

Scale: state is O(open sessions), keyed by (user_id, window) — the state
store shards on the grouping key, so user count is the parallelism; the
watermark bounds how long a session can stay open, so state cannot grow
unboundedly on an idle-user long tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Session-window aggregation usable on a batch OR streaming frame.

    → ``(user_id, start, end, n_events, v_sum)`` where [start, end) covers
    first event ts .. last event ts + gap (Spark session-window bounds) and
    ``v_sum`` is the exact DECIMAL event-value sum cast to double at the end
    (house fp discipline).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("_v"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("start"),
            F.col("w.end").alias("end"),
            "n_events",
            F.col("_v").cast("double").alias("v_sum"),
        )
    )
