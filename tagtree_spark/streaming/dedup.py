"""Streaming exact dedup — first-seen-wins over an event stream.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; an ingest pipeline also needs the ONLINE form: drop a document the
moment it re-arrives, without re-scanning the corpus. Spark-native
answer: ``dropDuplicatesWithinWatermark`` — state is one entry per
distinct key seen within the watermark horizon, and the watermark is
what BOUNDS that state (without it, streaming dedup state grows forever;
the reference has no event-time machinery at all, SURVEY.md §2.9).

Scale stance: the dedup key should be a HASH of the content, not the
content (the state store and the shuffle then carry 8-byte keys — same
rule as batch exact_dedup's shuffle key). State is partitioned by key
hash across executors; a 100 TB/day stream with a 1-hour horizon holds
only the horizon's distinct hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """First occurrence of each key combination within the watermark
    horizon survives; later duplicates (including late arrivals inside
    ``delay``) are dropped. Keys are folded into a single xxhash64 so the
    state store never holds document bodies."""
    keyed = stream.withColumn("_dedup_key", F.xxhash64(*[F.col(c) for c in key_cols]))
    return (
        keyed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )
