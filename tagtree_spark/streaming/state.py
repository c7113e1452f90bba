"""Custom stateful streaming operator: per-series activity tracking via
``applyInPandasWithState`` (SURVEY.md §2.9).

Re-expresses the reference's in-memory max-timestamp/touch maintenance
(/root/reference/src/index/mem_index.cpp:16-24,112-127 — every ingest bumps
the per-postings max_timestamp under a stripe lock) as Spark-managed
keyed state: the state store holds ``(n_events, first_us, last_us)`` per
label set; each micro-batch folds its rows into the state and emits the
updated row. The state store checkpoint replaces the reference's WAL'd
in-memory index for this bookkeeping.

This is the harness for any custom stateful operator the engine needs
(EWMA, counter-reset tracking, session carry-over): pandas-batched per key
group, Arrow transfer, watermark-driven state eviction when configured.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from tagtree_spark.tsdb.model import LABEL_NAMES, with_labels

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [StructField(n, StringType()) for n in LABEL_NAMES]
    + [
        StructField("n_events", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Fold a micro-batch's rows for one label set into the running state
    (the touch analogue: counts + activity interval)."""
    n, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        n += len(pdf)
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, first_us, last_us))
    yield pd.DataFrame(
        [dict(zip(LABEL_NAMES, key)) | {"n_events": n, "first_us": first_us, "last_us": last_us}]
    )


def track_series_activity(event_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-label-set running (n_events, first_us,
    last_us), one updated row per key per micro-batch."""
    labeled = with_labels(event_stream)
    return labeled.groupBy(*LABEL_NAMES).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
