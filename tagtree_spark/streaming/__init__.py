"""Structured Streaming: ingest path (streaming.ingest) and custom
stateful operators (streaming.state)."""

from tagtree_spark.streaming.ingest import (  # noqa: F401
    SeriesSink,
    read_event_stream,
    start_ingest,
)
from tagtree_spark.streaming.state import track_series_activity  # noqa: F401
