"""Structured Streaming ingest (see streaming.ingest)."""

from tagtree_spark.streaming.ingest import (  # noqa: F401
    SeriesSink,
    read_event_stream,
    start_ingest,
)
