"""The tagtree data model, re-expressed as three DataFrames.

Reference model (SURVEY.md §1):
  * series   — label set → dense TSID
               (/root/reference/src/index/index_server.cpp:30-60)
  * postings — inverted (name, value) → TSIDs
               (/root/reference/include/tagtree/index/mem_index.h:53-57)
  * samples  — (tsid, ts, value)
               (/root/reference/include/tagtree/storage.h:44)

The driver testdata has no TSDB tables, so FIXTURES.md §2 defines a
deterministic derivation from ``events``: three labels per event
(event_type, user_bucket, k_bucket) and TSIDs assigned densely from 1 in
lexicographic label order (deterministic stand-in for the reference's
ingest-order atomic counter, index_server.h:66 — deviation recorded in
SURVEY.md §7.4.1).

Scale notes (100 TB stance):
  * ``with_labels`` is a narrow projection — no shuffle.
  * ``build_series`` shuffles once on the (tiny) distinct label-set key;
    the global row_number window runs over the *distinct series*, not the
    events. At real scale the series count is << event count; if the series
    table itself outgrows one partition, swap row_number for a
    per-partition offset scheme (monotonically_increasing_id + rank over
    partition maxima) — semantics stay "dense, deterministic order".
  * ``build_samples`` re-joins events to series on the three label columns;
    the series side is broadcast (bounded by the label-combination space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import label_hash

#: The fixture's label names, in lexicographic significance order.
LABEL_NAMES = ("event_type", "user_bucket", "k_bucket")

#: Regex used to pull ``k`` out of the events.props JSON string. Kept to the
#: RE2∩Java common subset so the duckdb oracle can run the same pattern
#: (FIXTURES.md §5.3).
K_PATTERN = r'"k":\s*(\d+)'


def with_labels(events: DataFrame) -> DataFrame:
    """events + derived label columns (FIXTURES.md §2). Pure projection."""
    return events.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string")).alias("user_bucket"),
        F.concat(
            F.lit("k"),
            (F.regexp_extract("props", K_PATTERN, 1).cast("bigint") % 5).cast("string"),
        ).alias("k_bucket"),
    )


def build_series(events: DataFrame) -> DataFrame:
    """series(tsid, labels, label_hash, first_seen, last_seen) + flat label cols.

    Dense TSID assignment = the reference's add_series id_counter
    (/root/reference/src/index/index_server.cpp:46-55), made deterministic by
    ordering on the label tuple instead of arrival order.
    """
    ev = with_labels(events)
    grouped = ev.groupBy(*LABEL_NAMES).agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )
    w = Window.orderBy(*LABEL_NAMES)
    return grouped.select(
        F.row_number().over(w).cast("bigint").alias("tsid"),
        *LABEL_NAMES,
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in LABEL_NAMES]),
            F.array(*[F.col(n) for n in LABEL_NAMES]),
        ).alias("labels"),
        label_hash(*LABEL_NAMES).alias("label_hash"),
        "first_seen",
        "last_seen",
    )


def build_postings(series: DataFrame) -> DataFrame:
    """postings(name, value, tsid, first_seen, last_seen) — long-format
    inverted index; one row per (series, label). Replaces the mem index
    two-level hash map and the COW-tree pages (SURVEY.md §2.1 S6-S7).

    Implemented as a stack (explode of struct array) — narrow, no shuffle.
    """
    pairs = F.array(
        *[
            F.struct(F.lit(n).alias("name"), F.col(n).alias("value"))
            for n in LABEL_NAMES
        ]
    )
    return series.select(
        F.explode(pairs).alias("p"), "tsid", "first_seen", "last_seen"
    ).select(
        F.col("p.name").alias("name"),
        F.col("p.value").alias("value"),
        "tsid",
        "first_seen",
        "last_seen",
    )


def build_samples(events: DataFrame, series: DataFrame) -> DataFrame:
    """samples(tsid, ts, value) — one row per event, TSID resolved by
    broadcast join on the label tuple (the series dim is small by
    construction; at 100 TB it is still << samples and usually broadcastable;
    otherwise Catalyst picks a shuffle join on the same key)."""
    ev = with_labels(events)
    dim = F.broadcast(series.select("tsid", *LABEL_NAMES))
    return ev.join(dim, on=list(LABEL_NAMES), how="inner").select("tsid", "ts", "value")


def build_model(events: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(series, postings, samples) in one call."""
    series = build_series(events)
    return series, build_postings(series), build_samples(events, series)
