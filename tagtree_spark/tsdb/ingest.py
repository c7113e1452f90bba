"""Series lifecycle operators — the ingest/upsert family (SURVEY.md §2.3).

Re-expresses the reference's write path as batch DataFrame MERGE logic:
  * L1 ``add_series_batch`` — dedup-or-assign: existing label sets keep
    their TSID, new ones get dense ids continuing from the current
    watermark (/root/reference/src/index/index_server.cpp:30-60, atomic
    ``id_counter`` at include/tagtree/index/index_server.h:66).
  * L2 ``exists`` — label-set membership probe via label_hash semi-join
    with full label verification (the reference probes a hash map then
    compares the label set, src/index/index_server.cpp:62-91,
    src/series/series_manager.cpp:123-150).
  * L3 touch — first/last_seen widening, folded into add_series_batch
    (src/index/mem_index.cpp:112-127).
  * L6 ``commit`` — persist the series table as parquet; Spark's ACID
    story (atomic directory swap / Delta when available) replaces the WAL
    (src/index/index_server.cpp:160-168, src/wal/wal.cpp:174-226).
  * L7 ``current_tsid`` — the id watermark
    (include/tagtree/index/index_server.h:50).

Replay idempotence (the §3.4 WAL-recovery analogue): applying
``add_series_batch`` with a batch that was already ingested is a no-op —
existing series keep their ids and only first/last_seen can widen. The
reference gets this from ``exists`` checks during replay
(src/index/index_server.cpp:234-284); here it falls out of the anti-join.

Scale: one shuffle on the label tuple for the batch dedup + anti-join; new
ids via the same per-partition offset scheme as the batch model (no
single-partition window); the max-tsid watermark is a 1-row aggregate
joined in (never collected to the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import label_hash
from tagtree_spark.tsdb.model import LABEL_NAMES, dense_rank_ids, with_labels


def current_tsid(series: DataFrame) -> DataFrame:
    """L7: the id watermark → 1-row DataFrame[max_tsid BIGINT]."""
    return series.agg(F.coalesce(F.max("tsid"), F.lit(0)).cast("bigint").alias("max_tsid"))


def exists(series: DataFrame, probe: DataFrame) -> DataFrame:
    """L2: rows of ``probe`` (carrying the label columns) that already have
    a series → DataFrame[tsid + label cols]. Hash-probe then verify: the
    join key is label_hash (cheap, fixed-width — the shuffle key never
    carries the label strings), equality on the labels confirms (guards
    against hash collisions, as the reference's compare does)."""
    p = probe.select(*LABEL_NAMES).distinct().withColumn("_lh", label_hash(*LABEL_NAMES))
    s = series.select("tsid", *LABEL_NAMES).withColumn("_lh", label_hash(*LABEL_NAMES))
    return (
        p.join(s, on=["_lh", *LABEL_NAMES], how="inner")
        .select("tsid", *LABEL_NAMES)
    )


def add_series_batch(series: DataFrame | None, batch_events: DataFrame) -> DataFrame:
    """L1+L3: merge a batch of raw events into the series table.

    Returns the new series table: existing series keep their TSID with
    first/last_seen widened; unseen label sets get dense ids continuing
    from max(tsid), assigned in lexicographic label order within the batch
    (deterministic stand-in for arrival order — SURVEY.md §7.4.1).
    """
    ev = with_labels(batch_events)
    batch = ev.groupBy(*LABEL_NAMES).agg(
        F.min("ts").alias("b_first"),
        F.max("ts").alias("b_last"),
    )
    if series is None:
        fresh = dense_rank_ids(
            batch.select(
                *LABEL_NAMES,
                F.col("b_first").alias("first_seen"),
                F.col("b_last").alias("last_seen"),
            ),
            LABEL_NAMES,
        )
        return _finish(fresh)

    # Touch: widen the activity interval of series hit by this batch.
    touched = (
        series.select("tsid", *LABEL_NAMES, "first_seen", "last_seen")
        .join(batch, on=list(LABEL_NAMES), how="left")
        .select(
            "tsid",
            *LABEL_NAMES,
            F.least("first_seen", "b_first").alias("first_seen"),
            F.greatest("last_seen", "b_last").alias("last_seen"),
        )
    )
    # New series: batch label sets with no existing series.
    new = batch.join(series.select(*LABEL_NAMES), on=list(LABEL_NAMES), how="left_anti")
    new_ids = dense_rank_ids(
        new.select(
            *LABEL_NAMES,
            F.col("b_first").alias("first_seen"),
            F.col("b_last").alias("last_seen"),
        ),
        LABEL_NAMES,
    )
    # Continue the dense id space from the watermark — 1-row join, no collect.
    offset = current_tsid(series)
    shifted = new_ids.crossJoin(F.broadcast(offset)).select(
        (F.col("tsid") + F.col("max_tsid")).cast("bigint").alias("tsid"),
        *LABEL_NAMES,
        "first_seen",
        "last_seen",
    )
    return _finish(touched.unionByName(shifted))


def _finish(flat: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Attach the labels map + label_hash columns (series schema,
    SURVEY.md §7.1)."""
    return flat.select(
        "tsid",
        *LABEL_NAMES,
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in LABEL_NAMES]),
            F.array(*[F.col(n) for n in LABEL_NAMES]),
        ).alias("labels"),
        label_hash(*LABEL_NAMES).alias("label_hash"),
        "first_seen",
        "last_seen",
        *extra_cols,
    )


def series_delta(series: DataFrame | None, batch_events: DataFrame) -> DataFrame:
    """L1 with the reference's created flag: merge rows for the label sets
    present in THIS batch only → series schema + ``created`` BOOLEAN.

    Mirrors ``IndexServer::add_series`` returning ``(tsid, created)``
    (/root/reference/include/tagtree/index/index_server.h:40-41): existing
    label sets keep their TSID (created=false) with first/last_seen widened
    to cover the batch; unseen sets get dense ids above the watermark
    (created=true). Output is O(|batch label sets|) — the streaming sink
    appends exactly this as a segment instead of rewriting the table, the
    same way the reference WAL-appends only newly-created series
    (src/wal/record_serializer.cpp:19-58) and widens intervals in place.

    Id assignment agrees with :func:`add_series_batch` applied to the same
    (series, batch): both anti-join the same batch aggregate and continue
    from the same watermark.
    """
    ev = with_labels(batch_events)
    batch = ev.groupBy(*LABEL_NAMES).agg(
        F.min("ts").alias("b_first"),
        F.max("ts").alias("b_last"),
    )
    created = F.lit(True).alias("created")
    if series is None:
        fresh = dense_rank_ids(
            batch.select(
                *LABEL_NAMES,
                F.col("b_first").alias("first_seen"),
                F.col("b_last").alias("last_seen"),
            ),
            LABEL_NAMES,
        )
        return _finish(fresh.withColumn("created", created), ("created",))

    # existing sets hit by the batch: widen intervals, keep ids
    hits = (
        batch.join(
            series.select("tsid", *LABEL_NAMES, "first_seen", "last_seen"),
            on=list(LABEL_NAMES),
            how="inner",
        )
        .select(
            "tsid",
            *LABEL_NAMES,
            F.least("first_seen", "b_first").alias("first_seen"),
            F.greatest("last_seen", "b_last").alias("last_seen"),
            F.lit(False).alias("created"),
        )
    )
    new = batch.join(series.select(*LABEL_NAMES), on=list(LABEL_NAMES), how="left_anti")
    new_ids = dense_rank_ids(
        new.select(
            *LABEL_NAMES,
            F.col("b_first").alias("first_seen"),
            F.col("b_last").alias("last_seen"),
        ),
        LABEL_NAMES,
    )
    offset = current_tsid(series)
    shifted = new_ids.crossJoin(F.broadcast(offset)).select(
        (F.col("tsid") + F.col("max_tsid")).cast("bigint").alias("tsid"),
        *LABEL_NAMES,
        "first_seen",
        "last_seen",
        created,
    )
    return _finish(hits.unionByName(shifted), ("created",))


def commit(series: DataFrame, path: str) -> None:
    """L6: persist the series table through the COW versioned protocol
    (tsdb.store.versioned_overwrite) — crash-consistent like the
    reference's checkpoint commit (write tmp + atomic pointer swap + CRC,
    /root/reference/src/wal/wal.cpp:278-305) AND reader-isolated like its
    COW tree (queries keep scanning the previous committed version,
    include/tagtree/tree/cow_tree.h:436-449; a Delta MERGE replaces this
    in a real deployment — SURVEY.md §3.2)."""
    from tagtree_spark.tsdb.store import versioned_overwrite

    versioned_overwrite(series, path)
