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
  * ``build_series`` shuffles once on the distinct label-set key, then
    assigns dense TSIDs with a per-partition offset scheme: range-partition
    by the label tuple, rank within each partition, add the cumulative count
    of all earlier partitions. No single-partition global window; the only
    global step is a cumsum over ≤numPartitions counter rows. Ids are
    identical to a global ``row_number() OVER (ORDER BY labels)``.
  * ``build_samples`` re-joins events to series on the three label columns;
    AQE broadcasts the series side when it is small.
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


def dense_rank_ids(df: DataFrame, order_cols: tuple[str, ...], id_col: str = "tsid") -> DataFrame:
    """Assign dense 1-based ids in lexicographic ``order_cols`` order WITHOUT
    a single-partition global window (the r1 scale-killer, VERDICT #5).

    Scheme (sketched in the reference's terms at
    /root/reference/src/index/index_server.cpp:46-55 — an atomic counter,
    here made deterministic and distributed):
      1. range-partition on ``order_cols`` → partitions are globally ordered
         disjoint key ranges;
      2. row_number within each partition (parallel);
      3. offset each partition by the cumulative row count of all earlier
         partitions — a window over ≤numPartitions tiny counter rows.
    The resulting ids equal a global ``row_number() OVER (ORDER BY cols)``.
    """
    part = df.repartitionByRange(*[F.col(c) for c in order_cols])
    local = part.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # Prefix-sum over ≤numPartitions counter rows. Folded to ONE array row
    # (collect_list + per-index aggregate) instead of an unpartitioned
    # window: same O(p²) work on p≈32 rows, but no WindowExec single-task
    # warning drowning out real regressions (VERDICT r3 #8).
    offsets = (
        counts.agg(
            F.array_sort(F.collect_list(F.struct("_pid", "_cnt"))).alias("_cs")
        )
        .select(
            F.explode(
                F.expr(
                    "transform(_cs, (x, i) -> struct(x._pid AS _pid, "
                    "aggregate(slice(_cs, 1, i), CAST(0 AS BIGINT), "
                    "(a, y) -> a + y._cnt) AS _off))"
                )
            ).alias("_o")
        )
        .select(F.col("_o._pid").alias("_pid"), F.col("_o._off").alias("_off"))
    )
    # offsets has ≤numPartitions rows — broadcast is bounded by cluster
    # parallelism, not data volume.
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
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
    return dense_rank_ids(grouped, LABEL_NAMES).select(
        "tsid",
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
    """samples(tsid, ts, value) — one row per event, TSID resolved by a join
    on the label tuple. No broadcast hint: the series dim is usually small
    (AQE broadcasts it), but at 100 TB with high label cardinality it may
    not be — forcing the hint would OOM; AQE decides per run."""
    ev = with_labels(events)
    dim = series.select("tsid", *LABEL_NAMES)
    return ev.join(dim, on=list(LABEL_NAMES), how="inner").select("tsid", "ts", "value")


def build_model(events: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(series, postings, samples) in one call."""
    series = build_series(events)
    return series, build_postings(series), build_samples(events, series)
