"""Persisted model layer — the durable index the reference maintains via
series files + COW tree + WAL (SURVEY.md §2.1, §7.1), re-expressed as
partitioned parquet tables (Delta in a real deployment; parquet is the
local analogue with the same layout decisions):

  * ``series/``   — one row per series (tsid, labels, hashes, interval).
  * ``postings/`` — long-format inverted index, partitioned by ``name``:
    a matcher on one label touches exactly one partition directory
    (the analogue of the reference's per-(name,value) key ranges,
    src/index/index_tree.cpp:113-117).
  * ``samples/``  — partitioned by ``ds`` (date of ts): time-range queries
    prune whole partitions before any row is read (the analogue of the
    per-key/per-page interval tests, src/index/index_tree.cpp:213-216).

``compact_table`` is the X1 maintenance analogue for this layer: streaming
ingest appends many small files per micro-batch; compaction rewrites a
table into right-sized partitions without changing its contents
(src/index/index_server.cpp:205-232 — there: merge mem index into the COW
tree; here: merge small files into big ones).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.tsdb.model import build_model


def materialize_model(spark: SparkSession, events: DataFrame, out_dir: str) -> None:
    """Derive series/postings/samples from events and persist them with
    query-aligned partitioning. One-time cost; every subsequent query reads
    the materialized layout with partition pruning."""
    series, postings, samples = build_model(events)
    series.write.mode("overwrite").parquet(os.path.join(out_dir, "series"))
    postings.write.mode("overwrite").partitionBy("name").parquet(
        os.path.join(out_dir, "postings")
    )
    samples.withColumn("ds", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "ds"
    ).parquet(os.path.join(out_dir, "samples"))


def load_model(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(series, postings, samples) from a materialized model dir."""
    series = spark.read.parquet(os.path.join(out_dir, "series"))
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    samples = spark.read.parquet(os.path.join(out_dir, "samples")).drop("ds")
    return series, postings, samples


def compact_table(spark: SparkSession, path: str, partition_cols: list[str] | None = None) -> None:
    """X1 analogue: rewrite a table's many small files (streaming appends)
    into one right-sized file per partition. Contents are unchanged —
    readers before/after see identical rows, like the reference's
    readers-never-blocked compaction."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact"
    if partition_cols:
        df.repartition(*partition_cols).write.mode("overwrite").partitionBy(
            *partition_cols
        ).parquet(tmp)
    else:
        df.coalesce(spark.sparkContext.defaultParallelism).write.mode("overwrite").parquet(tmp)
    # atomic-ish directory swap (Delta would make this a real ACID commit)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
