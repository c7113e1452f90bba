"""Streaming embedding near-duplicate detection — the online form of the
hyperplane-LSH cosine dedup (operators/similarity.py:104-146): each
micro-batch of vectors is checked against the ACCUMULATED vector store,
then absorbed.

The text twin is streaming/neardup.py (MinHash bands); here the bucket key
is the hyperplane sign bucket, which is SMALL (2^n_planes values), so the
store is partitioned by the bucket itself — a batch's store read prunes to
exactly the bucket directories the batch occupies, no prefix hashing
needed. Per batch:

  * bucket the batch (narrow: broadcast integer planes, one fold per row);
  * read the store pruned to the batch's buckets; apply the hot-bucket cap
    (count > max_bucket → dropped + counted in ``_hot_stats``, the same
    policy/telemetry as the batch path's MAX_BUCKET and NearDupSink);
  * ONE bucket join + cosine verification > threshold → matches segment;
  * append the batch's (vec_id, v, bucket) rows, partitioned by bucket
    (O(batch); overwrite-by-batch-id = idempotent replay).

Within-batch duplicates are caught too (batch joins store ∪ itself).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.dedup import MAX_BUCKET
from tagtree_spark.operators.similarity import cosine, lsh_bucket, plane_weights
from tagtree_spark.session import spread
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


def batch_buckets(
    emb: DataFrame,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, v, bucket) — one row per vector (narrow)."""
    planes = plane_weights(n_planes, dim)
    return spread(emb).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )


def read_vector_store(
    spark: SparkSession,
    store_path: str,
    before_batch: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame | None:
    """Union of completed store segments, each its own bucket-partitioned
    parquet root; a ``buckets`` filter prunes partition directories."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    parts = [
        spark.read.option("basePath", seg).parquet(seg).select("vec_id", "v", "bucket")
        for seg in segs
    ]
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if buckets is not None:
        out = out.where(F.col("bucket").isin([int(b) for b in buckets]))
    return out


def compact_store(spark: SparkSession, store_path: str, before_batch: int) -> None:
    """Fold segments < before_batch into one bucket-partitioned base
    (crash-safe: complete base first, then delete shadowed segments)."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_vector_store(spark, store_path, before_batch=before_batch)
        # zero-row partitioned write would create a dataless base segment
        # that breaks every later read (ADVICE r4 high)
        if merged is None or merged.isEmpty():
            return
        merged.write.mode("overwrite").partitionBy("bucket").parquet(base)
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)


class EmbedDedupSink:
    """foreachBatch sink: flag cosine near-dups of the accumulated corpus,
    then absorb the batch. ``matches_path`` receives one segment per batch
    with ``(new_vec, seen_vec, score)`` (seen_vec < new_vec for
    within-batch hits)."""

    def __init__(
        self,
        store_path: str,
        matches_path: str,
        threshold: float = 0.45,
        n_planes: int = 4,
        dim: int = 64,
        max_bucket: int | None = MAX_BUCKET,
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.matches_path = matches_path
        self.threshold = threshold
        self.n_planes = n_planes
        self.dim = dim
        self.max_bucket = max_bucket
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_store(spark, self.store_path, batch_id)
        batch = batch_buckets(batch_df, n_planes=self.n_planes, dim=self.dim).persist()
        # a zero-row bucket-partitioned delta write would leave a dataless
        # segment that poisons every later store read; an absent segment is
        # the replay-idempotent equivalent (ADVICE r4 high)
        if batch.count() == 0:
            batch.unpersist()
            return
        bks = [r[0] for r in batch.select("bucket").distinct().collect()]
        seen = read_vector_store(
            spark, self.store_path, before_batch=batch_id, buckets=bks
        )
        prev_side = batch.select(
            F.col("vec_id").alias("seen_vec"),
            F.col("v").alias("vb"),
            "bucket",
            F.lit(True).alias("_in_batch"),
        )
        if seen is not None:
            prev_side = prev_side.unionByName(
                seen.select(
                    F.col("vec_id").alias("seen_vec"),
                    F.col("v").alias("vb"),
                    "bucket",
                    F.lit(False).alias("_in_batch"),
                )
            )
        if self.max_bucket is not None:
            sizes = prev_side.groupBy("bucket").agg(F.count("*").alias("_bn"))
            hot = sizes.where(F.col("_bn") > self.max_bucket).persist()
            stats = hot.agg(
                F.count("*").cast("bigint").alias("n_hot_buckets"),
                F.coalesce(F.sum("_bn"), F.lit(0)).cast("bigint").alias("dropped_rows"),
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            stats.write.mode("overwrite").parquet(
                os.path.join(self.store_path, "_hot_stats", f"seg-{batch_id:010d}")
            )
            prev_side = prev_side.join(
                F.broadcast(hot.select("bucket")), "bucket", "left_anti"
            )
        matches = (
            batch.select(F.col("vec_id").alias("new_vec"), F.col("v").alias("va"), "bucket")
            .join(prev_side, "bucket")
            .where(
                (~F.col("_in_batch") & (F.col("seen_vec") != F.col("new_vec")))
                | (F.col("_in_batch") & (F.col("seen_vec") < F.col("new_vec")))
            )
            .select("new_vec", "seen_vec", cosine("va", "vb").alias("score"))
            .where(F.col("score") > self.threshold)
            .distinct()
        )
        matches.write.mode("overwrite").parquet(
            os.path.join(self.matches_path, f"seg-{batch_id:010d}")
        )
        batch.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )
        if self.max_bucket is not None:
            hot.unpersist()
        batch.unpersist()


def read_matches(spark: SparkSession, matches_path: str) -> DataFrame | None:
    segs = _list_segments(matches_path)
    if not segs:
        return None
    return spark.read.parquet(*segs)
