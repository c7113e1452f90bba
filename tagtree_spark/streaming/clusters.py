"""Streaming connected-components maintenance — incremental cluster
labels over a stream of near-dup pairs (the continuous companion of
operators/dedup.near_dup_clusters): each micro-batch of verified pairs is
merged with the PREVIOUS labelling and re-labelled, so the store always
holds the exact components of every pair seen so far.

Correctness invariant (what makes incremental == batch): a labelling is
itself a spanning certificate of its components — re-encoding each
``(doc_id, cluster_id)`` row as an edge connects every member of an old
component to its minimum, so CC(new pairs ∪ label-edges) has exactly the
components of CC(all pairs ever). A batch-2 pair bridging two components
discovered in batches 0 and 1 therefore merges them, relabelling BOTH to
the global minimum — the case a naive "assign new pairs to existing
clusters" incremental scheme gets wrong.

State shape at 100 TB: the carried state is ONE row per clustered node
(ids only, no bodies) — the same frame a batch run materializes; per
batch the CC loop runs on |batch pairs| + |clustered nodes| edges with
pointer-jumping compression (O(log diameter) rounds). Each batch writes a
full labelling snapshot as a ``-base`` segment, so `_list_segments`'s
base-shadowing makes the newest snapshot the only visible one (replaying
a crashed batch overwrites its own segment and reads the pre-batch base —
idempotent by construction), and superseded snapshots are physically
removed opportunistically.

Stream == batch proof: test_streaming_clusters asserts the streamed
labelling equals near_dup_clusters on the union of all pairs, including
cross-batch component merges and replay.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.dedup import near_dup_clusters
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class ClusterSink:
    """foreachBatch sink maintaining the incremental CC labelling.

    Input batches carry verified pair rows ``(doc_a, doc_b)`` (the
    near-dup family's convention, e.g. NearDupSink's cross/within-batch
    pair output). ``max_iters`` bounds the per-batch label-propagation
    rounds (pointer jumping makes this a depth-of-log bound)."""

    def __init__(self, store_path: str, max_iters: int = 30):
        self.store_path = store_path
        self.max_iters = max_iters

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        pairs = batch_df.select(
            F.col("doc_a").cast("bigint").alias("doc_a"),
            F.col("doc_b").cast("bigint").alias("doc_b"),
        )
        prev = read_labels(spark, self.store_path, before_batch=batch_id)
        if prev is not None:
            pairs = pairs.unionByName(
                prev.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("cluster_id").alias("doc_b"),
                )
            )
        pairs = pairs.persist()
        if pairs.count() == 0:
            # nothing seen yet and an empty batch: no segment (absent ==
            # state unchanged; rule-13 empty-write guard)
            pairs.unpersist()
            return
        labels = near_dup_clusters(
            pairs, max_iters=self.max_iters, compress=True
        )
        out = os.path.join(self.store_path, f"seg-{batch_id:010d}-base")
        labels.write.mode("overwrite").parquet(out)
        pairs.unpersist()
        if _complete(out):
            # retain the TWO newest snapshots: foreachBatch may replay the
            # last uncommitted batch after a crash, and that replay reads
            # the PREDECESSOR state (before_batch excludes its own) —
            # deleting it would silently restart the labelling from only
            # the replayed batch's pairs. Anything older is superseded.
            snaps = sorted(
                d
                for d in _glob.glob(os.path.join(self.store_path, "seg-*"))
                if _parse_segment(d) is not None
            )
            for d in snaps[:-2]:
                _shutil.rmtree(d, ignore_errors=True)


def read_labels(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame | None:
    """The current labelling ``(doc_id, cluster_id)`` — the newest base
    snapshot (base-shadowing hides superseded ones)."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    return spark.read.parquet(segs[-1]).select("doc_id", "cluster_id")
