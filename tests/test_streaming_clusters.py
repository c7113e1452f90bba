"""Streaming connected-components maintenance (streaming/clusters.py):
the incrementally-maintained labelling must equal batch CC on the union
of all pairs seen — including components MERGED by a later batch's
bridging pair — and replay must be idempotent."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tagtree_spark.streaming.clusters import ClusterSink, read_labels


def _labels(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def test_streaming_clusters_equals_batch_with_cross_batch_merge(spark, tmpdir):
    from tagtree_spark.operators.dedup import near_dup_clusters

    store = f"{tmpdir}/cc-store"
    sink = ClusterSink(store)
    b0 = [(10, 11), (11, 12)]          # component {10,11,12}
    b1 = [(20, 21), (30, 31)]          # components {20,21}, {30,31}
    b2 = [(12, 20), (40, 41)]          # BRIDGES {10..12} with {20,21}
    sink(_pairs(spark, b0), 0)
    sink(_pairs(spark, b1), 1)
    sink(_pairs(spark, b2), 2)
    got = _labels(read_labels(spark, store))
    want = _labels(near_dup_clusters(_pairs(spark, b0 + b1 + b2)))
    assert got == want
    # the merged family all carries the GLOBAL min label
    assert {(20, 10), (21, 10), (12, 10)} <= got
    # at most the two newest snapshots remain (replay needs the
    # predecessor; older ones are physically removed)
    assert len(glob.glob(f"{store}/seg-*")) == 2


def test_streaming_clusters_replay_and_empty_batch(spark, tmpdir):
    from tagtree_spark.operators.dedup import near_dup_clusters

    store = f"{tmpdir}/cc-replay"
    sink = ClusterSink(store)
    b0 = [(1, 2), (3, 4)]
    b1 = [(2, 3)]
    sink(_pairs(spark, b0), 0)
    sink(_pairs(spark, b1), 1)
    want = _labels(near_dup_clusters(_pairs(spark, b0 + b1)))
    assert _labels(read_labels(spark, store)) == want
    # replaying batch 1 reads the pre-batch state and overwrites its own
    # snapshot — same result, no duplicate state
    sink(_pairs(spark, b1), 1)
    assert _labels(read_labels(spark, store)) == want
    # an empty batch leaves the labelling untouched (no segment written)
    sink(_pairs(spark, b1).where(F.lit(False)), 2)
    assert _labels(read_labels(spark, store)) == want

    # empty FIRST batch on a fresh store: still no store
    fresh = f"{tmpdir}/cc-fresh"
    ClusterSink(fresh)(_pairs(spark, b0).where(F.lit(False)), 0)
    assert read_labels(spark, fresh) is None
