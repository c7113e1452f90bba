"""Streaming continuous aggregate (streaming/rollup.py): partial rollups
per micro-batch must merge to EXACTLY the batch rollup of the whole
stream, and compaction must bound segments without changing contents."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _to_rows(df):
    return {
        (r.tsid, r.bucket_start): (r.n, float(r.v_sum), r.v_min, r.v_max)
        for r in df.collect()
    }


def test_stream_rollup_equals_batch_rollup(events, tmpdir, spark):
    from tagtree_spark.streaming.rollup import read_rollup, start_rollup
    from tagtree_spark.tsdb.rollup import rollup_samples

    events_dir = f"{tmpdir}/events"
    events.write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    q = start_rollup(
        spark,
        events_dir,
        schema,
        rollup_path=f"{tmpdir}/rollup",
        checkpoint_dir=f"{tmpdir}/ckpt",
        minutes=360,
    )
    q.awaitTermination(120)

    streamed = read_rollup(spark, f"{tmpdir}/rollup")
    direct = rollup_samples(
        events.select(F.col("user_id").cast("bigint").alias("tsid"), "ts", "value"),
        minutes=360,
    )
    assert _to_rows(streamed) == _to_rows(direct)

    # restart with same checkpoint: no new input, contents unchanged
    q2 = start_rollup(
        spark,
        events_dir,
        schema,
        rollup_path=f"{tmpdir}/rollup",
        checkpoint_dir=f"{tmpdir}/ckpt",
        minutes=360,
    )
    q2.awaitTermination(120)
    assert _to_rows(read_rollup(spark, f"{tmpdir}/rollup")) == _to_rows(direct)


def test_rollup_compaction_bounds_segments_preserves_contents(events, tmpdir, spark):
    from tagtree_spark.streaming.rollup import RollupSink, compact_rollup, read_rollup
    from tagtree_spark.tsdb.rollup import rollup_samples

    path = f"{tmpdir}/rollup"
    sink = RollupSink(path, minutes=360, compact_every=None)
    batches = [events.where(F.col("event_id") % 4 == i) for i in range(4)]
    for i, b in enumerate(batches):
        sink(b.select(F.col("user_id").cast("bigint").alias("tsid"), "ts", "value"), i)
    assert len(glob.glob(f"{path}/seg-*")) == 4

    direct = rollup_samples(
        events.select(F.col("user_id").cast("bigint").alias("tsid"), "ts", "value"),
        minutes=360,
    )
    before = _to_rows(read_rollup(spark, path))
    assert before == _to_rows(direct)

    compact_rollup(spark, path, before_batch=4)
    segs = glob.glob(f"{path}/seg-*")
    assert len(segs) == 1 and segs[0].endswith("-base")
    assert _to_rows(read_rollup(spark, path)) == before

    # compaction is idempotent (replay after crash-before-delete)
    compact_rollup(spark, path, before_batch=4)
    assert _to_rows(read_rollup(spark, path)) == before
