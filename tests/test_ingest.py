"""Ingest/lifecycle (L1/L2/L6/L7) + streaming replay idempotence — the
§3.4 WAL-recovery analogue: re-applying an already-ingested batch must not
mint new ids or change existing ones."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tagtree_spark.tsdb.ingest import add_series_batch, commit, current_tsid, exists
from tagtree_spark.tsdb.model import LABEL_NAMES


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bootstrap_assigns_dense_ids(events):
    s = add_series_batch(None, events)
    row = s.agg(
        F.min("tsid").alias("mn"), F.max("tsid").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    assert row.mn == 1 and row.mx == row.n


def test_replay_is_idempotent(events):
    """add_series_batch(s, batch) twice == once (replay produces identical ids)."""
    once = add_series_batch(None, events)
    twice = add_series_batch(once, events)
    a = once.select("tsid", *LABEL_NAMES, "first_seen", "last_seen")
    b = twice.select("tsid", *LABEL_NAMES, "first_seen", "last_seen")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_batch_continues_id_space(events):
    """Split events in two halves: incremental ingest keeps old ids stable
    and appends new ids above the watermark."""
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    s1 = add_series_batch(None, first).cache()
    s2 = add_series_batch(s1, second)
    n1 = s1.count()
    # old ids unchanged
    joined = s2.alias("b").join(s1.alias("a"), on=list(LABEL_NAMES))
    moved = joined.where(F.col("a.tsid") != F.col("b.tsid")).count()
    assert moved == 0
    # new ids dense above watermark
    row = s2.agg(F.max("tsid").alias("mx"), F.count("*").alias("n")).collect()[0]
    assert row.mx == row.n >= n1
    # first/last_seen cover both batches for touched series
    full = add_series_batch(None, events)
    diff = (
        s2.select(*LABEL_NAMES, "first_seen", "last_seen")
        .exceptAll(full.select(*LABEL_NAMES, "first_seen", "last_seen"))
        .count()
    )
    assert diff == 0


def test_exists_probe(events):
    s = add_series_batch(None, events).cache()
    hits = exists(s, s.select(*LABEL_NAMES))
    assert hits.count() == s.count()
    miss = exists(
        s,
        s.sparkSession.createDataFrame(
            [("nosuch", "u999", "k999")], list(LABEL_NAMES)
        ),
    )
    assert miss.count() == 0


def test_current_tsid_watermark(events):
    s = add_series_batch(None, events)
    assert current_tsid(s).collect()[0].max_tsid == s.count()


def test_commit_roundtrip(events, tmpdir, spark):
    from tagtree_spark.tsdb.store import versioned_read

    s = add_series_batch(None, events)
    commit(s, f"{tmpdir}/series")
    # commit rides the COW versioned protocol (r9): read via the pointer
    back = versioned_read(spark, f"{tmpdir}/series")
    assert back.count() == s.count()
    assert set(back.columns) == set(s.columns)


def test_streaming_ingest_and_restart(events, tmpdir, spark):
    """End-to-end stream: drain events dir → series+samples persisted; a
    RESTART with the same checkpoint re-processes nothing (exactly-once),
    and wiping the checkpoint (forced replay) leaves the series table
    unchanged thanks to MERGE idempotence + deterministic segment rewrite."""
    from tagtree_spark.streaming.ingest import read_samples, read_series, start_ingest

    events_dir = f"{tmpdir}/events"
    events.write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema

    paths = dict(
        series_path=f"{tmpdir}/series",
        samples_path=f"{tmpdir}/samples",
        checkpoint_dir=f"{tmpdir}/ckpt",
    )
    q = start_ingest(spark, events_dir, schema, **paths)
    q.awaitTermination(120)
    series1 = read_series(spark, paths["series_path"])
    n_series = series1.count()
    n_samples = read_samples(spark, paths["samples_path"]).count()
    assert n_samples == events.count()
    ids1 = {(r.event_type, r.user_bucket, r.k_bucket): r.tsid for r in series1.collect()}

    # restart with same checkpoint: no new input → nothing changes
    q2 = start_ingest(spark, events_dir, schema, **paths)
    q2.awaitTermination(120)
    assert read_samples(spark, paths["samples_path"]).count() == n_samples

    # forced replay (fresh checkpoint): series ids must be identical
    shutil_ckpt = f"{tmpdir}/ckpt2"
    q3 = start_ingest(
        spark, events_dir, schema,
        series_path=paths["series_path"],
        samples_path=f"{tmpdir}/samples2",
        checkpoint_dir=shutil_ckpt,
    )
    q3.awaitTermination(120)
    series2 = read_series(spark, paths["series_path"])
    assert series2.count() == n_series
    ids2 = {(r.event_type, r.user_bucket, r.k_bucket): r.tsid for r in series2.collect()}
    assert ids1 == ids2


def _batched_events(events, n_batches):
    """Split events into n_batches disjoint slices by event_id."""
    return [
        events.where(F.col("event_id") % n_batches == i) for i in range(n_batches)
    ]


def test_sink_writes_o_batch_segments(events, tmpdir, spark):
    """Per-batch written ROWS must track the batch, not the store: feeding
    the sink N batches leaves delta segments whose sizes sum to the
    per-batch label-set counts — no segment rewrites the whole table
    (VERDICT r2: the old sink was O(total series) per batch)."""
    from tagtree_spark.streaming.ingest import SeriesSink, read_series
    from tagtree_spark.tsdb.ingest import add_series_batch
    from tagtree_spark.tsdb.model import with_labels

    sink = SeriesSink(f"{tmpdir}/series", f"{tmpdir}/samples", compact_every=None)
    batches = _batched_events(events, 4)
    for i, b in enumerate(batches):
        sink(b, i)

    # each delta segment holds exactly the batch's label-set count — in
    # particular it does NOT grow with the cumulative series count
    for i, b in enumerate(batches):
        seg = spark.read.parquet(f"{tmpdir}/series/seg-{i:010d}-delta")
        n_batch_sets = with_labels(b).select(*LABEL_NAMES).distinct().count()
        assert seg.count() == n_batch_sets

    # merge-on-read resolves to exactly the batch-fold reference model
    merged = read_series(spark, f"{tmpdir}/series")
    expect = None
    for b in batches:
        expect = add_series_batch(expect, b)
    got = {
        (r.event_type, r.user_bucket, r.k_bucket): (r.tsid, r.first_seen, r.last_seen)
        for r in merged.collect()
    }
    want = {
        (r.event_type, r.user_bucket, r.k_bucket): (r.tsid, r.first_seen, r.last_seen)
        for r in expect.collect()
    }
    assert got == want


def test_sink_auto_compaction_bounds_segments(events, tmpdir, spark):
    """With compact_every=2 the segment count stays bounded while contents
    (series AND samples) stay identical to the uncompacted run."""
    import glob

    from tagtree_spark.streaming.ingest import SeriesSink, read_samples, read_series

    a = SeriesSink(f"{tmpdir}/a_series", f"{tmpdir}/a_samples", compact_every=2)
    b = SeriesSink(f"{tmpdir}/b_series", f"{tmpdir}/b_samples", compact_every=None)
    batches = _batched_events(events, 6)
    for i, batch in enumerate(batches):
        a(batch, i)
        b(batch, i)

    n_a = len(glob.glob(f"{tmpdir}/a_series/seg-*"))
    n_b = len(glob.glob(f"{tmpdir}/b_series/seg-*"))
    assert n_b == 6
    assert n_a <= 3  # base + at most compact_every pending deltas

    sa = {
        (r.tsid, r.event_type, r.first_seen, r.last_seen)
        for r in read_series(spark, f"{tmpdir}/a_series").collect()
    }
    sb = {
        (r.tsid, r.event_type, r.first_seen, r.last_seen)
        for r in read_series(spark, f"{tmpdir}/b_series").collect()
    }
    assert sa == sb
    assert (
        read_samples(spark, f"{tmpdir}/a_samples").count()
        == read_samples(spark, f"{tmpdir}/b_samples").count()
        == events.count()
    )


def test_compaction_crash_replay_no_double_count(events, tmpdir, spark):
    """A crash between base-write and source-segment deletion leaves base +
    covered segments on disk simultaneously: readers must shadow the
    covered segments (samples would otherwise double-count) and a replayed
    compaction just finishes the cleanup."""
    import glob
    import shutil as _sh

    from tagtree_spark.streaming.ingest import (
        SeriesSink,
        compact_segments,
        read_samples,
        read_series,
    )

    sink = SeriesSink(f"{tmpdir}/series", f"{tmpdir}/samples", compact_every=None)
    batches = _batched_events(events, 3)
    for i, batch in enumerate(batches):
        sink(batch, i)
    n_samples = read_samples(spark, f"{tmpdir}/samples").count()
    n_series = read_series(spark, f"{tmpdir}/series").count()

    # simulate the crash: write the base but "forget" the deletions by
    # copying the segments back after a full compaction
    pre = {d: d + ".keep" for d in glob.glob(f"{tmpdir}/samples/seg-*")}
    for src, dst in pre.items():
        _sh.copytree(src, dst)
    compact_segments(spark, f"{tmpdir}/samples", before_batch=3, merge=False)
    for src, dst in pre.items():  # resurrect the covered segments
        if not os.path.exists(src):
            _sh.copytree(dst, src)
        _sh.rmtree(dst)

    # base + covered segments coexist → reader must not double-count
    assert read_samples(spark, f"{tmpdir}/samples").count() == n_samples
    # replayed compaction finishes the deletes, contents unchanged
    compact_segments(spark, f"{tmpdir}/samples", before_batch=3, merge=False)
    assert read_samples(spark, f"{tmpdir}/samples").count() == n_samples
    assert len(glob.glob(f"{tmpdir}/samples/seg-*")) == 1
    assert read_series(spark, f"{tmpdir}/series").count() == n_series


def test_stream_dedup_first_seen_wins(events, tmpdir, spark):
    """Duplicated input stream → exactly one survivor per distinct key; the
    dedup key is a hash, so state never holds event bodies."""
    from tagtree_spark.streaming.dedup import dedup_stream

    events_dir = f"{tmpdir}/events"
    dup = events.limit(50)
    dup.unionAll(dup).write.parquet(events_dir)  # every event exactly twice
    schema = spark.read.parquet(events_dir).schema

    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = dedup_stream(stream, key_cols=["event_id", "ts"])
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{tmpdir}/out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{tmpdir}/out")
    distinct_keys = dup.select("event_id", "ts").distinct().count()
    assert got.count() == distinct_keys
    assert "_dedup_key" not in got.columns
