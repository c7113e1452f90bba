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
    s = add_series_batch(None, events)
    commit(s, f"{tmpdir}/series")
    back = spark.read.parquet(f"{tmpdir}/series")
    assert back.count() == s.count()
    assert set(back.columns) == set(s.columns)


def test_streaming_ingest_and_restart(events, tmpdir, spark):
    """End-to-end stream: drain events dir → series+samples persisted; a
    RESTART with the same checkpoint re-processes nothing (exactly-once),
    and wiping the checkpoint (forced replay) leaves the series table
    unchanged thanks to MERGE idempotence."""
    from tagtree_spark.streaming.ingest import start_ingest

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
    series1 = spark.read.parquet(paths["series_path"])
    n_series = series1.count()
    n_samples = spark.read.parquet(paths["samples_path"]).count()
    assert n_samples == events.count()
    ids1 = {(r.event_type, r.user_bucket, r.k_bucket): r.tsid for r in series1.collect()}

    # restart with same checkpoint: no new input → nothing changes
    q2 = start_ingest(spark, events_dir, schema, **paths)
    q2.awaitTermination(120)
    assert spark.read.parquet(paths["samples_path"]).count() == n_samples

    # forced replay (fresh checkpoint): series ids must be identical
    shutil_ckpt = f"{tmpdir}/ckpt2"
    q3 = start_ingest(
        spark, events_dir, schema,
        series_path=paths["series_path"],
        samples_path=f"{tmpdir}/samples2",
        checkpoint_dir=shutil_ckpt,
    )
    q3.awaitTermination(120)
    series2 = spark.read.parquet(paths["series_path"])
    assert series2.count() == n_series
    ids2 = {(r.event_type, r.user_bucket, r.k_bucket): r.tsid for r in series2.collect()}
    assert ids1 == ids2
