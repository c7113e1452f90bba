"""Stream-stream interval join (streaming/joins.py): drained streaming
result must equal the batch join of the same frames, and the streaming
plan must carry watermarks on both sides (the state-expiry contract)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-sjoin-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _key(r):
    return (r.user_id, r.l_event_id, r.r_event_id)


def test_stream_stream_interval_join_matches_batch(spark, events, tmpdir):
    """Clicks joined to errors of the same user within [0s, 2h] after the
    click: streaming (two file streams, availableNow) == batch."""
    from tagtree_spark.streaming.joins import interval_join_streams

    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    errors = events.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    cdir, edir = f"{tmpdir}/clicks", f"{tmpdir}/errors"
    clicks.coalesce(1).write.parquet(cdir)
    errors.coalesce(1).write.parquet(edir)

    expect = {
        _key(r)
        for r in interval_join_streams(
            clicks, errors, ["user_id"], "0 seconds", "2 hours"
        ).collect()
    }
    assert expect  # the fixture must actually exercise the join

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    es = spark.readStream.schema(errors.schema).parquet(edir)
    joined = interval_join_streams(cs, es, ["user_id"], "0 seconds", "2 hours")
    q = (
        joined.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {_key(r) for r in spark.sql("SELECT * FROM sjoin").collect()}
    assert got == expect


def test_stream_join_interval_bounds_are_closed(spark):
    """Rows exactly at l.ts + lower and l.ts + upper are kept; one second
    outside either bound is dropped."""
    import datetime as dt

    from tagtree_spark.streaming.joins import interval_join_streams

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0, 7)], ["event_id", "ts", "user_id"])
    right = spark.createDataFrame(
        [
            (10, t0 - dt.timedelta(seconds=1), 7),  # before lower
            (11, t0, 7),  # == lower bound
            (12, t0 + dt.timedelta(hours=2), 7),  # == upper bound
            (13, t0 + dt.timedelta(hours=2, seconds=1), 7),  # past upper
            (14, t0, 8),  # wrong key
        ],
        ["event_id", "ts", "user_id"],
    )
    got = sorted(
        r.r_event_id
        for r in interval_join_streams(
            left, right, ["user_id"], "0 seconds", "2 hours"
        ).collect()
    )
    assert got == [11, 12]
