"""Streaming session windows: the drained append-mode stream must equal the
batch session aggregation bit-for-bit, including sessions whose events are
split across micro-batches (state-store session merge)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tagtree_spark.streaming.sessions import sessionize_stream


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-sess-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_sessions_match_batch(events, tmpdir, spark):
    ev = events.select("user_id", "ts", "value")

    # Two real micro-batch files split by timestamp parity so a user's own
    # events land in BOTH batches -> exercises cross-batch session merging
    # AND out-of-order arrival (batch 1 replays seconds older than batch
    # 0's max; the 365d watermark delay keeps them inside the lateness
    # bound, so none are dropped); then two sentinel files (user -1,
    # far-future ts): the first advances the watermark past every real
    # session (2100 - 365d >> 2024), the second triggers the batch in
    # which those sessions are evicted/emitted.
    files = f"{tmpdir}/files"
    os.makedirs(files)
    par = F.unix_timestamp("ts") % 2
    ev.where(par == 0).coalesce(1).write.parquet(f"{files}/b0")
    ev.where(par != 0).coalesce(1).write.parquet(f"{files}/b1")
    far = dt.datetime(2100, 1, 1)
    sent = spark.createDataFrame(
        [(-1, far, 0.0)], "user_id bigint, ts timestamp, value double"
    )
    sent.coalesce(1).write.parquet(f"{files}/b2")
    sent.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY")).coalesce(
        1
    ).write.parquet(f"{files}/b3")

    schema = spark.read.parquet(f"{files}/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{files}/*")
    )
    out = sessionize_stream(stream, gap="1 hour", watermark="365 days")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.start, r.end): (r.n_events, r.v_sum)
        for r in spark.sql("SELECT * FROM sessions WHERE user_id >= 0").collect()
    }
    expect = {
        (r.user_id, r.start, r.end): (r.n_events, r.v_sum)
        for r in sessionize_stream(ev, gap="1 hour").collect()
    }
    assert got == expect
    assert len(got) > 0
    # sanity: sessions actually merged across the two real batches — at
    # least one session has >1 event (parity split puts consecutive events
    # of a user in the same file only if ids alternate; the gap guarantees
    # multi-event sessions exist in this dataset)
    assert any(n > 1 for n, _ in got.values())
