"""applyInPandasWithState: the custom stateful operator harness must agree
with the batch groundtruth after draining the stream."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tagtree_spark.streaming.state import track_series_activity
from tagtree_spark.tsdb.model import LABEL_NAMES, with_labels


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-state-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_activity_matches_batch(events, tmpdir, spark):
    events_dir = f"{tmpdir}/events"
    events.coalesce(1).write.parquet(events_dir)  # one file → one micro-batch
    schema = spark.read.parquet(events_dir).schema

    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = track_series_activity(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("activity")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r[n] for n in LABEL_NAMES): (r.n_events, r.first_us, r.last_us)
        for r in spark.sql("SELECT * FROM activity").collect()
    }
    expect = {
        tuple(r[n] for n in LABEL_NAMES): (r.n, r.f, r.l)
        for r in with_labels(events)
        .groupBy(*LABEL_NAMES)
        .agg(
            F.count("*").alias("n"),
            F.unix_micros(F.min("ts")).alias("f"),
            F.unix_micros(F.max("ts")).alias("l"),
        )
        .collect()
    }
    assert got == expect
