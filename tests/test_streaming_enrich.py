"""Streaming as-of enrichment: the drained foreachBatch stream must equal
the batch point-in-time join bit-for-bit, and replaying a batch id must be
idempotent."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tagtree_spark.streaming.enrich import AsofEnrichSink, asof_enrich, read_enriched


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-enrich-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _frames(spark):
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(minutes=7 * i), i % 3)
            for i in range(40)
        ],
        "event_id bigint, ts timestamp, tsid bigint",
    )
    dim = spark.createDataFrame(
        [
            (k, t0 + dt.timedelta(minutes=30 * j), float(k * 100 + j))
            for k in range(3)
            for j in range(8)
        ],
        "tsid bigint, ts timestamp, value double",
    )
    return ev, dim


def test_streaming_enrich_matches_batch_and_replays(spark, tmpdir):
    ev, dim = _frames(spark)
    files = f"{tmpdir}/files"
    os.makedirs(files)
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{files}/b0")
    ev.where(F.col("event_id") % 2 != 0).coalesce(1).write.parquet(f"{files}/b1")
    schema = spark.read.parquet(f"{files}/b0").schema

    lookback = dt.timedelta(hours=1)
    sink = AsofEnrichSink(dim, f"{tmpdir}/out", lookback)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{files}/*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.event_id, r.ev_us, r.tsid, r.dim_ts_us, r.dim_value)
        for r in read_enriched(spark, f"{tmpdir}/out").collect()
    }
    expect = {
        (r.event_id, r.ev_us, r.tsid, r.dim_ts_us, r.dim_value)
        for r in asof_enrich(ev, dim, lookback).collect()
    }
    assert got == expect and len(got) > 10

    # replay: re-running a batch id overwrites the same segment, no dupes
    sink(spark.read.parquet(f"{files}/b0"), 0)
    again = {
        (r.event_id, r.ev_us, r.tsid, r.dim_ts_us, r.dim_value)
        for r in read_enriched(spark, f"{tmpdir}/out").collect()
    }
    assert again == expect

    # empty batch writes nothing (no segment poisoning)
    sink(spark.read.parquet(f"{files}/b0").where(F.lit(False)), 99)
    assert not os.path.exists(f"{tmpdir}/out/seg-99-delta")
