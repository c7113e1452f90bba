"""Streaming CEP must equal the batch sequence_match after draining an
arbitrarily split stream — cross-batch merge of out-of-order arrivals is
the point."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tagtree_spark.operators.events import sequence_match
from tagtree_spark.streaming.cep import sequence_match_stream

SYMBOLS = {"signup": "s", "view": "v", "click": "c", "purchase": "p"}
PATTERN = "s[vc]*p"
COLS = [
    "n_matches",
    "first_pos",
    "first_len",
    "first_event_id",
    "first_ts_us",
    "first_span_us",
]


def _tmp_root() -> str:
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(d, exist_ok=True)
    return d


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-cep-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_cep_matches_batch_across_interleaved_batches(events, tmpdir, spark):
    # split by event_id parity → each user's sequence straddles both
    # micro-batches with interleaved timestamps (the ordered-merge test)
    ev = events.select("user_id", "ts", "event_id", "event_type")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{tmpdir}/in/b0")
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{tmpdir}/in/b1")
    schema = spark.read.parquet(f"{tmpdir}/in/b0").schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/in/*")
    )
    out = sequence_match_stream(stream, PATTERN, SYMBOLS)
    outdir = f"{tmpdir}/out"

    def sink(df, bid):
        df.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(outdir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(outdir)
    latest = (
        got_df.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.col("batch_id").desc())
            ),
        )
        .where((F.col("rn") == 1) & (F.col("n_matches") >= 1))
        .drop("rn", "batch_id")
    )
    got = {r.user_id: tuple(r[c] for c in COLS) for r in latest.collect()}
    expect = {
        r.user_id: tuple(r[c] for c in COLS)
        for r in sequence_match(ev, PATTERN, SYMBOLS).collect()
    }
    assert got == expect and len(expect) > 0


def test_stream_cep_state_survives_checkpoint_restart(events, tmpdir, spark):
    """Two SEPARATE availableNow runs over the same checkpoint: the second
    run must restore per-key state from the state store (not reprocess
    batch 0) and still converge to the batch result."""
    import shutil as _sh

    ev = events.select("user_id", "ts", "event_id", "event_type")
    indir = f"{tmpdir}/in"
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{indir}/b0")
    schema = spark.read.parquet(f"{indir}/b0").schema
    outdir = f"{tmpdir}/out"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{indir}/*")
        )
        out = sequence_match_stream(stream, PATTERN, SYMBOLS)
        q = (
            out.writeStream.foreachBatch(
                lambda df, bid: df.withColumn("batch_id", F.lit(bid))
                .write.mode("append")
                .parquet(outdir)
            )
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()  # drains b0, checkpoints state
    # second half arrives AFTER the first run finished
    tmp_b1 = f"{tmpdir}/staging-b1"
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(tmp_b1)
    _sh.move(tmp_b1, f"{indir}/b1")
    run()  # restart from checkpoint picks up ONLY b1

    got_df = spark.read.parquet(outdir)
    from pyspark.sql.window import Window

    latest = (
        got_df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
            ),
        )
        .where((F.col("rn") == 1) & (F.col("n_matches") >= 1))
    )
    got = {r.user_id: tuple(r[c] for c in COLS) for r in latest.collect()}
    expect = {
        r.user_id: tuple(r[c] for c in COLS)
        for r in sequence_match(ev, PATTERN, SYMBOLS).collect()
    }
    assert got == expect and len(expect) > 0
