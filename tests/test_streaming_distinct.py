"""Streaming HLL distinct (streaming/distinct.py): per-batch register
segments, merge-on-read estimate, replay idempotence, re-aggregating
compaction — stream result must equal the batch sketch over all data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("u"), F.col("id")).alias("user"),
        (F.col("id") % 3).cast("string").alias("g"),
    )


def test_stream_equals_batch_sketch(spark, tmpdir):
    from tagtree_spark.operators.sketch import hll_registers
    from tagtree_spark.streaming.distinct import DistinctSink, read_registers

    sink = DistinctSink(f"{tmpdir}/regs", "user", ["g"])
    for b, (lo, hi) in enumerate([(0, 400), (400, 900), (900, 1500)]):
        sink(_df(spark, lo, hi), b)
    stream_regs = {
        (r.g, r._b, r._m)
        for r in read_registers(spark, f"{tmpdir}/regs", ["g"]).collect()
    }
    batch_regs = {
        (r.g, r._b, r._m)
        for r in hll_registers(_df(spark, 0, 1500), "user", ["g"]).collect()
    }
    assert stream_regs == batch_regs


def test_stream_distinct_replay_and_estimate(spark, tmpdir):
    from tagtree_spark.streaming.distinct import DistinctSink, read_estimate

    sink = DistinctSink(f"{tmpdir}/regs", "user")
    sink(_df(spark, 0, 1000), 0)
    sink(_df(spark, 500, 2000), 1)  # overlap: distinct = 2000
    e1 = read_estimate(spark, f"{tmpdir}/regs").first()
    sink(_df(spark, 500, 2000), 1)  # replay batch 1 → unchanged
    e2 = read_estimate(spark, f"{tmpdir}/regs").first()
    assert e1.hll_estimate == e2.hll_estimate
    assert abs(e1.hll_estimate - 2000) < 0.4 * 2000  # m=64 error band


def test_stream_distinct_compaction(spark, tmpdir):
    from tagtree_spark.streaming.distinct import DistinctSink, read_estimate

    sink = DistinctSink(f"{tmpdir}/regs", "user", compact_every=3)
    for b in range(5):
        sink(_df(spark, b * 100, (b + 1) * 100), b)
    segs = glob.glob(f"{tmpdir}/regs/seg-*")
    assert any(s.endswith("-base") for s in segs) and len(segs) <= 3
    e = read_estimate(spark, f"{tmpdir}/regs").first()
    assert abs(e.hll_estimate - 500) < 0.4 * 500
