"""Streaming exact moments (streaming/moments.py): per-batch additive
partials, merge-on-read sums, replay idempotence, re-aggregating
compaction — merged stream moments must EQUAL the batch moments over all
data (exact integers, not an estimate), and flagging against the merged
baseline must equal the batch z-score screen."""

from __future__ import annotations

import glob


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS event_type",
        "CAST(10 + (id % 7) AS DOUBLE) AS value",
    )


def _momset(df):
    return {(r.key, str(r.n), str(r.s), str(r.q)) for r in df.collect()}


def test_stream_moments_equal_batch_and_replay(spark, tmpdir):
    from tagtree_spark.operators.anomaly import moment_partials
    from tagtree_spark.streaming.moments import MomentsSink, read_moments

    sink = MomentsSink(f"{tmpdir}/mom")
    for b, (lo, hi) in enumerate([(0, 300), (300, 700), (700, 1000)]):
        sink(_df(spark, lo, hi), b)
    merged = read_moments(spark, f"{tmpdir}/mom")
    batch = moment_partials(_df(spark, 0, 1000))
    assert _momset(merged) == _momset(batch)
    # replay batch 2 → overwrite, still equal (idempotent by segment name)
    sink(_df(spark, 700, 1000), 2)
    assert _momset(read_moments(spark, f"{tmpdir}/mom")) == _momset(batch)


def test_stream_flagging_equals_batch_zscore(spark, tmpdir):
    from pyspark.sql import functions as F

    from tagtree_spark.operators.anomaly import (
        flag_against_moments,
        zscore_outliers,
    )
    from tagtree_spark.streaming.moments import MomentsSink, read_moments

    # all data, with one planted extreme value
    full = _df(spark, 0, 500).unionByName(
        _df(spark, 500, 501).withColumn("value", F.lit(9999.0))
    )
    sink = MomentsSink(f"{tmpdir}/mom")
    sink(full.where("event_id < 250"), 0)
    sink(full.where("event_id >= 250"), 1)
    baseline = read_moments(spark, f"{tmpdir}/mom")
    got = {r.id: r.is_outlier for r in flag_against_moments(full, baseline).collect()}
    want = {r.id: r.is_outlier for r in zscore_outliers(full).collect()}
    assert got == want
    assert got[500] == 1


def test_stream_moments_compaction_preserves_sums(spark, tmpdir):
    from tagtree_spark.operators.anomaly import moment_partials
    from tagtree_spark.streaming.moments import MomentsSink, read_moments

    sink = MomentsSink(f"{tmpdir}/mom", compact_every=3)
    for b in range(5):
        sink(_df(spark, b * 100, (b + 1) * 100), b)
    segs = glob.glob(f"{tmpdir}/mom/seg-*")
    assert any(s.endswith("-base") for s in segs) and len(segs) <= 3
    assert _momset(read_moments(spark, f"{tmpdir}/mom")) == _momset(
        moment_partials(_df(spark, 0, 500))
    )


def test_stream_moments_empty_batch_safe(spark, tmpdir):
    from tagtree_spark.operators.anomaly import moment_partials
    from tagtree_spark.streaming.moments import MomentsSink, read_moments

    sink = MomentsSink(f"{tmpdir}/mom")
    sink(_df(spark, 0, 100), 0)
    sink(_df(spark, 0, 0), 1)  # zero-row batch must not poison the store
    assert _momset(read_moments(spark, f"{tmpdir}/mom")) == _momset(
        moment_partials(_df(spark, 0, 100))
    )
