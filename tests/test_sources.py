"""PySpark-4 Python data source over segment stores (tagtree_spark/
sources.py): the base-shadowing + replay-exclusion read protocol via plain
spark.read.format(...)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS event_type",
        "CAST(10 + (id % 7) AS DOUBLE) AS value",
    )


def _momset(df):
    return {(r.key, str(r.n), str(r.s), str(r.q)) for r in df.collect()}


def test_source_reads_match_helper(spark, tmpdir):
    from tagtree_spark import sources
    from tagtree_spark.streaming.moments import MomentsSink, read_moments

    sink = MomentsSink(f"{tmpdir}/mom")
    for b, (lo, hi) in enumerate([(0, 300), (300, 700), (700, 1000)]):
        sink(_df(spark, lo, hi), b)
    sources.register(spark)
    raw = (
        spark.read.format("tagtree_segments")
        .option("path", f"{tmpdir}/mom")
        .load()
    )
    merged = raw.groupBy("key").agg(
        F.sum("n").cast("decimal(38,0)").alias("n"),
        F.sum("s").cast("decimal(38,0)").alias("s"),
        F.sum("q").cast("decimal(38,0)").alias("q"),
    )
    assert _momset(merged) == _momset(read_moments(spark, f"{tmpdir}/mom"))


def test_source_before_batch_and_base_shadowing(spark, tmpdir):
    from tagtree_spark import sources
    from tagtree_spark.streaming.moments import (
        MomentsSink,
        compact_moments,
        read_moments,
    )

    sink = MomentsSink(f"{tmpdir}/mom", compact_every=None)
    for b in range(4):
        sink(_df(spark, b * 100, (b + 1) * 100), b)
    sources.register(spark)

    def load(**opts):
        r = spark.read.format("tagtree_segments").option("path", f"{tmpdir}/mom")
        for k, v in opts.items():
            r = r.option(k, v)
        return load_merge(r.load())

    def load_merge(raw):
        return raw.groupBy("key").agg(
            F.sum("n").cast("decimal(38,0)").alias("n"),
            F.sum("s").cast("decimal(38,0)").alias("s"),
            F.sum("q").cast("decimal(38,0)").alias("q"),
        )

    # replay exclusion: before_batch=2 sees only batches 0 and 1
    assert _momset(load(before_batch=2)) == _momset(
        read_moments(spark, f"{tmpdir}/mom", before_batch=2)
    )
    # base shadowing: after compaction the source must not double-count
    compact_moments(spark, f"{tmpdir}/mom", before_batch=4)
    assert _momset(load()) == _momset(read_moments(spark, f"{tmpdir}/mom"))


def test_schema_requires_path_option():
    """schema() with no path must report the missing option, not a
    confusing "no complete segments under ''" (ADVICE r5)."""
    import pytest

    from tagtree_spark.sources import SegmentDataSource

    src = SegmentDataSource(options={})
    with pytest.raises(ValueError, match=r"requires \.option\('path'"):
        src.schema()


def test_stream_reader_refuses_compacted_store(spark, tmpdir):
    """Tailing a store that has already compacted must fail loudly (the
    folded history is gone from the delta log) unless the caller opts
    into start_after_base (ADVICE r5)."""
    import pytest

    from tagtree_spark.sources import SegmentStreamReader
    from tagtree_spark.streaming.moments import MomentsSink, compact_moments

    store = f"{tmpdir}/mom-compacted"
    sink = MomentsSink(store, compact_every=None)
    for b in range(4):
        sink(_df(spark, b * 100, (b + 1) * 100), b)
    compact_moments(spark, store, before_batch=3)  # folds 0-2, delta 3 stays

    r = SegmentStreamReader({"path": store})
    with pytest.raises(ValueError, match="has compacted"):
        r.initialOffset()
    # compaction overrunning a committed offset is also loud
    with pytest.raises(ValueError, match="overran"):
        r.partitions({"batch": 1}, {"batch": 4})

    # opting in starts at base_horizon+1: only the post-compaction delta
    r2 = SegmentStreamReader({"path": store, "start_after_base": "true"})
    start = r2.initialOffset()
    assert start == {"batch": 3}
    parts = r2.partitions(start, r2.latestOffset())
    assert parts and all("seg-0000000003-delta" in p.path for p in parts)

    # latestOffset is MONOTONE under compaction (ADVICE r6 medium): fold
    # EVERY delta into the base — the delta log is now empty, but the
    # offset must stay floored at base_horizon+1, not regress to 0 (a
    # regressed offset gets committed and partitions() then kills the
    # stream with a spurious 'overran' error).
    compact_moments(spark, store, before_batch=4)  # folds delta 3 too
    assert r2.latestOffset() == {"batch": 4}
    assert r2.partitions({"batch": 4}, r2.latestOffset()) == []
    # a fresh opt-in stream on the fully-compacted store agrees end-to-end
    r3 = SegmentStreamReader({"path": store, "start_after_base": "true"})
    assert r3.initialOffset() == {"batch": 4} == r3.latestOffset()


def test_stream_reader_tails_delta_segments(spark, tmpdir):
    from tagtree_spark import sources
    from tagtree_spark.streaming.moments import MomentsSink

    store = f"{tmpdir}/mom-stream"
    sink = MomentsSink(store, compact_every=None)
    for b in range(3):
        sink(_df(spark, b * 100, (b + 1) * 100), b)
    sources.register(spark)
    q = (
        spark.readStream.format("tagtree_segments")
        .option("path", store)
        .load()
        .writeStream.format("memory")
        .queryName("seg_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT key, CAST(sum(n) AS STRING) n, CAST(sum(s) AS STRING) s,"
        " CAST(sum(q) AS STRING) q FROM seg_tail GROUP BY key"
    )
    from tagtree_spark.streaming.moments import read_moments

    assert {(r.key, r.n, r.s, r.q) for r in got.collect()} == _momset(
        read_moments(spark, store)
    )
