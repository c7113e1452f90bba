"""Streaming upsert store (streaming/cdc.py): versioned change segments,
argmax snapshot reads, tombstone-preserving compaction, replay
idempotence — the stream must equal apply_changes() folded batch-by-batch."""

from __future__ import annotations

import glob


def _snap_dict(df):
    return {r.doc_id: r.text for r in df.collect()}


def _changes(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, op string, text string")


def test_stream_upserts_equal_sequential_merge(spark, tmpdir):
    from tagtree_spark.operators.cdc import apply_changes
    from tagtree_spark.streaming.cdc import UpsertSink, read_snapshot

    b0 = [(1, "I", "one"), (2, "I", "two"), (3, "I", "three")]
    b1 = [(2, "U", "TWO"), (4, "I", "four")]
    b2 = [(3, "D", None), (1, "U", "ONE")]
    sink = UpsertSink(f"{tmpdir}/ups")
    base = spark.createDataFrame([], "doc_id bigint, text string")
    expected = base
    for i, rows in enumerate([b0, b1, b2]):
        sink(_changes(spark, rows), i)
        expected = apply_changes(expected, _changes(spark, rows))
    got = read_snapshot(spark, f"{tmpdir}/ups")
    assert _snap_dict(got) == _snap_dict(expected) == {1: "ONE", 2: "TWO", 4: "four"}
    # time travel to version 1 (pre-compaction: full history available)
    v1 = read_snapshot(spark, f"{tmpdir}/ups", version=1)
    assert _snap_dict(v1) == {1: "one", 2: "TWO", 3: "three", 4: "four"}


def test_stream_upserts_replay_idempotent(spark, tmpdir):
    from tagtree_spark.streaming.cdc import UpsertSink, read_snapshot

    sink = UpsertSink(f"{tmpdir}/ups")
    sink(_changes(spark, [(1, "I", "a"), (2, "I", "b")]), 0)
    sink(_changes(spark, [(2, "U", "B")]), 1)
    before = _snap_dict(read_snapshot(spark, f"{tmpdir}/ups"))
    sink(_changes(spark, [(2, "U", "B")]), 1)  # replay batch 1
    assert _snap_dict(read_snapshot(spark, f"{tmpdir}/ups")) == before == {1: "a", 2: "B"}


def test_compaction_preserves_snapshot_and_tombstones(spark, tmpdir):
    from tagtree_spark.streaming.cdc import UpsertSink, read_snapshot

    sink = UpsertSink(f"{tmpdir}/ups", compact_every=3)
    sink(_changes(spark, [(1, "I", "a"), (2, "I", "b")]), 0)
    sink(_changes(spark, [(1, "D", None)]), 1)       # tombstone for 1
    sink(_changes(spark, [(3, "I", "c")]), 2)
    sink(_changes(spark, [(4, "I", "d")]), 3)        # triggers compaction of 0-2
    segs = glob.glob(f"{tmpdir}/ups/seg-*")
    assert any(s.endswith("-base") for s in segs) and len(segs) <= 2
    # key 1's tombstone must survive the fold: 1 stays deleted
    assert _snap_dict(read_snapshot(spark, f"{tmpdir}/ups")) == {2: "b", 3: "c", 4: "d"}


def test_empty_batch_safe(spark, tmpdir):
    from tagtree_spark.streaming.cdc import UpsertSink, read_snapshot

    sink = UpsertSink(f"{tmpdir}/ups")
    sink(_changes(spark, [(1, "I", "a")]), 0)
    sink(spark.createDataFrame([], "doc_id bigint, op string, text string"), 1)
    assert _snap_dict(read_snapshot(spark, f"{tmpdir}/ups")) == {1: "a"}


def test_same_version_ties_resolve_deterministically(spark, tmpdir):
    """Two change rows for one key in ONE batch (same _v) must fold the
    same way on every read/replay: op precedence D > U > I (ADVICE r5)."""
    from tagtree_spark.streaming.cdc import UpsertSink, compact_upserts, read_snapshot

    sink = UpsertSink(f"{tmpdir}/ups", compact_every=None)
    # key 1: I and D in the same batch -> D shadows (conservative)
    # key 2: I and U in the same batch -> U shadows I
    sink(_changes(spark, [(1, "I", "a"), (1, "D", None), (2, "I", "b"), (2, "U", "B")]), 0)
    first = _snap_dict(read_snapshot(spark, f"{tmpdir}/ups"))
    assert first == {2: "B"}
    for _ in range(3):  # re-reads are stable
        assert _snap_dict(read_snapshot(spark, f"{tmpdir}/ups")) == first
    # the fold path uses the same tie-break: compacting must not flip it
    sink(_changes(spark, [(3, "I", "c")]), 1)
    compact_upserts(spark, f"{tmpdir}/ups", before_batch=2)
    assert _snap_dict(read_snapshot(spark, f"{tmpdir}/ups")) == {2: "B", 3: "c"}


def test_snapshot_as_of_tie_break(spark):
    """Batch time travel (operators/cdc.py) shares the deterministic
    tie-break: D beats U beats I within one (key, version)."""
    from tagtree_spark.operators.cdc import snapshot_as_of

    log = spark.createDataFrame(
        [(1, 0, "I", "a"), (1, 0, "D", None), (2, 0, "I", "b"), (2, 0, "U", "B")],
        "doc_id bigint, version bigint, op string, text string",
    )
    got = {r.doc_id: r.text for r in snapshot_as_of(log, 0).collect()}
    assert got == {2: "B"}
