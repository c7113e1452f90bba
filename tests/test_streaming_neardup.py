"""Streaming near-dup (streaming/neardup.py): incoming batches are checked
against the accumulated signature store; cross-batch hits must not depend
on id ordering; replay is idempotent."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def _text(prefix, n=30):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_streaming_neardup_cross_and_within_batch(spark, tmpdir):
    from tagtree_spark.streaming.neardup import NearDupSink, read_matches

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches")
    a, b, c = _text("w"), _text("z"), _text("q")

    # batch 0: doc 100 (a), doc 101 (b), doc 102 (a) — within-batch pair
    sink(_docs(spark, [(100, a, "en", "s", 1), (101, b, "en", "s", 1), (102, a, "en", "s", 1)]), 0)
    m0 = {(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert m0 == {(102, 100)}

    # batch 1: doc 50 duplicates doc 101 from batch 0 — LOWER id than the
    # seen doc (the ordering trap); doc 51 is novel
    sink(_docs(spark, [(50, b, "en", "s", 1), (51, c, "en", "s", 1)]), 1)
    m1 = {(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (50, 101) in m1
    assert not any(new in (51,) for new, _ in m1)

    # replay batch 1 (crash recovery): same segment rewritten, no dup rows
    sink(_docs(spark, [(50, b, "en", "s", 1), (51, c, "en", "s", 1)]), 1)
    m2 = [(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()]
    assert sorted(m2) == sorted(m1)


def test_streaming_neardup_store_accumulates(spark, tmpdir):
    from tagtree_spark.streaming.neardup import NearDupSink, read_signature_store

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches")
    sink(_docs(spark, [(1, _text("a"), "en", "s", 1)]), 0)
    sink(_docs(spark, [(2, _text("b"), "en", "s", 1)]), 1)
    store = read_signature_store(spark, f"{tmpdir}/store")
    assert {r.doc_id for r in store.select("doc_id").distinct().collect()} == {1, 2}


def test_streaming_neardup_hot_band_capped(spark, tmpdir):
    """A degenerate band (identical boilerplate docs) must NOT pair every
    doc against the whole band: bands over max_band are dropped and the
    drop is counted in the _hot_stats telemetry segment."""
    from tagtree_spark.streaming.neardup import (
        NearDupSink,
        read_hot_stats,
        read_matches,
    )

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches", max_band=5)
    boiler = _text("same")
    rows = [(i, boiler, "en", "s", 1) for i in range(100, 110)]
    sink(_docs(spark, rows), 0)
    m = read_matches(spark, f"{tmpdir}/matches")
    assert m.count() == 0  # all candidate bands were hot → dropped
    stats = read_hot_stats(spark, f"{tmpdir}/store").collect()
    assert len(stats) == 1
    assert stats[0].n_hot_bands > 0
    assert stats[0].dropped_rows >= 10  # every band held all 10 docs

    # a later NON-degenerate batch still matches normally against the store
    fresh = _text("fresh")
    sink(_docs(spark, [(200, fresh, "en", "s", 1), (201, fresh, "en", "s", 1)]), 1)
    m1 = {(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (201, 200) in m1


def test_streaming_neardup_store_read_prunes_partitions(spark, tmpdir):
    """Store segments are partitioned by band_pfx; a pfx-filtered read must
    show partition filters in the scan (pruned directories, not a full
    store scan per batch)."""
    from tagtree_spark.streaming.neardup import NearDupSink, read_signature_store

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches")
    sink(_docs(spark, [(1, _text("a"), "en", "s", 1), (2, _text("b"), "en", "s", 1)]), 0)
    full = read_signature_store(spark, f"{tmpdir}/store")
    pfxs = sorted(r[0] for r in full.select("band_pfx").distinct().collect())
    assert len(pfxs) >= 2
    some = pfxs[:1]
    pruned = read_signature_store(spark, f"{tmpdir}/store", band_pfx=some)
    got = sorted(r[0] for r in pruned.select("band_pfx").distinct().collect())
    assert got == some
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band_pfx" in plan


def test_streaming_neardup_empty_batch_does_not_poison_store(spark, tmpdir):
    """A batch whose docs are ALL filtered out (<3 words) must not write a
    dataless partitioned segment — that segment would break every later
    store read with UNABLE_TO_INFER_SCHEMA (ADVICE r4 high). The absent
    segment is the replay-idempotent equivalent."""
    import glob

    from tagtree_spark.streaming.neardup import NearDupSink, read_matches

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches")
    a = _text("a")
    sink(_docs(spark, [(1, a, "en", "s", 1)]), 0)
    # batch 1: every doc has <3 words → zero signature rows
    sink(_docs(spark, [(2, "hi", "en", "s", 1), (3, "x y", "en", "s", 1)]), 1)
    assert not glob.glob(f"{tmpdir}/store/seg-0000000001*")
    # batch 2 still reads the store and matches against batch 0
    sink(_docs(spark, [(4, a, "en", "s", 1)]), 2)
    m = {(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (4, 1) in m


def test_streaming_neardup_store_compaction(spark, tmpdir):
    """compact_every folds store segments into a band_pfx-partitioned base:
    segment count bounded, matches identical before/after, later batches
    still see the full corpus."""
    import glob

    from tagtree_spark.streaming.neardup import (
        NearDupSink,
        read_matches,
        read_signature_store,
    )

    sink = NearDupSink(f"{tmpdir}/store", f"{tmpdir}/matches", compact_every=3)
    texts = {i: _text(f"t{i}") for i in range(5)}
    for b in range(5):
        sink(_docs(spark, [(b * 10, texts[b], "en", "s", 1)]), b)
    # batch 3 triggered compaction of segs 0-2 → base + segs 3,4
    segs = glob.glob(f"{tmpdir}/store/seg-*")
    assert any(s.endswith("-base") for s in segs)
    assert len(segs) <= 3, segs
    store = read_signature_store(spark, f"{tmpdir}/store")
    assert {r.doc_id for r in store.select("doc_id").distinct().collect()} == {0, 10, 20, 30, 40}
    assert "band_pfx" in store.columns
    # a duplicate of a pre-compaction doc is still caught through the base
    sink(_docs(spark, [(99, texts[0], "en", "s", 1)]), 5)
    m = {(r.new_doc, r.seen_doc) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (99, 0) in m
