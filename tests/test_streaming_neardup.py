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
