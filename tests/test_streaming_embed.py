"""Streaming embedding near-dup (streaming/embed.py): batches are checked
against the accumulated vector store via hyperplane-LSH buckets + cosine
verification; hot buckets are capped; the store is bucket-partitioned."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )


def _v(seed, dim=64, flip=0):
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{seed}#{i}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    for i in range(flip):
        out[i] = -out[i]
    return out


def test_embed_dedup_cross_and_within_batch(spark, tmpdir):
    from tagtree_spark.streaming.embed import EmbedDedupSink, read_matches

    sink = EmbedDedupSink(f"{tmpdir}/store", f"{tmpdir}/matches", threshold=0.9)
    a, b = _v("a"), _v("b")
    # batch 0: 100 and 102 are identical (within-batch pair)
    sink(_vecs(spark, [(100, a), (101, b), (102, a)]), 0)
    m0 = {(r.new_vec, r.seen_vec) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert m0 == {(102, 100)}
    # batch 1: 50 duplicates 101 from batch 0 (lower id than seen)
    sink(_vecs(spark, [(50, b), (51, _v("c"))]), 1)
    m1 = {(r.new_vec, r.seen_vec) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (50, 101) in m1
    # replay batch 1: idempotent
    sink(_vecs(spark, [(50, b), (51, _v("c"))]), 1)
    m2 = [(r.new_vec, r.seen_vec) for r in read_matches(spark, f"{tmpdir}/matches").collect()]
    assert sorted(m2) == sorted(m1)


def test_embed_store_partitioned_and_pruned(spark, tmpdir):
    from tagtree_spark.streaming.embed import EmbedDedupSink, read_vector_store

    sink = EmbedDedupSink(f"{tmpdir}/store", f"{tmpdir}/matches")
    sink(_vecs(spark, [(1, _v("a")), (2, _v("b")), (3, _v("c"))]), 0)
    assert glob.glob(f"{tmpdir}/store/seg-*/bucket=*")
    full = read_vector_store(spark, f"{tmpdir}/store")
    bks = sorted({r[0] for r in full.select("bucket").distinct().collect()})
    pruned = read_vector_store(spark, f"{tmpdir}/store", buckets=bks[:1])
    assert {r[0] for r in pruned.select("bucket").distinct().collect()} == set(bks[:1])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_embed_hot_bucket_capped(spark, tmpdir):
    from tagtree_spark.streaming.embed import EmbedDedupSink, read_matches

    sink = EmbedDedupSink(f"{tmpdir}/store", f"{tmpdir}/matches", max_bucket=3)
    a = _v("hot")
    rows = [(i, a) for i in range(10)]  # one bucket holds all 10
    sink(_vecs(spark, rows), 0)
    m = read_matches(spark, f"{tmpdir}/matches")
    assert m.count() == 0
    import pyspark.sql

    stats = spark.read.parquet(f"{tmpdir}/store/_hot_stats/seg-0000000000").collect()
    assert stats[0].n_hot_buckets >= 1 and stats[0].dropped_rows >= 10


def test_embed_store_compaction(spark, tmpdir):
    from tagtree_spark.streaming.embed import EmbedDedupSink, read_matches

    sink = EmbedDedupSink(f"{tmpdir}/store", f"{tmpdir}/matches", compact_every=3)
    for b in range(5):
        sink(_vecs(spark, [(b * 10, _v(f"s{b}"))]), b)
    segs = glob.glob(f"{tmpdir}/store/seg-*")
    assert any(s.endswith("-base") for s in segs) and len(segs) <= 3
    # duplicate of a pre-compaction vector still caught through the base
    sink(_vecs(spark, [(99, _v("s0"))]), 5)
    m = {(r.new_vec, r.seen_vec) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (99, 0) in m


def test_embed_empty_batch_does_not_poison_store(spark, tmpdir):
    """A zero-row micro-batch must not write a dataless bucket-partitioned
    segment (would break every later store read; ADVICE r4 high)."""
    from tagtree_spark.streaming.embed import EmbedDedupSink, read_matches

    sink = EmbedDedupSink(f"{tmpdir}/store", f"{tmpdir}/matches", threshold=0.9)
    a = _v("a")
    sink(_vecs(spark, [(1, a)]), 0)
    sink(_vecs(spark, []), 1)  # empty batch
    assert not glob.glob(f"{tmpdir}/store/seg-0000000001*")
    sink(_vecs(spark, [(2, a)]), 2)
    m = {(r.new_vec, r.seen_vec) for r in read_matches(spark, f"{tmpdir}/matches").collect()}
    assert (2, 1) in m
