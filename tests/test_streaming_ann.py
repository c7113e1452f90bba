"""Streaming ANN-index maintenance (streaming/ann.py): micro-batches of
vectors are PQ-encoded against frozen offline codebooks and appended as
cid-partitioned code segments; the streamed store must equal the
batch-built IVF+PQ index bit-for-bit (everything on the integer grid)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F


def _codebooks(embeddings, n_cells=8, ks=16, n_sub=8, dim=64):
    """The deterministic first-n stand-in codebooks as explicit lists —
    the same values materialize_ivfpq derives internally, so stream and
    batch paths share the exact codebooks."""
    first = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in embeddings.where(F.col("vec_id") < max(n_cells, ks)).collect()
    }
    d_sub = dim // n_sub
    coarse = [first[i] for i in range(n_cells)]
    pq = [
        [first[c][m * d_sub : (m + 1) * d_sub] for c in range(ks)]
        for m in range(n_sub)
    ]
    return coarse, pq


def _codes_set(df):
    return {(r.vec_id, r.m, r.code, int(r.cid)) for r in df.collect()}


def test_streaming_ann_equals_batch_index(spark, embeddings, tmpdir):
    from tagtree_spark.operators.similarity import materialize_ivfpq, pq_adc_topk
    from tagtree_spark.streaming.ann import AnnIndexSink, ann_store_topk, read_codes

    coarse, pq = _codebooks(embeddings)
    store = f"{tmpdir}/ann-store"
    sink = AnnIndexSink(store, coarse, pq, compact_every=None)
    for b in range(3):
        sink(embeddings.where(F.col("vec_id") % 3 == b), b)
    # segments are cid-partitioned directories
    assert glob.glob(f"{store}/seg-*/cid=*")

    # stream == batch: codes equal the batch-built index exactly
    batch_dir = f"{tmpdir}/ann-batch"
    materialize_ivfpq(embeddings, batch_dir, codebook=coarse, codebooks=pq)
    streamed = read_codes(spark, store)
    batch = spark.read.option("basePath", f"{batch_dir}/codes").parquet(
        f"{batch_dir}/codes"
    )
    assert _codes_set(streamed) == _codes_set(batch)

    # full probe over the streamed store == in-memory ADC ranking
    got = [
        (r.vec_id, r.adist)
        for r in ann_store_topk(spark, store, embeddings, 0, k=10, nprobe=8).collect()
    ]
    mem = [
        (r.vec_id, r.adist)
        for r in pq_adc_topk(embeddings, 0, k=10, codebooks=pq).collect()
    ]
    assert got == mem

    # replay idempotence: re-delivering a batch changes nothing
    sink(embeddings.where(F.col("vec_id") % 3 == 1), 1)
    assert _codes_set(read_codes(spark, store)) == _codes_set(batch)


def test_streaming_ann_compaction_and_pruning(spark, embeddings, tmpdir):
    from tagtree_spark.streaming.ann import (
        AnnIndexSink,
        compact_codes,
        read_codes,
    )

    coarse, pq = _codebooks(embeddings)
    store = f"{tmpdir}/ann-compact"
    sink = AnnIndexSink(store, coarse, pq, compact_every=None)
    for b in range(3):
        sink(embeddings.where(F.col("vec_id") % 3 == b), b)
    before = _codes_set(read_codes(spark, store))
    compact_codes(spark, store, before_batch=3)
    # one base segment remains, contents unchanged
    segs = glob.glob(f"{store}/seg-*")
    assert len(segs) == 1 and segs[0].endswith("-base")
    assert _codes_set(read_codes(spark, store)) == before
    # a cids filter prunes partition directories in the scan
    pruned = read_codes(spark, store, cids=[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan, plan
    assert {int(r.cid) for r in pruned.select("cid").distinct().collect()} <= {0}

    # an empty batch leaves no segment (CLAUDE.md rule 13)
    sink(embeddings.where(F.lit(False)), 9)
    assert not glob.glob(f"{store}/seg-0000000009-*")


def test_streaming_ann_reingest_is_latest_wins(spark, embeddings, tmpdir):
    """A vector re-delivered in a later batch — possibly re-embedded into
    a DIFFERENT cell — must contribute only its latest encoding: a plain
    segment union would hand ADC both code sets and double the per-vector
    sum (review r7), and deduping only the probed cells would resurrect a
    stale encoding after a cell move."""
    from tagtree_spark.streaming.ann import AnnIndexSink, read_codes

    coarse, pq = _codebooks(embeddings)
    store = f"{tmpdir}/ann-upsert"
    sink = AnnIndexSink(store, coarse, pq, compact_every=None)
    first = embeddings.where(F.col("vec_id") < 100)
    sink(first, 0)
    before = {r.vec_id: (r.code, int(r.cid)) for r in read_codes(spark, store).collect() if r.m == 0}
    # re-embed vector 50 as vector 60's embedding (moves code and maybe cell)
    v60 = embeddings.where(F.col("vec_id") == 60).select("embedding").first()[0]
    reemb = spark.createDataFrame(
        [(50, [float(x) for x in v60])], "vec_id bigint, embedding array<float>"
    )
    sink(reemb, 1)
    codes = read_codes(spark, store)
    after = {r.vec_id: (r.code, int(r.cid)) for r in codes.collect() if r.m == 0}
    # exactly one encoding per vector survives, and 50's is 60's encoding
    assert codes.groupBy("vec_id", "m").count().where("count > 1").count() == 0
    assert after[50] == before[60]
    assert {k: v for k, v in after.items() if k != 50} == {
        k: v for k, v in before.items() if k != 50
    }


def test_streaming_ann_requires_frozen_codebooks(spark, embeddings, tmpdir):
    from tagtree_spark.streaming.ann import AnnIndexSink

    with pytest.raises(ValueError, match="frozen"):
        AnnIndexSink(f"{tmpdir}/x", None, None)


def test_streaming_ann_intra_batch_duplicate_is_deduped(spark, embeddings, tmpdir):
    """One micro-batch carrying the same vec_id twice with DIFFERENT
    embeddings must encode exactly one of them (deterministically) — a
    plain pass-through would blend per-subspace codes across the two
    vectors via pq_codes' argmin, encoding neither (advice r7)."""
    from tagtree_spark.streaming.ann import AnnIndexSink, read_codes

    coarse, pq = _codebooks(embeddings)
    v60 = embeddings.where(F.col("vec_id") == 60).select("embedding").first()[0]
    v61 = embeddings.where(F.col("vec_id") == 61).select("embedding").first()[0]
    dup = spark.createDataFrame(
        [(50, [float(x) for x in v60]), (50, [float(x) for x in v61])],
        "vec_id bigint, embedding array<float>",
    )
    store_a = f"{tmpdir}/ann-dup-a"
    AnnIndexSink(store_a, coarse, pq, compact_every=None)(dup, 0)
    codes = read_codes(spark, store_a)
    # exactly one full encoding (8 subspaces, one code each)
    assert codes.groupBy("vec_id", "m").count().where("count > 1").count() == 0
    assert codes.count() == 8
    # deterministic: reversed delivery order yields the identical encoding
    store_b = f"{tmpdir}/ann-dup-b"
    rev = spark.createDataFrame(
        [(50, [float(x) for x in v61]), (50, [float(x) for x in v60])],
        "vec_id bigint, embedding array<float>",
    )
    AnnIndexSink(store_b, coarse, pq, compact_every=None)(rev, 0)
    assert _codes_set(codes) == _codes_set(read_codes(spark, store_b))
    # and the winner is one of the two inputs' true encodings, not a blend
    single_a = f"{tmpdir}/ann-single-60"
    single_b = f"{tmpdir}/ann-single-61"
    AnnIndexSink(single_a, coarse, pq, compact_every=None)(
        dup.where(F.col("embedding")[0] == float(v60[0])).limit(1), 0
    )
    AnnIndexSink(single_b, coarse, pq, compact_every=None)(
        spark.createDataFrame(
            [(50, [float(x) for x in v61])], "vec_id bigint, embedding array<float>"
        ),
        0,
    )
    assert _codes_set(codes) in (
        _codes_set(read_codes(spark, single_a)),
        _codes_set(read_codes(spark, single_b)),
    )


def test_read_codes_single_segment_skips_dedup_join(spark, embeddings, tmpdir):
    """Post-compaction (or single-batch) stores are the common case: the
    latest-wins groupBy+join is skipped so a probe is a pure pruned scan
    (advice r7)."""
    from tagtree_spark.streaming.ann import AnnIndexSink, read_codes

    coarse, pq = _codebooks(embeddings)
    store = f"{tmpdir}/ann-one-seg"
    AnnIndexSink(store, coarse, pq, compact_every=None)(
        embeddings.where(F.col("vec_id") < 100), 0
    )
    df = read_codes(spark, store, cids=[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "PartitionFilters" in plan and "cid" in plan, plan


def test_emb_key_is_null_position_safe(spark):
    """The intra-batch dedup tiebreak hash must distinguish embeddings
    that differ only by a null element's position — the concat_ws
    encoding dropped nulls and collided them, making the max_by winner
    replay-nondeterministic (ADVICE r8)."""
    from tagtree_spark.streaming.ann import _emb_key

    df = spark.createDataFrame(
        [(1, [1.0, None]), (2, [None, 1.0]), (3, [1.0]), (4, [1.0, 2.0])],
        "id long, v array<double>",
    )
    keys = [r.k for r in df.select(_emb_key("v").alias("k")).collect()]
    assert len(set(keys)) == 4
